"""Plans: TPC-H-shape relational/serving queries (queries + mirrored DuckDB oracles)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import serving

from ._base import (  # noqa: F401
    _t)
from ._sql import (  # noqa: F401
    _DISC)

# --------------------------------------------------------------------------
# Spark-side query callables
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf):
    """Gates: single-scan partial/final hash aggregate with exact decimal
    sums (TPC-H Q1 shape; plan-pinned partial+final pair)."""
    (lineitem,) = _t(spark, sf, "lineitem")
    return serving.pricing_summary(lineitem)

def q_segment_revenue(spark, sf):
    """Gates: two-hop broadcast dim chain (customer, orders) into one fact-
    side shuffle keyed by segment."""
    customer, orders, lineitem = _t(spark, sf, "customer", "orders",
                                    "lineitem")
    return serving.segment_revenue(customer, orders, lineitem)

def q_region_revenue(spark, sf):
    """Gates: the Q5-style three-hop dim chain (region to nation to
    customer) broadcast into a single lineitem aggregation."""
    region, nation, customer, orders, lineitem = _t(
        spark, sf, "region", "nation", "customer", "orders", "lineitem")
    return serving.region_nation_revenue(region, nation, customer, orders,
                                         lineitem)

def q_top_brands(spark, sf):
    """Gates: broadcast dim join feeding TakeOrderedAndProject top-N (no
    global sort; plan-pinned)."""
    lineitem, part = _t(spark, sf, "lineitem", "part")
    return serving.top_brands(lineitem, part)

def q_gmv_daily(spark, sf):
    """Gates: date_trunc groupBy combining a decimal sum with countDistinct
    in one aggregate."""
    (orders,) = _t(spark, sf, "orders")
    return serving.gmv_daily(orders)

def q_props_stats(spark, sf):
    """Gates: map-column element access (P7) inside a SQL aggregation."""
    (events,) = _t(spark, sf, "events")
    return serving.props_stats(events)

def q_promo_revenue_share(spark, sf):
    """Gates: conditional aggregation share-of-total (Q14 shape) in one
    scan."""
    lineitem, part = _t(spark, sf, "lineitem", "part")
    return serving.promo_revenue_share(lineitem, part)

def q_disjunctive_revenue(spark, sf):
    """Gates: OR-of-conjunctions predicate (Q19) pushed into one scan."""
    lineitem, part = _t(spark, sf, "lineitem", "part")
    return serving.disjunctive_revenue(lineitem, part)

def q_top_supplier_per_nation(spark, sf):
    """Gates: per-group top-1 via window over a broadcast dim join."""
    supplier, nation = _t(spark, sf, "supplier", "nation")
    return serving.top_supplier_per_nation(supplier, nation)

def q_salted_brand_revenue(spark, sf):
    """Gates: the explicit salted skew join — identical semantics to a
    plain equi-join (the oracle is the plain join), so the skew
    machinery itself sits behind the correctness gate."""
    from ..operators.skew import salted_join

    lineitem, part = _t(spark, sf, "lineitem", "part")
    joined = salted_join(
        lineitem.select("l_partkey", "l_extendedprice", "l_discount"),
        part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
        "l_partkey")
    revenue = (F.col("l_extendedprice").cast("decimal(18,2)")
               * (F.lit(1).cast("decimal(18,2)")
                  - F.col("l_discount").cast("decimal(18,2)")))
    return (joined.groupBy("p_brand")
            .agg(F.sum(revenue).cast("decimal(18,2)").alias("revenue"),
                 F.count(F.lit(1)).alias("item_ct")))

def q_regional_part_gap(spark, sf):
    """Gates: SQL set difference (EXCEPT DISTINCT / subtract) over
    distinct-key sides — the set-operator plan family, complementing
    array_intersect (returnflag_part_overlap) and left-anti
    (customers_without_orders)."""
    lineitem, supplier, nation, region = _t(
        spark, sf, "lineitem", "supplier", "nation", "region")
    return serving.regional_part_gap(lineitem, supplier, nation, region)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "segment_revenue": q_segment_revenue,
    "region_revenue": q_region_revenue,
    "top_brands": q_top_brands,
    "gmv_daily": q_gmv_daily,
    "props_stats": q_props_stats,
    "promo_revenue_share": q_promo_revenue_share,
    "disjunctive_revenue": q_disjunctive_revenue,
    "top_supplier_per_nation": q_top_supplier_per_nation,
    "salted_brand_revenue": q_salted_brand_revenue,
    "regional_part_gap": q_regional_part_gap,
}

ORACLES: dict[str, str] = {
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS sum_disc_price,
               -- DECIMAL(28,4) intermediate (hugeint): the charge
               -- product's scale alignment overflows DECIMAL(18)'s
               -- 18-digit width once prices reach ~1e12 (fuzz 20011)
               CAST(round(sum(CAST({_DISC} AS DECIMAL(28,4)) *
                        (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS sum_charge,
               -- VARCHAR-routed decimal->double (registry._doubled_sql
               -- contract): the direct cast double-rounds >= 2^53
               CAST(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
               CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "segment_revenue": f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "region_revenue": f"""
        SELECT n_name,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "top_brands": f"""
        SELECT p_brand,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY revenue DESC, p_brand
        LIMIT 10
    """,
    "gmv_daily": """
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS order_day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gmv,
               count(*) AS order_ct,
               count(DISTINCT o_custkey) AS customer_ct
        FROM orders
        GROUP BY 1
    """,
    "props_stats": """
        SELECT event_type,
               count(*) AS ct,
               CAST(sum(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(min(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_min,
               CAST(max(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_max
        FROM events
        GROUP BY event_type
    """,
    "promo_revenue_share": f"""
        WITH m AS (
            SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
                   CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC}
                                       ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
                        AS DECIMAL(18,2)) AS promo_revenue,
                   CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        )
        SELECT ship_month, promo_revenue, total_revenue,
               -- VARCHAR-routed decimal->double (registry._doubled_sql
               -- contract): the direct cast double-rounds >= 2^53
               CAST(CAST(promo_revenue AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE)
                   AS promo_share
        FROM m
    """,
    "disjunctive_revenue": f"""
        SELECT CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size <= 10 AND l_quantity < 15)
           OR (p_brand = 'Brand#23' AND p_size <= 20 AND l_quantity < 30)
    """,
    "top_supplier_per_nation": """
        SELECT n_name, s_name, s_acctbal
        FROM supplier s JOIN nation ON s.s_nationkey = n_nationkey
        WHERE s_acctbal = (
            SELECT max(s2.s_acctbal) FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey)
    """,
    "salted_brand_revenue": f"""
        SELECT p_brand,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "regional_part_gap": """
        WITH dims AS (
            SELECT s_suppkey, r_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey),
        shipped AS (
            SELECT l_partkey, r_name
            FROM lineitem JOIN dims ON l_suppkey = s_suppkey)
        SELECT l_partkey AS part_key FROM shipped WHERE r_name = 'AMERICA'
        EXCEPT
        SELECT l_partkey AS part_key FROM shipped WHERE r_name = 'ASIA'
    """,
}

