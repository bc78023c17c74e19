"""Serving-layer batch queries (the gmall-publisher surface) plus the
TPC-H-style relational workload that exercises the engine's
scan/filter/join/aggregate/sort/limit path.

Reference parity:
 - GMV by date: ProductStatsMapper.java:13-14
   (`sum(order_amount) where toYYYYMMDD(stt)=#{date}`).
 - trademark top-N: ProductStatsMapper.java:21
   (`group by tm_name order by order_amount desc limit N`) — here the
   part-brand revenue top-N.

All monetary aggregates are exact decimals (see functions.money); all
ORDER BY ... LIMIT queries carry a unique tie-break key so top-N sets
are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import wmoney


def gmv_daily(orders: DataFrame) -> DataFrame:
    """Daily GMV over all orders (A7 serving aggregate)."""
    return (orders
            .groupBy(F.date_trunc("DAY", "o_orderdate").alias("order_day"))
            .agg(F.sum(wmoney("o_totalprice")).alias("gmv"),
                 F.count(F.lit(1)).alias("order_ct"),
                 F.countDistinct("o_custkey").alias("customer_ct")))


def top_brands(lineitem: DataFrame, part: DataFrame,
               limit: int = 10) -> DataFrame:
    """Brand revenue top-N — the trademark top-N analog (T1).

    part is dimension-sized → broadcast; lineitem never shuffles for
    the join, only for the 25-group aggregation.
    """
    revenue = (wmoney("l_extendedprice")
               * (F.lit(1).cast("decimal(18,2)") - wmoney("l_discount")))
    return (lineitem
            .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum(revenue).cast("decimal(18,2)").alias("revenue"),
                 F.count(F.lit(1)).alias("item_ct"))
            .orderBy(F.desc("revenue"), F.asc("p_brand"))
            .limit(limit))


def pricing_summary(lineitem: DataFrame,
                    cutoff: str = "2000-12-01") -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Exact decimal sums; averages derived from the decimal sums as
    doubles so the values are deterministic and engine-portable.
    """
    disc_price = wmoney("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                             - wmoney("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)")
                           + wmoney("l_tax"))
    agg = (lineitem
           .filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(wmoney("l_quantity")).cast("decimal(18,2)")
                 .alias("sum_qty"),
                F.sum(wmoney("l_extendedprice")).cast("decimal(18,2)")
                 .alias("sum_base_price"),
                F.sum(disc_price).cast("decimal(18,2)")
                 .alias("sum_disc_price"),
                F.sum(charge).cast("decimal(18,2)").alias("sum_charge"),
                F.count(F.lit(1)).alias("count_order"))
           .withColumn("avg_qty",
                       F.col("sum_qty").cast("double")
                       / F.col("count_order"))
           .withColumn("avg_price",
                       F.col("sum_base_price").cast("double")
                       / F.col("count_order")))
    return agg.select("l_returnflag", "l_linestatus", "sum_qty",
                      "sum_base_price", "sum_disc_price", "sum_charge",
                      "avg_qty", "avg_price", "count_order")


def segment_revenue(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, segment: str = "BUILDING",
                    limit: int = 10) -> DataFrame:
    """TPC-H Q3-style: top orders by revenue within a market segment."""
    revenue = wmoney("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                          - wmoney("l_discount"))
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(
                customer.filter(F.col("c_mktsegment") == segment)),
                orders.o_custkey == customer.c_custkey)
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(revenue).cast("decimal(18,2)").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(limit))


def region_nation_revenue(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame,
                          region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q5-style: revenue by nation within one region.

    Dimension chain region→nation→customer is broadcast; the only
    shuffle on the fact path is orders⋈lineitem plus the final
    aggregation (AQE coalesces the post-join partitions).
    """
    revenue = wmoney("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                          - wmoney("l_discount"))
    dims = (customer
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(
                region.filter(F.col("r_name") == region_name)),
                nation.n_regionkey == region.r_regionkey))
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(dims.select("c_custkey", "n_name")),
                  orders.o_custkey == F.col("c_custkey"))
            .groupBy("n_name")
            .agg(F.sum(revenue).cast("decimal(18,2)").alias("revenue"),
                 F.count(F.lit(1)).alias("item_ct"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14-style: monthly promo-type revenue share. Exact decimal
    revenue sums; the share ratio is a double derived from them."""
    disc = wmoney("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                       - wmoney("l_discount"))
    month = F.date_trunc("MONTH", "l_shipdate").alias("ship_month")
    promo = F.when(F.col("p_type") == "PROMO", disc) \
             .otherwise(F.lit(0).cast("decimal(18,2)"))
    agg = (lineitem
           .join(F.broadcast(part.select("p_partkey", "p_type")),
                 lineitem.l_partkey == F.col("p_partkey"))
           .groupBy(month)
           .agg(F.sum(promo).cast("decimal(18,2)").alias("promo_revenue"),
                F.sum(disc).cast("decimal(18,2)").alias("total_revenue")))
    # try_divide: a degenerate all-zero-revenue month yields NULL
    # share (DuckDB's x/0 double semantics) instead of an ANSI
    # DIVIDE_BY_ZERO job abort
    return agg.select(
        "ship_month", "promo_revenue", "total_revenue",
        F.try_divide(F.col("promo_revenue").cast("double"),
                     F.col("total_revenue").cast("double"))
        .alias("promo_share"))


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate: revenue from two
    alternative brand/size/quantity clauses — exercises complex
    predicate simplification and pushdown in one scan."""
    disc = wmoney("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                       - wmoney("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 10)
         & (F.col("l_quantity") < 15))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 20)
           & (F.col("l_quantity") < 30)))
    return (lineitem
            .join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                  lineitem.l_partkey == F.col("p_partkey"))
            .filter(cond)
            .agg(F.sum(disc).cast("decimal(18,2)").alias("revenue"),
                 F.count(F.lit(1)).alias("item_ct")))


def top_supplier_per_nation(supplier: DataFrame,
                            nation: DataFrame) -> DataFrame:
    """TPC-H Q2-flavored correlated lookup: the supplier(s) holding
    each nation's maximum account balance (all ties kept — equivalent
    to a correlated scalar subquery, planned as a window max)."""
    w = Window.partitionBy("s_nationkey")
    return (supplier
            .withColumn("max_bal", F.max("s_acctbal").over(w))
            .filter(F.col("s_acctbal") == F.col("max_bal"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == nation.n_nationkey)
            .select("n_name", "s_name", "s_acctbal"))


def props_stats(events: DataFrame) -> DataFrame:
    """JSON field extraction from the events props column (F8 analog:
    get_json_object over the schemaless payload), aggregated by
    event_type.

    Dirty-props contract (seeded fuzz, round 9): only an UNQUOTED
    integer ``k`` counts — a JSON-string value (``{"k": "s"}``)
    is NULL, extracted with the same digits-only regex + try_cast
    the oracle uses (a plain ANSI cast aborts the whole job on one
    malformed payload; get_json_object would also admit quoted
    numerals the oracle's regex rejects)."""
    k = (F.regexp_extract("props", r'"k":\s*(\d+)', 1)
         .try_cast("long"))
    return (events
            .select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("ct"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max")))


def regional_part_gap(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      have: str = "AMERICA",
                      lack: str = "ASIA") -> DataFrame:
    """Assortment-gap analysis via SQL set difference: part keys
    shipped by suppliers of region ``have`` EXCEPT those shipped by
    suppliers of region ``lack`` — the sourcing-coverage question
    ("what do we only get from one region?") expressed as EXCEPT
    DISTINCT (DataFrame ``subtract``), the set-operator plan family
    (distinct + anti-like set subtraction), not a join rewrite.

    Scale shape: the region→nation→supplier dim chain broadcasts into
    the lineitem scan once per side off one shared projection; the
    subtraction aggregates each side's distinct keys (map-side
    combined) before the set op — shuffled volume is distinct part
    keys, not lineitem rows."""
    dims = (supplier
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "r_name"))
    shipped = (lineitem.select("l_partkey", "l_suppkey")
               .join(F.broadcast(dims),
                     F.col("l_suppkey") == F.col("s_suppkey"))
               .select("l_partkey", "r_name"))
    a = shipped.filter(F.col("r_name") == have).select("l_partkey")
    b = shipped.filter(F.col("r_name") == lack).select("l_partkey")
    return a.subtract(b).withColumnRenamed("l_partkey", "part_key")
