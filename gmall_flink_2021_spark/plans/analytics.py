"""Plans: OVER-window / sessionization / graph analytics family (queries + mirrored DuckDB oracles)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import analytics, bucketing

from ._base import (  # noqa: F401
    _t)
from ._sql import (  # noqa: F401
    _DISC)

def q_top_orders_per_segment(spark, sf):
    """Gates: per-group top-N via row_number OVER partitioned window."""
    customer, orders = _t(spark, sf, "customer", "orders")
    return analytics.top_orders_per_segment(customer, orders)

def q_gmv_daily_delta(spark, sf):
    """Gates: lag + running-sum window chain over an aggregate
    (delta/cumulative in one pass)."""
    (orders,) = _t(spark, sf, "orders")
    return analytics.gmv_daily_delta(orders)

def q_sessionize(spark, sf):
    """Gates: gap-based sessionization: lag + conditional cumulative sum."""
    (events,) = _t(spark, sf, "events")
    return analytics.sessionize(events)

def q_priority_rollup(spark, sf):
    """Gates: ROLLUP grouping sets with grouping-null semantics."""
    (orders,) = _t(spark, sf, "orders")
    return analytics.priority_rollup(orders)

def q_revenue_forecast(spark, sf):
    """Gates: predicate pushdown + column pruning reaching the parquet scan
    (plan-pinned)."""
    (lineitem,) = _t(spark, sf, "lineitem")
    return analytics.revenue_forecast(lineitem)

def q_customers_without_orders(spark, sf):
    """Gates: left-anti join (NOT EXISTS shape)."""
    customer, orders = _t(spark, sf, "customer", "orders")
    return analytics.customers_without_orders(customer, orders)

def q_late_shipment_priority(spark, sf):
    """Gates: EXISTS semi-join with date-interval arithmetic in the
    predicate."""
    orders, lineitem = _t(spark, sf, "orders", "lineitem")
    return analytics.late_shipment_priority(orders, lineitem)

def q_funnel_conversion(spark, sf):
    """Gates: ordered 3-stage funnel: dependent min-ts joins with strict
    event-time ordering."""
    (events,) = _t(spark, sf, "events")
    return analytics.funnel_conversion(events)

def q_native_session_windows(spark, sf):
    """Gates: the native session_window() operator (gap-merged windows in
    the engine)."""
    (events,) = _t(spark, sf, "events")
    return analytics.native_session_windows(events)

def q_price_tier_stats(spark, sf):
    """Gates: literal interval table joined by BroadcastNestedLoopJoin
    range predicate (plan-pinned)."""
    (orders,) = _t(spark, sf, "orders")
    return analytics.price_tier_stats(orders)

def q_region_segment_cube(spark, sf):
    """Gates: CUBE grouping sets over a dim chain."""
    region, nation, customer, orders = _t(spark, sf, "region", "nation",
                                          "customer", "orders")
    return analytics.region_segment_cube(region, nation, customer, orders)

def q_purchase_attribution(spark, sf):
    """Gates: as-of attribution join via union + carry-forward last-value
    window (no range join)."""
    (events,) = _t(spark, sf, "events")
    return analytics.purchase_attribution(events)

def q_hourly_activity_pivot(spark, sf):
    """Gates: pivot() to 24 hour columns (wide aggregate)."""
    (events,) = _t(spark, sf, "events")
    return analytics.hourly_activity_pivot(events)

def q_retention_cohorts(spark, sf):
    """Gates: cohort self-join producing a day-offset retention matrix."""
    (events,) = _t(spark, sf, "events")
    return analytics.retention_cohorts(events)

def q_order_count_distribution(spark, sf):
    """Gates: two-level aggregation: per-key counts re-aggregated into a
    histogram."""
    customer, orders = _t(spark, sf, "customer", "orders")
    return analytics.order_count_distribution(customer, orders)

def q_large_volume_customers(spark, sf):
    """Gates: HAVING-filtered aggregate subquery joined back to facts (Q18
    shape)."""
    customer, orders, lineitem = _t(spark, sf, "customer", "orders",
                                    "lineitem")
    return analytics.large_volume_customers(customer, orders, lineitem)

def q_bilateral_trade(spark, sf):
    """Gates: the same dim table broadcast twice under different aliases
    (customer and supplier nations)."""
    nation, customer, supplier, orders, lineitem = _t(
        spark, sf, "nation", "customer", "supplier", "orders", "lineitem")
    return analytics.bilateral_trade(nation, customer, supplier, orders,
                                     lineitem)

def q_top_revenue_supplier(spark, sf):
    """Gates: scalar-max aggregate subquery with an exact-decimal equality
    join back (Q15 shape)."""
    supplier, lineitem = _t(spark, sf, "supplier", "lineitem")
    return analytics.top_revenue_supplier(supplier, lineitem)

def q_small_qty_part_revenue(spark, sf):
    """Gates: per-key scalar-average subquery join (Q17 shape)."""
    part, lineitem = _t(spark, sf, "part", "lineitem")
    return analytics.small_qty_part_revenue(part, lineitem)

def q_high_balance_inactive_customers(spark, sf):
    """Gates: anti-join plus global-average scalar filter (Q22 shape)."""
    nation, customer, orders = _t(spark, sf, "nation", "customer",
                                  "orders")
    return analytics.high_balance_inactive_customers(nation, customer,
                                                     orders)

def q_nation_year_revenue(spark, sf):
    """Gates: multi-dim chain with year extraction; plan-pinned double-
    broadcast, no sort-merge."""
    nation, supplier, orders, lineitem = _t(
        spark, sf, "nation", "supplier", "orders", "lineitem")
    return analytics.nation_year_revenue(nation, supplier, orders,
                                         lineitem)

def q_returnflag_priority_stats(spark, sf):
    """Gates: fact-fact join aggregated along two independent dimensions."""
    orders, lineitem = _t(spark, sf, "orders", "lineitem")
    return analytics.returnflag_priority_stats(orders, lineitem)

def q_part_supplier_variety(spark, sf):
    """Gates: multi-column countDistinct across a three-way join."""
    part, supplier, lineitem = _t(spark, sf, "part", "supplier", "lineitem")
    return analytics.part_supplier_variety(part, supplier, lineitem)

def q_sole_late_suppliers(spark, sf):
    """Gates: EXISTS + NOT EXISTS pair (Q21 shape: semi and anti join on
    the same fact)."""
    supplier, orders, lineitem = _t(spark, sf, "supplier", "orders",
                                    "lineitem")
    return analytics.sole_late_suppliers(supplier, orders, lineitem)

def q_grouping_sets_revenue(spark, sf):
    """Gates: explicit GROUPING SETS with grouping_id disambiguation."""
    (lineitem,) = _t(spark, sf, "lineitem")
    return analytics.grouping_sets_revenue(lineitem)

def q_returnflag_part_overlap(spark, sf):
    """Gates: collect_set + array_intersect set overlap across groups."""
    (lineitem,) = _t(spark, sf, "lineitem")
    return analytics.returnflag_part_overlap(lineitem)

def q_returned_item_customers(spark, sf):
    """Gates: Q10 shape: filtered fact agg with dim chain and revenue
    top-20."""
    nation, customer, orders, lineitem = _t(spark, sf, "nation", "customer",
                                            "orders", "lineitem")
    return analytics.returned_item_customers(nation, customer, orders,
                                             lineitem)

def q_nation_market_share(spark, sf):
    """Gates: share-of-total via conditional sum over a 6-table join (Q8
    shape)."""
    region, nation, customer, supplier, orders, lineitem = _t(
        spark, sf, "region", "nation", "customer", "supplier", "orders",
        "lineitem")
    return analytics.nation_market_share(region, nation, customer, supplier,
                                         orders, lineitem)

def q_event_metrics_unpivot(spark, sf):
    """Gates: stack() unpivot of a wide aggregate into (metric, value)
    rows."""
    (events,) = _t(spark, sf, "events")
    return analytics.event_metrics_unpivot(events)

def q_customer_value_quartiles(spark, sf):
    """Gates: NTILE(4) quartile assignment over an aggregate."""
    customer, orders = _t(spark, sf, "customer", "orders")
    return analytics.customer_value_quartiles(customer, orders)

def q_snapshot_diff(spark, sf):
    """Gates: CDC snapshot reconciliation — full-outer sort-merge join of
    (pk, md5 row digest) scan projections; classifies insert/delete/
    update with a single digest compare per pk regardless of table
    width. Synthetic versions carved deterministically from orders
    (v1 drops key%7==0, v2 drops key%11==0 and rewrites status on
    key%5==0)."""
    (orders,) = _t(spark, sf, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = (orders.filter(F.col("o_orderkey") % 11 != 0)
           .withColumn("o_orderstatus",
                       F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
                       .otherwise(F.col("o_orderstatus"))))
    return analytics.snapshot_diff(old, new, "o_orderkey", cols)

def q_daily_value_zscores(spark, sf):
    """Gates: BOUNDED trailing window frame (rowsBetween(-7,-1) — vs the
    unbounded-preceding running family) computing drift z-scores from
    exact integer-cents frame sums; the warehouse load-monitoring
    query."""
    (events,) = _t(spark, sf, "events")
    return analytics.daily_value_zscores(events)

def q_winsorized_price_stats(spark, sf):
    """Gates: winsorized robust statistics — exact DISCRETE quantile
    thresholds via integer rank arithmetic inside one per-group
    window-sort pass, broadcast back onto a clamped int64
    aggregation (greatest/least); the outlier-clipping stage of a
    metrics pipeline, bit-exact end to end."""
    (orders,) = _t(spark, sf, "orders")
    return analytics.winsorized_price_stats(orders)

def q_rfm_segments(spark, sf):
    """Gates: three-axis exact-quartile segmentation — orders reduced
    once to a per-customer aggregate; the rank windows sort that
    aggregate, never raw orders; integer rank-quartile formula, no
    percentile interpolation."""
    (orders,) = _t(spark, sf, "orders")
    return analytics.rfm_segments(orders)

def q_linear_attribution(spark, sf):
    """Gates: multi-touch attribution — REVERSE-order union + carry-
    forward merge (one user-keyed shuffle, single-row state; no
    view×purchase pair join), equal-split integer permille credit
    per purchase."""
    (events,) = _t(spark, sf, "events")
    return analytics.linear_attribution(events)

def q_session_path_ngrams(spark, sf):
    """Gates: order-preserving path mining — session ids from one
    user-keyed window shuffle, per-session array shingles (fan-out
    bounded by session length, no self-join), map-side path counts,
    top-k heap."""
    (events,) = _t(spark, sf, "events")
    return analytics.session_path_ngrams(events)

def q_scd2_dim_join(spark, sf):
    """Gates: effective-dated SCD2 enrichment — union + carry-forward
    window (ONE order-keyed shuffle, linear whatever the per-key
    version count; the inequality-join form the oracle uses grows
    with versions·facts), pre-first-version facts kept as their own
    category, floor-cents decimal revenue."""
    orders, lineitem = _t(spark, sf, "orders", "lineitem")
    return analytics.scd2_dim_join(orders, lineitem)

def q_trade_pagerank(spark, sf):
    """Gates: iterative graph analytics on a schema-bounded edge list
    — one fact scan builds the <=|nations|^2 weighted graph
    (broadcast dim chain), collected once (dup_clusters/BPE bounded-
    collect precedent) for the exact integer driver-side rank
    recurrence; unrolled-CTE oracle."""
    tabs = _t(spark, sf, "nation", "customer", "supplier", "orders",
              "lineitem")
    out, _h = analytics.trade_pagerank(*tabs)
    return out

def q_part_cooccurrence(spark, sf):
    """Gates: basket co-occurrence without a fact self-join — per-
    order part arrays with a |basket|²-bounded pair fan-out, map-side
    pair counts, lift joined only AFTER the top-k heap with the k-row
    side broadcast."""
    (lineitem,) = _t(spark, sf, "lineitem")
    out, h = analytics.part_cooccurrence(lineitem)
    h.unpersist()  # lazy: recompute-on-reuse
    return out

def q_gap_fill_daily(spark, sf):
    """Gates: dense calendar spine + LOCF regularization — corpus
    collapsed to a (type, day) aggregate before any window; spine is
    |types|·|days| rows off a broadcast 1-row extent; integer counts
    and gap flags end to end."""
    (events,) = _t(spark, sf, "events")
    return analytics.gap_fill_daily(events)

def q_zorder_stats(spark, sf):
    """Gates: Morton-curve layout audit — integer grid scaling over a
    broadcast 1-row extrema frame, pure shift/mask interleave, fixed
    -stride code buckets, per-bucket min/max envelopes + 2-D probe
    pruning flags; the measurable form of OPTIMIZE ZORDER."""
    (orders,) = _t(spark, sf, "orders")
    return bucketing.zorder_stats(orders)

def q_rolling_active_users(spark, sf):
    """Gates: exact sliding-window distinct (7-day rolling actives) —
    contribution expansion instead of per-day user-set state: two
    linear·N map-side-combined shuffles, trailing open windows
    trimmed, integer DAU/WAU stickiness."""
    (events,) = _t(spark, sf, "events")
    return analytics.rolling_active_users(events)

def q_key_skew_audit(spark, sf):
    """Gates: pre-shuffle key-skew diagnostics — one map-side-combined
    per-key count reduces the corpus to a |keys|-row aggregate; exact
    discrete quantiles rank that aggregate (never the corpus); heavy
    keys come off a TakeOrderedAndProject heap with the 1-row global
    stats broadcast back on."""
    (lineitem,) = _t(spark, sf, "lineitem")
    out, h = analytics.key_skew_audit(lineitem, "l_suppkey")
    h.unpersist()  # lazy: recompute-on-reuse
    return out

def q_event_transitions(spark, sf):
    """Gates: first-order Markov transition matrix — single user-keyed
    lag window (one-row state per user), map-side-combined |types|²
    aggregation, integer permille shares via DIV over the aggregate's
    own window."""
    (events,) = _t(spark, sf, "events")
    return analytics.event_transitions(events)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "top_orders_per_segment": q_top_orders_per_segment,
    "gmv_daily_delta": q_gmv_daily_delta,
    "sessionize": q_sessionize,
    "priority_rollup": q_priority_rollup,
    "revenue_forecast": q_revenue_forecast,
    "customers_without_orders": q_customers_without_orders,
    "late_shipment_priority": q_late_shipment_priority,
    "funnel_conversion": q_funnel_conversion,
    "order_count_distribution": q_order_count_distribution,
    "large_volume_customers": q_large_volume_customers,
    "bilateral_trade": q_bilateral_trade,
    "top_revenue_supplier": q_top_revenue_supplier,
    "small_qty_part_revenue": q_small_qty_part_revenue,
    "high_balance_inactive_customers": q_high_balance_inactive_customers,
    "nation_year_revenue": q_nation_year_revenue,
    "purchase_attribution": q_purchase_attribution,
    "price_tier_stats": q_price_tier_stats,
    "region_segment_cube": q_region_segment_cube,
    "hourly_activity_pivot": q_hourly_activity_pivot,
    "retention_cohorts": q_retention_cohorts,
    "native_session_windows": q_native_session_windows,
    "returnflag_priority_stats": q_returnflag_priority_stats,
    "part_supplier_variety": q_part_supplier_variety,
    "sole_late_suppliers": q_sole_late_suppliers,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "returnflag_part_overlap": q_returnflag_part_overlap,
    "returned_item_customers": q_returned_item_customers,
    "nation_market_share": q_nation_market_share,
    "event_metrics_unpivot": q_event_metrics_unpivot,
    "customer_value_quartiles": q_customer_value_quartiles,
    "snapshot_diff": q_snapshot_diff,
    "daily_value_zscores": q_daily_value_zscores,
    "winsorized_price_stats": q_winsorized_price_stats,
    "event_transitions": q_event_transitions,
    "key_skew_audit": q_key_skew_audit,
    "rolling_active_users": q_rolling_active_users,
    "zorder_stats": q_zorder_stats,
    "gap_fill_daily": q_gap_fill_daily,
    "part_cooccurrence": q_part_cooccurrence,
    "trade_pagerank": q_trade_pagerank,
    "scd2_dim_join": q_scd2_dim_join,
    "session_path_ngrams": q_session_path_ngrams,
    "linear_attribution": q_linear_attribution,
    "rfm_segments": q_rfm_segments,
}

ORACLES: dict[str, str] = {
    "daily_value_zscores": """
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS day,
                   CAST(round(sum(CAST(round(
                        CASE WHEN isnan(value) OR isinf(value)
                             THEN NULL ELSE value END, 2)
                        AS DECIMAL(18,2))), 2) * 100 AS BIGINT) AS cents
            FROM events
            -- order-dependent (trailing frame): undated events are
            -- out of domain, mirroring functions.timeutil.dated;
            -- non-finite metric values are NULL, mirroring money()
            WHERE ts IS NOT NULL GROUP BY 1, 2),
        fr AS (
            SELECT event_type, day, cents,
                   count(cents) OVER w AS n,
                   CAST(sum(cents) OVER w AS DOUBLE) AS s,
                   CAST(sum(CAST(cents AS HUGEINT) * cents) OVER w
                        AS DOUBLE) AS ss
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT event_type, day, cents, CAST(n AS BIGINT) AS n_prior,
               CASE WHEN n >= 3 AND (ss - s * s / n) / (n - 1) > 0
                    -- floor-quantized, not round(): see
                    -- score_daily_cents (bit-identical IEEE ops).
                    -- |z| >= 9e12 passes through unquantized: Spark's
                    -- floor(double) returns LONG (clamps at 2^63)
                    -- while DuckDB's stays DOUBLE, so both engines
                    -- skip the quantization there (a 1e-6 quantum is
                    -- below double ULP at that magnitude anyway)
                    THEN CASE WHEN abs((cents - s / n)
                               / sqrt((ss - s * s / n) / (n - 1)))
                              < 9e12
                         THEN floor((cents - s / n)
                               / sqrt((ss - s * s / n) / (n - 1))
                               * 1000000.0 + 0.5) / 1000000.0
                         ELSE (cents - s / n)
                               / sqrt((ss - s * s / n) / (n - 1))
                         END
                    END AS z
        FROM fr
    """,
    "top_orders_per_segment": """
        SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank,
               o_orderkey, o_totalprice
        FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rank <= 3
    """,
    "gmv_daily_delta": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS order_day,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gmv
            -- order-dependent (running total): undated orders out of
            -- domain, mirroring the engine's dated() rule
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        )
        SELECT order_day, gmv,
               CAST(gmv - lag(gmv) OVER (ORDER BY order_day) AS DECIMAL(18,2)) AS gmv_delta,
               CAST(sum(gmv) OVER (ORDER BY order_day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(18,2)) AS gmv_running
        FROM daily
    """,
    "sessionize": """
        WITH o AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST) AS prev_ts
            -- order-dependent: undated events out of domain (dated())
            FROM events WHERE ts IS NOT NULL
        ),
        f AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                           OR ts > prev_ts + INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS ns
            FROM o
        ),
        s AS (
            SELECT *, CAST(sum(ns) OVER (
                PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
            FROM f
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(date_diff('microsecond', min(ts), max(ts)) // 1000000 AS BIGINT) AS duration_sec
        FROM s GROUP BY 1, 2
    """,
    "priority_rollup": """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS order_ct,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS gmv
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        -- Spark emits NO rows for a rollup over empty input; standard
        -- SQL emits the () row — count(*)>0 only drops that one
        HAVING count(*) > 0
    """,
    "revenue_forecast": """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_discount AS DECIMAL(18,2))), 2)
                    AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 10
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "late_shipment_priority": """
        SELECT o_orderpriority, count(*) AS order_ct
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL '90 days')
        GROUP BY o_orderpriority
    """,
    "funnel_conversion": """
        WITH v AS (
            SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS v_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS c_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.v_ts
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.c_ts
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS viewers,
               (SELECT count(*) FROM c) AS clickers,
               (SELECT count(*) FROM p) AS purchasers,
               CAST((SELECT count(*) FROM c) AS DOUBLE)
                   / nullif(CAST((SELECT count(*) FROM v) AS DOUBLE), 0)
                   AS view_to_click,
               CAST((SELECT count(*) FROM p) AS DOUBLE)
                   / nullif(CAST((SELECT count(*) FROM c) AS DOUBLE), 0)
                   AS click_to_purchase
    """,
    "order_count_distribution": """
        SELECT order_ct, count(*) AS cust_ct FROM (
            SELECT c_custkey, count(o_orderkey) AS order_ct
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey)
        GROUP BY order_ct
    """,
    "large_volume_customers": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
               total_qty
        FROM orders
        JOIN (SELECT l_orderkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                          AS DECIMAL(18,2)) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING total_qty > 300) big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "bilateral_trade": f"""
        SELECT cust_nation, supp_nation,
               CAST(year(o_orderdate) AS INTEGER) AS trade_year,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT c_custkey, n_name AS cust_nation
              FROM customer JOIN nation ON c_nationkey = n_nationkey) cn
             ON o_custkey = cn.c_custkey
        JOIN (SELECT s_suppkey, n_name AS supp_nation
              FROM supplier JOIN nation ON s_nationkey = n_nationkey) sn
             ON l_suppkey = sn.s_suppkey
        WHERE cust_nation <> supp_nation
        GROUP BY cust_nation, supp_nation, trade_year
    """,
    "top_revenue_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2))
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "small_qty_part_revenue": """
        WITH per_part AS (
            SELECT l_partkey AS pk,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS part_total_qty,
                   count(*) AS part_item_ct
            FROM lineitem GROUP BY l_partkey)
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                    AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
        JOIN per_part ON l_partkey = pk
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * part_item_ct
              < part_total_qty
    """,
    "high_balance_inactive_customers": """
        WITH stats AS (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS pos_total,
                   count(*) AS pos_ct
            FROM customer WHERE c_acctbal > 0)
        SELECT n_name, count(*) AS cust_ct,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                    AS DECIMAL(18,2)) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey, stats
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos_ct > pos_total
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
    """,
    "nation_year_revenue": f"""
        SELECT supp_nation,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue,
               count(*) AS item_ct
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT s_suppkey, n_name AS supp_nation
              FROM supplier JOIN nation ON s_nationkey = n_nationkey) sn
             ON l_suppkey = sn.s_suppkey
        GROUP BY supp_nation, order_year
    """,
    "price_tier_stats": """
        SELECT tier, count(*) AS order_ct,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DECIMAL(18,2)) AS gmv
        FROM orders
        JOIN (VALUES ('budget', 0.0, 100000.0),
                     ('mid', 100000.0, 250000.0),
                     ('premium', 250000.0, 1e12)) tiers(tier, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY tier
    """,
    "region_segment_cube": """
        SELECT r_name, c_mktsegment,
               CAST(GROUPING(r_name, c_mktsegment) AS BIGINT) AS gid,
               count(*) AS order_ct,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DECIMAL(18,2)) AS gmv
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, c_mktsegment)
        HAVING count(*) > 0  -- Spark: empty input => no () row
    """,
    "purchase_attribution": """
        SELECT event_id, user_id, ts, last_view_ts,
               CAST(date_diff('microsecond', last_view_ts, ts) // 1000000
                    AS BIGINT) AS gap_sec
        FROM (
            SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
                   (SELECT max(CAST(v.ts AS TIMESTAMP)) FROM events v
                    WHERE v.event_type = 'view' AND v.user_id = e.user_id
                      AND v.ts <= e.ts) AS last_view_ts
            FROM events e WHERE e.event_type = 'purchase')
    """,
    "hourly_activity_pivot": """
        SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour_of_day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS view
        FROM events
        GROUP BY 1
    """,
    "retention_cohorts": """
        WITH first AS (
            SELECT user_id,
                   CAST(min(date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS TIMESTAMP) AS cohort_day
            FROM events GROUP BY user_id),
        active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS active_day
            FROM events)
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, active_day) AS BIGINT)
                   AS day_offset,
               count(DISTINCT active.user_id) AS user_ct
        FROM active JOIN first ON active.user_id = first.user_id
        GROUP BY 1, 2
    """,
    "native_session_windows": """
        WITH seq AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   /* Spark merges an event landing at exactly
                      prev+gap (verified empirically, locked by
                      test_native_session_window_exact_gap_merges) —
                      a new session needs a STRICTLY larger gap */
                   CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                          OR CAST(ts AS TIMESTAMP)
                             > lag(CAST(ts AS TIMESTAMP)) OVER w
                               + INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            -- session_window drops undated events; dated() mirrors
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST)),
        sess AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM seq)
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
    """,
    "returnflag_priority_stats": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_ct,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_ct
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    "part_supplier_variety": """
        SELECT p_brand, p_size,
               count(DISTINCT l_suppkey) AS supplier_ct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 1000)
        GROUP BY p_brand, p_size
    """,
    "sole_late_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '60 days'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate
                                > o_orderdate + INTERVAL '60 days')
        GROUP BY s_name
    """,
    "grouping_sets_revenue": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS line_ct,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        HAVING count(*) > 0  -- Spark: empty input => no () row
    """,
    "returnflag_part_overlap": """
        WITH r AS (SELECT l_partkey FROM lineitem
                   WHERE l_returnflag = 'R'
                     AND l_shipdate >= TIMESTAMP '2000-01-01'),
             n AS (SELECT l_partkey FROM lineitem
                   WHERE l_returnflag = 'N'
                     AND l_shipdate < TIMESTAMP '1996-01-01')
        SELECT 'both' AS bucket, count(*) AS part_ct
        FROM (SELECT * FROM r INTERSECT SELECT * FROM n)
        UNION ALL
        SELECT 'returned_only', count(*)
        FROM (SELECT * FROM r EXCEPT SELECT * FROM n)
        UNION ALL
        SELECT 'accepted_only', count(*)
        FROM (SELECT * FROM n EXCEPT SELECT * FROM r)
    """,
    "returned_item_customers": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2)) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "nation_market_share": f"""
        SELECT order_year, nation_revenue, total_revenue,
               -- VARCHAR-routed decimal->double (registry._doubled_sql
               -- contract): the direct cast double-rounds >= 2^53
               round(CAST(CAST(nation_revenue AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE),
                     6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                   CAST(round(sum(CASE WHEN sn.n_name = 'NATION_3'
                                       THEN {_DISC}
                                       ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
                        AS DECIMAL(18,2)) AS nation_revenue,
                   CAST(round(sum({_DISC}), 2) AS DECIMAL(18,2))
                        AS total_revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region ON cn.n_regionkey = r_regionkey
                WHERE r_name = 'ASIA')
            GROUP BY year(o_orderdate))
    """,
    "event_metrics_unpivot": """
        WITH wide AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS day,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS click,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS view,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchase
            FROM events GROUP BY 1
        )
        SELECT day, 'click' AS metric, CAST(click AS BIGINT) AS ct
        FROM wide
        UNION ALL
        SELECT day, 'view', CAST(view AS BIGINT) FROM wide
        UNION ALL
        SELECT day, 'purchase', CAST(purchase AS BIGINT) FROM wide
    """,
    "customer_value_quartiles": """
        WITH spend AS (
            SELECT o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS spend
            FROM orders GROUP BY o_custkey
        ),
        tiled AS (
            SELECT c_custkey, spend,
                   CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey)
                        AS BIGINT) AS quartile
            FROM customer JOIN spend ON c_custkey = o_custkey
        )
        SELECT quartile, count(*) AS cust_ct,
               min(spend) AS min_spend, max(spend) AS max_spend,
               CAST(sum(spend) AS DECIMAL(18,2)) AS total_spend
        FROM tiled GROUP BY quartile
    """,
    # digest-free classification: the oracle compares columns directly
    # (IS DISTINCT FROM), which must classify identically to the
    # engine's intra-engine md5 digest compare
    "snapshot_diff": """
        WITH o AS (
            SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        n AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 11 <> 0),
        d AS (
            SELECT coalesce(o.o_orderkey, n.o_orderkey) AS pk,
                   CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                        WHEN n.o_orderkey IS NULL THEN 'deleted'
                        WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
                          OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                          OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                          OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
                          OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
                        THEN 'updated'
                        ELSE 'unchanged' END AS change_type
            FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
        SELECT pk, change_type FROM d WHERE change_type <> 'unchanged'
    """,
}


ORACLES["winsorized_price_stats"] = """
    WITH base AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        -- NULL price = absent measurement: it must not occupy a
        -- quantile rank (mirrors the engine's population gate)
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    ranked AS (
        SELECT priority, c,
               row_number() OVER (PARTITION BY priority ORDER BY c)
                   AS rn,
               count(*) OVER (PARTITION BY priority) AS n
        FROM base
    ),
    th AS (
        SELECT priority,
               max(CASE WHEN rn = (5 * n + 99) // 100 THEN c END)
                   AS lo_cents,
               max(CASE WHEN rn = (95 * n + 99) // 100 THEN c END)
                   AS hi_cents
        FROM ranked GROUP BY priority
    )
    SELECT b.priority, count(*) AS n,
           min(t.lo_cents) AS lo_cents, min(t.hi_cents) AS hi_cents,
           CAST(sum(CASE WHEN b.c < t.lo_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS clipped_lo_ct,
           CAST(sum(CASE WHEN b.c > t.hi_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS clipped_hi_ct,
           CAST(sum(greatest(t.lo_cents, least(t.hi_cents, b.c)))
                AS BIGINT) AS winsorized_sum_cents
    FROM base b JOIN th t USING (priority)
    GROUP BY b.priority
"""


# generate_series over DATE yields timestamps in DuckDB — cast back;
# Spark's sequence(date, date) yields dates natively
# day is TIMESTAMP on both sides (the repo's date_trunc convention:
# pandas stringifies Spark DATE and DuckDB DATE differently, so date
# outputs stay timestamps)
ORACLES["rolling_active_users"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        FROM events
    ),
    expanded AS (
        SELECT DISTINCT user_id,
               unnest(generate_series(day, day + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS day
        FROM ud
    ),
    rolling AS (
        SELECT day, count(*) AS rolling_users
        FROM expanded GROUP BY day
    ),
    daily AS (
        SELECT day, count(*) AS day_users FROM ud GROUP BY day
    )
    SELECT r.day,
           CAST(coalesce(d.day_users, 0) AS BIGINT) AS day_users,
           CAST(r.rolling_users AS BIGINT) AS rolling_users,
           CAST((1000 * coalesce(d.day_users, 0)) // r.rolling_users
                AS BIGINT) AS stickiness_permille
    FROM rolling r LEFT JOIN daily d ON r.day = d.day
    WHERE r.day <= (SELECT max(day) FROM ud)
"""

ORACLES["zorder_stats"] = """
    WITH ext AS (
        SELECT min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
               min(date_diff('day', TIMESTAMP '1995-01-01',
                             o_orderdate)) AS d_min,
               max(date_diff('day', TIMESTAMP '1995-01-01',
                             o_orderdate)) AS d_max
        FROM orders
    ),
    scaled AS (
        SELECT o_custkey AS ck,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                   AS d,
               ((o_custkey - ck_min) * 255)
                   // greatest(ck_max - ck_min, 1) AS x,
               ((date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                 - d_min) * 255)
                   // greatest(d_max - d_min, 1) AS y
        FROM orders, ext
    ),
    coded AS (
        SELECT ck, d, ((((x >> 0) & 1) << 1) + (((y >> 0) & 1) << 0) + (((x >> 1) & 1) << 3) + (((y >> 1) & 1) << 2) + (((x >> 2) & 1) << 5) + (((y >> 2) & 1) << 4) + (((x >> 3) & 1) << 7) + (((y >> 3) & 1) << 6) + (((x >> 4) & 1) << 9) + (((y >> 4) & 1) << 8) + (((x >> 5) & 1) << 11) + (((y >> 5) & 1) << 10) + (((x >> 6) & 1) << 13) + (((y >> 6) & 1) << 12) + (((x >> 7) & 1) << 15) + (((y >> 7) & 1) << 14)) AS z FROM scaled
    ),
    bucketed AS (
        SELECT CAST(z // 2048 AS BIGINT) AS bucket, ck, d
        FROM coded
    )
    SELECT bucket, count(*) AS n_rows,
           min(ck) AS min_ck, max(ck) AS max_ck,
           CAST(min(d) AS BIGINT) AS min_day,
           CAST(max(d) AS BIGINT) AS max_day,
           CAST(CASE WHEN min(ck) <= 200 AND max(ck) >= 100
                      AND min(d) <= 500 AND max(d) >= 400
                     THEN 1 ELSE 0 END AS BIGINT) AS probe_hit
    FROM bucketed
    GROUP BY bucket
"""

ORACLES["gap_fill_daily"] = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS n_obs
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    ext AS (
        SELECT min(date_trunc('day', ts)) AS d_min,
               max(date_trunc('day', ts)) AS d_max
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.day
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(d_min, d_max,
                                            INTERVAL 1 DAY)) AS day
              FROM ext) g
    )
    SELECT s.event_type, s.day,
           CAST(coalesce(d.n_obs, 0) AS BIGINT) AS n_events,
           CAST(CASE WHEN d.n_obs IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_gap,
           CAST(coalesce(last_value(d.n_obs IGNORE NULLS) OVER (
                    PARTITION BY s.event_type ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                0) AS BIGINT) AS locf_events
    FROM spine s
    LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
"""

ORACLES["part_cooccurrence"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    p AS (
        SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
               count(*) AS pair_ct
        FROM b x JOIN b y
          ON x.l_orderkey = y.l_orderkey
         AND x.l_partkey < y.l_partkey
        GROUP BY x.l_partkey, y.l_partkey
    ),
    top AS (
        SELECT * FROM p
        ORDER BY pair_ct DESC, part_a, part_b
        LIMIT 20
    ),
    pc AS (
        SELECT l_partkey, count(*) AS pct FROM b GROUP BY l_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b)
    SELECT t.part_a, t.part_b, CAST(t.pair_ct AS BIGINT) AS pair_ct,
           CAST((1000 * t.pair_ct * n.nb) // (pa.pct * pb.pct)
                AS BIGINT) AS lift_permille
    FROM top t
    JOIN pc pa ON pa.l_partkey = t.part_a
    JOIN pc pb ON pb.l_partkey = t.part_b
    CROSS JOIN n
"""

ORACLES["trade_pagerank"] = f"""
    WITH edges AS MATERIALIZED (
        SELECT sn.src, cn.dst,
               CAST(floor(sum({_DISC}) * 100) AS BIGINT) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT c_custkey, n_name AS dst
              FROM customer JOIN nation ON c_nationkey = n_nationkey)
             cn ON o_custkey = cn.c_custkey
        JOIN (SELECT s_suppkey, n_name AS src
              FROM supplier JOIN nation ON s_nationkey = n_nationkey)
             sn ON l_suppkey = sn.s_suppkey
        WHERE sn.src <> cn.dst
        GROUP BY sn.src, cn.dst
    ),
    e2 AS MATERIALIZED (
        SELECT e.src, e.dst, e.w, o.wout
        FROM edges e
        JOIN (SELECT src, sum(w) AS wout FROM edges GROUP BY src) o
          ON e.src = o.src
    ),
    r0 AS MATERIALIZED (SELECT n_name AS node, CAST(1000000 AS BIGINT) AS rank_micro FROM nation),
    c0 AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST((CAST(r.rank_micro AS HUGEINT) * e.w) // e.wout
                    AS BIGINT) AS c
        FROM e2 e JOIN r0 r ON e.src = r.node
    ),
    r1 AS MATERIALIZED (
        SELECT n.n_name AS node,
               CAST(150000 + (850 * coalesce(s.s, 0)) // 1000
                    AS BIGINT) AS rank_micro
        FROM nation n
        LEFT JOIN (SELECT node, sum(c) AS s FROM c0 GROUP BY node) s
          ON n.n_name = s.node
    ),
    c1 AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST((CAST(r.rank_micro AS HUGEINT) * e.w) // e.wout
                    AS BIGINT) AS c
        FROM e2 e JOIN r1 r ON e.src = r.node
    ),
    r2 AS MATERIALIZED (
        SELECT n.n_name AS node,
               CAST(150000 + (850 * coalesce(s.s, 0)) // 1000
                    AS BIGINT) AS rank_micro
        FROM nation n
        LEFT JOIN (SELECT node, sum(c) AS s FROM c1 GROUP BY node) s
          ON n.n_name = s.node
    ),
    c2 AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST((CAST(r.rank_micro AS HUGEINT) * e.w) // e.wout
                    AS BIGINT) AS c
        FROM e2 e JOIN r2 r ON e.src = r.node
    ),
    r3 AS MATERIALIZED (
        SELECT n.n_name AS node,
               CAST(150000 + (850 * coalesce(s.s, 0)) // 1000
                    AS BIGINT) AS rank_micro
        FROM nation n
        LEFT JOIN (SELECT node, sum(c) AS s FROM c2 GROUP BY node) s
          ON n.n_name = s.node
    ),
    degs AS (
        SELECT coalesce(i.node, o.node) AS node,
               coalesce(i.in_edges, 0) AS in_edges,
               coalesce(o.out_edges, 0) AS out_edges
        FROM (SELECT dst AS node, count(*) AS in_edges
              FROM edges GROUP BY dst) i
        FULL JOIN (SELECT src AS node, count(*) AS out_edges
                   FROM edges GROUP BY src) o
          ON i.node = o.node
    )
    SELECT r.node, r.rank_micro,
           CAST(coalesce(d.in_edges, 0) AS BIGINT) AS in_edges,
           CAST(coalesce(d.out_edges, 0) AS BIGINT) AS out_edges
    FROM r3 r LEFT JOIN degs d ON r.node = d.node
"""

ORACLES["scd2_dim_join"] = f"""
    WITH v AS (
        -- SCD2 date domain: undated/keyless versions and facts are
        -- out of domain on both sides (see operators.scd2_enrich)
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_orderdate AS eff_from
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
        UNION ALL
        SELECT o_orderkey, 'X', o_orderdate + INTERVAL 365 DAY
        FROM orders WHERE o_orderkey % 5 = 0
          AND o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
    ),
    pairs AS (
        SELECT DISTINCT l_orderkey AS k, l_shipdate AS t
        FROM lineitem
        WHERE l_shipdate IS NOT NULL AND l_orderkey IS NOT NULL
    ),
    cand AS (
        SELECT p.k, p.t, v.status, v.eff_from
        FROM pairs p
        LEFT JOIN v ON v.k = p.k AND v.eff_from <= p.t
    ),
    eff AS (
        SELECT k, t, status FROM (
            SELECT k, t, status,
                   row_number() OVER (PARTITION BY k, t
                                      ORDER BY eff_from DESC) AS rn
            FROM cand) WHERE rn = 1
    )
    SELECT coalesce(e.status, 'pre-order') AS eff_status,
           count(*) AS n_items,
           count(DISTINCT l.l_orderkey) AS order_ct,
           CAST(floor(sum({_DISC}) * 100) AS BIGINT) AS revenue_cents
    FROM (SELECT * FROM lineitem
          WHERE l_shipdate IS NOT NULL
            AND l_orderkey IS NOT NULL) l
    JOIN eff e ON e.k = l.l_orderkey AND e.t = l.l_shipdate
    GROUP BY coalesce(e.status, 'pre-order')
"""

ORACLES["session_path_ngrams"] = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        -- order-dependent: undated events out of domain (dated())
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST)
    ),
    s2 AS (
        SELECT *,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id NULLS FIRST
                                 ROWS UNBOUNDED PRECEDING) AS sess
        FROM seq
    ),
    arr AS (
        -- coalesce mirrors the engine: NULL event_type is a literal
        -- path token, not a NULL-propagating (or NULL-skipping) hole
        -- event_type is the final tiebreak: the engine sorts
        -- struct(ts, event_id, event_type) arrays, so two events
        -- tied on (ts, NULL id) with different types still order
        -- deterministically (identical triples commute)
        SELECT list(coalesce(event_type, '(null)')
                    ORDER BY ts, event_id NULLS FIRST,
                             event_type NULLS FIRST) AS t
        FROM s2 GROUP BY user_id, sess
    ),
    tri AS (
        SELECT unnest(list_transform(range(1, len(t) - 1),
                   i -> t[i] || '>' || t[i+1] || '>' || t[i+2]))
                   AS path
        FROM arr WHERE len(t) >= 3
    ),
    counted AS (
        SELECT path, count(*) AS path_ct FROM tri GROUP BY path
        ORDER BY path_ct DESC, path
        LIMIT 20
    )
    SELECT path, CAST(path_ct AS BIGINT) AS path_ct,
           CAST(row_number() OVER (ORDER BY path_ct DESC, path)
                AS BIGINT) AS path_rank
    FROM counted
"""

ORACLES["linear_attribution"] = """
    WITH b AS (
        SELECT user_id, ts, event_id, 0 AS side,
               event_id AS pid
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, ts, event_id, 1 AS side,
               CAST(NULL AS BIGINT) AS pid
        FROM events WHERE event_type = 'view'
    ),
    m AS (
        SELECT *,
               last_value(pid IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, side ASC, event_id DESC NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS next_pid
        FROM (SELECT * FROM b UNION ALL SELECT * FROM v)
    ),
    touches AS (
        SELECT next_pid AS pid, count(*) AS n_touch
        FROM m WHERE side = 1 AND next_pid IS NOT NULL
        GROUP BY next_pid
    )
    SELECT b.event_id AS purchase_event_id, b.user_id, b.ts,
           CAST(coalesce(t.n_touch, 0) AS BIGINT) AS n_touch,
           CAST(CASE WHEN coalesce(t.n_touch, 0) > 0
                     THEN 1000 // t.n_touch ELSE 0 END
                AS BIGINT) AS touch_share_permille
    FROM b LEFT JOIN touches t ON t.pid = b.pid
"""

ORACLES["rfm_segments"] = """
    WITH per_cust AS (
        SELECT o_custkey AS ck, max(o_orderdate) AS last_order,
               count(*) AS freq,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          * 100) AS BIGINT) AS spend_cents
        FROM orders GROUP BY o_custkey
    ),
    base AS (
        SELECT ck, freq, spend_cents,
               CAST(date_diff('day', last_order,
                              (SELECT max(last_order) FROM per_cust))
                    AS BIGINT) AS recency_days
        FROM per_cust
    ),
    scored AS (
        SELECT ck, spend_cents,
               (4 * (row_number() OVER (ORDER BY recency_days, ck)
                     - 1)) // count(*) OVER () + 1 AS r_q,
               (4 * (row_number() OVER (ORDER BY freq DESC, ck)
                     - 1)) // count(*) OVER () + 1 AS f_q,
               (4 * (row_number() OVER (ORDER BY spend_cents DESC, ck)
                     - 1)) // count(*) OVER () + 1 AS m_q
        FROM base
    )
    SELECT 'R' || r_q || 'F' || f_q || 'M' || m_q AS segment,
           count(*) AS n_customers,
           CAST(sum(spend_cents) AS BIGINT) AS segment_spend_cents
    FROM scored
    GROUP BY 1
"""

ORACLES["key_skew_audit"] = """
    WITH counts AS (
        SELECT CAST(l_suppkey AS BIGINT) AS hot_key,
               count(*) AS key_ct
        FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
        SELECT hot_key, key_ct,
               row_number() OVER (ORDER BY key_ct, hot_key) AS rn,
               count(*) OVER () AS n
        FROM counts
    ),
    stats AS (
        SELECT CAST(sum(key_ct) AS BIGINT) AS total_rows,
               count(*) AS distinct_keys,
               max(CASE WHEN rn = (50 * n + 99) // 100
                        THEN key_ct END) AS p50_ct,
               max(CASE WHEN rn = (90 * n + 99) // 100
                        THEN key_ct END) AS p90_ct,
               max(CASE WHEN rn = (99 * n + 99) // 100
                        THEN key_ct END) AS p99_ct,
               max(key_ct) AS max_ct
        FROM ranked
    ),
    top AS (
        SELECT hot_key, key_ct,
               row_number() OVER (ORDER BY key_ct DESC, hot_key)
                   AS heavy_rank
        FROM counts
        ORDER BY key_ct DESC, hot_key
        LIMIT 5
    )
    SELECT CAST(heavy_rank AS BIGINT) AS heavy_rank, hot_key,
           CAST(key_ct AS BIGINT) AS key_ct,
           CAST((1000 * key_ct) // total_rows AS BIGINT)
               AS share_permille,
           total_rows, CAST(distinct_keys AS BIGINT) AS distinct_keys,
           CAST(p50_ct AS BIGINT) AS p50_ct,
           CAST(p90_ct AS BIGINT) AS p90_ct,
           CAST(p99_ct AS BIGINT) AS p99_ct,
           CAST(max_ct AS BIGINT) AS max_ct
    FROM top, stats
"""

ORACLES["event_transitions"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id NULLS FIRST,
                                              event_type NULLS FIRST)
                   AS prev_type
        -- order-dependent: undated events out of domain (dated())
        FROM events WHERE ts IS NOT NULL
    ),
    pairs AS (
        SELECT prev_type, event_type AS next_type,
               count(*) AS transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type,
           CAST(transitions AS BIGINT) AS transitions,
           CAST((1000 * transitions)
                // sum(transitions) OVER (PARTITION BY prev_type)
                AS BIGINT) AS row_permille
    FROM pairs
"""
