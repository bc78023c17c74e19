"""Bucketed co-located joins must plan without a shuffle (Exchange)
on either side — the SCALE.md claim, asserted on the physical plan."""

from pyspark.sql import functions as F

from gmall_flink_2021_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from gmall_flink_2021_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        lineitem = load_table(spark, SF_SMOKE, "lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey")
        write_bucketed(lineitem, "b_lineitem", "l_orderkey")

        joined = bucketed_join(spark, "b_orders", "b_lineitem",
                               "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is right
        expect = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

def test_aqe_skew_join_splits_the_hot_partition(spark):
    """The runtime half of the skew story (salted_join is the manual
    half): with AQE skew handling on, a 90%-one-key join must execute
    as SortMergeJoin(skew=true) with the hot partition split — the
    mechanism that absorbs skewed keys at 100 TB without rewriting the
    query. Thresholds are lowered to make local data 'big'; all confs
    are restored afterwards."""
    from pyspark.sql import functions as F

    keys = ["spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold"]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(keys[0], "true")
        spark.conf.set(keys[1], "64KB")
        spark.conf.set(keys[2], "16KB")
        spark.conf.set(keys[3], "2")
        spark.conf.set(keys[4], "-1")
        big = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
             .otherwise(F.col("id") % 50).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("p"))
        small = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        j = big.join(small, "k")
        # collect() (not count()) so THIS DataFrame's own query
        # execution runs and its adaptive plan finalizes
        assert len(j.collect()) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_optimize_layout_produces_disjoint_range_files(spark, tmp_path):
    """Range-partitioned sorted layout: per-file min/max key spans
    must be (near-)disjoint — the precondition for physical row-group
    skipping under a range predicate — where the naive unsorted write
    of the same data leaves every file spanning the whole key range."""
    import os

    import pyarrow.parquet as pq

    from gmall_flink_2021_spark.sources.tables import load_table
    from gmall_flink_2021_spark.streaming.sinks import optimize_layout

    events = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "user_id", "ts", "value")

    opt = str(tmp_path / "events_ranged")
    stats = optimize_layout(events, opt, ["ts"], n_partitions=8)
    assert stats["files"] >= 4
    assert stats["disjoint_pct"] >= 90, stats

    # contrast: the naive layout (hash-ish round-robin from a plain
    # repartition) has massively overlapping spans
    naive = str(tmp_path / "events_naive")
    events.repartition(8).write.parquet(naive)
    spans = []
    for fn in os.listdir(naive):
        if fn.endswith(".parquet") and not fn.startswith("."):
            md = pq.read_metadata(os.path.join(naive, fn))
            s = md.row_group(0).column(2).statistics
            lo, hi = s.min, s.max
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "ts" and col.statistics:
                        lo = min(lo, col.statistics.min)
                        hi = max(hi, col.statistics.max)
            spans.append((lo, hi))
    spans.sort()
    naive_disjoint = sum(1 for i in range(1, len(spans))
                         if spans[i][0] >= spans[i - 1][1])
    assert naive_disjoint < len(spans) - 1  # overlapping, as expected

    # content integrity: the re-laid-out table is the same multiset
    assert spark.read.parquet(opt).count() == events.count()


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Z-order vs single-key range sort on (user_id, event_id): the
    range layout gives tight spans on its sort key but each file
    spans ~the whole range of the other column; the z-ordered layout
    must bound BOTH dimensions — its second-dimension per-file span
    must be a small fraction of the single-key layout's."""
    from gmall_flink_2021_spark.sources.tables import load_table
    from gmall_flink_2021_spark.streaming import sinks

    events = load_table(spark, SF_SMOKE, "events") \
        .select("user_id", "event_id")

    zpath = str(tmp_path / "z")
    zstats = sinks.zorder_layout(events, zpath, "user_id", "event_id",
                                 n_partitions=16)
    rpath = str(tmp_path / "r")
    sinks.optimize_layout(events, rpath, ["user_id"], n_partitions=16)
    rspans = sinks._file_spans(rpath, "event_id")
    lo = min(s[0] for s in rspans)
    hi = max(s[1] for s in rspans)
    r_avg_permille = 1000 * (sum(int(s[1]) - int(s[0]) for s in rspans)
                             // len(rspans)) // max(int(hi) - int(lo), 1)
    # single-key layout leaves the second dim essentially unpruned
    assert r_avg_permille >= 800, r_avg_permille
    # z-order bounds both dims to a fraction of their global range
    assert zstats["avg_span_permille_b"] <= r_avg_permille // 2, zstats
    assert zstats["avg_span_permille_a"] <= 500, zstats
