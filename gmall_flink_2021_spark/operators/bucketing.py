"""Bucketed co-located joins: the shuffle-free path for recurring
fact-fact joins (SCALE.md).

The driver testdata is read-only single files, so bucketed copies are
materialized as managed tables once and reused; in a curated 100 TB
warehouse the ingest job writes bucketed/sorted layouts directly and
every orders⋈lineitem-style join skips both shuffle and sort
(SortMergeJoin over pre-sorted buckets, or bucket-local hash joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8) -> None:
    """Materialize a bucketed+sorted managed table keyed for joins."""
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str) -> DataFrame:
    """Join two co-bucketed tables; with matching bucket counts Spark
    plans no Exchange on either side."""
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key])


def zorder_stats(orders: DataFrame, bits: int = 8,
                 n_buckets: int = 32,
                 probe_cust: tuple[int, int] = (100, 200),
                 probe_days: tuple[int, int] = (400, 500)) -> DataFrame:
    """Z-order (Morton curve) layout audit — the data-skipping layout
    a 100 TB warehouse applies when queries filter on TWO dimensions
    at once (Delta/Iceberg OPTIMIZE ZORDER): map (o_custkey,
    o_orderdate) to a ``bits``-bit grid, interleave the bits into a
    Morton code, range-bucket the code, and report each bucket's row
    count and per-dimension min/max envelope plus whether a fixed 2-D
    probe rectangle touches it. Buckets with ``probe_hit = 0`` are
    exactly the files a min/max-pruning scan skips; a linear layout
    clusters only ONE dimension, so its envelopes stay wide on the
    other and far more buckets survive pruning (pinned by the
    layout-comparison property test).

    Exactness: both dimensions are scaled to [0, 2^bits) with integer
    rank arithmetic over a broadcast 1-row min/max frame
    ((v - min)·(2^bits − 1)) DIV max(range, 1); the Morton code is
    pure shift/mask integer algebra; buckets divide the code space in
    fixed-width strides — no sampling, no floats, bit-identical on
    any engine.

    Scale shape: one scan computes the 1-row extrema, a second scan
    projects the code and hash-aggregates per bucket (map-side
    combined, ``n_buckets`` rows out). The real write path would
    repartitionByRange(morton).sortWithinPartitions(morton) with the
    same code; the audit keeps the layout decision measurable without
    materializing files.
    """
    from pyspark.sql import functions as F

    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    ext = orders.agg(
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        F.min(day).alias("d_min"), F.max(day).alias("d_max"))
    top = (1 << bits) - 1
    scaled = (orders
              .select(F.col("o_custkey").alias("ck"), day.alias("d"))
              .crossJoin(F.broadcast(ext))
              .select("ck", "d",
                      F.expr(f"((ck - ck_min) * {top})"
                             " DIV greatest(ck_max - ck_min, 1)")
                      .alias("x"),
                      F.expr(f"((d - d_min) * {top})"
                             " DIV greatest(d_max - d_min, 1)")
                      .alias("y")))
    morton = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b + 1}) + (((y >> {b}) & 1) << {2 * b})"
        for b in range(bits))
    stride = ((1 << (2 * bits)) + n_buckets - 1) // n_buckets
    lo_c, hi_c = probe_cust
    lo_d, hi_d = probe_days
    return (scaled
            .withColumn("z", F.expr(morton))
            .withColumn("bucket", F.expr(f"z DIV {stride}").cast("long"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("ck").alias("min_ck"), F.max("ck").alias("max_ck"),
                 F.min("d").alias("min_day"), F.max("d").alias("max_day"))
            .select("bucket", "n_rows", "min_ck", "max_ck",
                    "min_day", "max_day",
                    ((F.col("min_ck") <= hi_c) & (F.col("max_ck") >= lo_c)
                     & (F.col("min_day") <= hi_d)
                     & (F.col("max_day") >= lo_d)).cast("long")
                    .alias("probe_hit")))
