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
