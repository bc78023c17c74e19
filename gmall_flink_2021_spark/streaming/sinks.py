"""Streaming sinks, replacing the reference's Kafka/ClickHouse/Phoenix
writers with Spark-managed parquet tables.

 - K1/K3: idempotent foreachBatch append — the exactly-once analog of
   the reference's transactional Kafka producer + JDBC batch sink
   (utils/MyKafkaUtil.java:21-23, utils/ClickhouseUtil.java:17-52):
   each micro-batch writes to a batchId-named subdirectory, so batch
   replay after failure overwrites instead of duplicating (O9).
 - K2: dynamic routing — the reference picks the Kafka topic from the
   record's sinkTable field; here one partitioned write sends each
   sink_table group to its own directory in a single pass.
 - K4: dim upsert — Phoenix `upsert into` becomes a merge-by-pk
   (last-write-wins on the pk) into a parquet dim table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_idempotent(df: DataFrame, batch_id: int, path: str) -> None:
    """foreachBatch body: overwrite-by-batchId append (O9)."""
    df.write.mode("overwrite").parquet(
        os.path.join(path, f"batch_id={batch_id}"))


def write_routed(df: DataFrame, batch_id: int, path: str,
                 route_col: str = "sink_table") -> None:
    """K2 analog: route each record to its sink_table directory with a
    single partitioned write (no per-topic loop, no second shuffle)."""
    (df.write.mode("overwrite")
       .partitionBy(route_col)
       .parquet(os.path.join(path, f"batch_id={batch_id}")))


def upsert_dim(batch: DataFrame, dim_path: str, pk: str = "id",
               order_col: str | None = None) -> None:
    """K4 analog: merge a micro-batch into the dim table keyed on the
    sink_pk (default 'id', TableProcessFunction.java:71-73). Within a
    batch the row with the highest ``order_col`` per key wins (falls
    back to dropDuplicates when no ordering column exists); against
    the existing table new rows replace old rows with the same pk."""
    import shutil

    spark = batch.sparkSession
    if order_col is not None:
        w = Window.partitionBy(pk).orderBy(F.desc(order_col))
        latest = (batch.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
    else:
        latest = batch.dropDuplicates([pk])
    try:
        existing = spark.read.parquet(dim_path)
    except Exception:
        existing = None
    if existing is not None:
        # allowMissingColumns: a mid-stream config change can evolve
        # the dim's column set (the runtime-DDL path) — new columns
        # arrive as nulls on old rows, removed ones stay null on new
        # rows, mirroring Phoenix's additive ALTER behavior
        merged = existing.join(latest.select(pk), pk, "left_anti") \
                         .unionByName(latest, allowMissingColumns=True)
    else:
        merged = latest
    # two-phase swap: materialize to a staging dir, then republish —
    # we cannot overwrite dim_path while lazily reading from it
    tmp = dim_path + "._staging"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(dim_path)
    shutil.rmtree(tmp, ignore_errors=True)
