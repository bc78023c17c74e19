"""Structured Streaming job wiring.

Every transformation in operators/ is source-agnostic (a pure
DataFrame→DataFrame function); these helpers bind them to streaming
sources. The architectural invariant (SURVEY.md §7.1): the same
operator runs in batch mode for the DuckDB oracle and in streaming
mode behind a watermark — Structured Streaming's incrementalized-
batch model makes the results identical once all data is processed,
which is exactly what the streaming==batch tests assert.

Kafka-shape note: in production each reader below becomes
``spark.readStream.format("kafka")...select(col("value").cast("string"))``
(MyKafkaUtil.java:29-37); file sources present the identical
`value: string` / typed-row surface for tests, so the operator code
does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def read_log_stream(spark: SparkSession, path: str) -> DataFrame:
    """ods_base_log as a streaming DataFrame[value: string] (S1)."""
    return (spark.readStream.format("text").load(path)
            .withColumnRenamed("value", "value"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver events table replayed as a file stream with event
    time. Schema comes from the batch loader (incl. the nanos fix).

    The file streaming source only accepts directories, so the single
    parquet file is staged (hard-linked/copied once) into a per-sf
    spool directory under /tmp.
    """
    import hashlib
    import os
    import shutil

    from pyspark.sql.types import LongType, StructField, StructType

    src_stat = os.stat(os.path.join(sf_dir, "events.parquet"))
    # key the spool by file identity, not just path: the source parquet
    # can be regenerated in place between runs, and a stale staged copy
    # would silently diverge from the batch loader
    ident = f"{sf_dir}:{src_stat.st_mtime_ns}:{src_stat.st_size}"
    spool = os.path.join(
        "/tmp", "gmall_stream_spool",
        hashlib.md5(ident.encode()).hexdigest()[:12])
    os.makedirs(spool, exist_ok=True)
    dst = os.path.join(spool, "events.parquet")
    if not os.path.exists(dst):
        src = os.path.join(sf_dir, "events.parquet")
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy(src, dst)
    # the physical ts encoding varies between generator versions:
    # TIMESTAMP(NANOS) surfaces as bigint (needs the shared nanos→NTZ
    # conversion), TIMESTAMP(MICROS) reads natively — probe the footer
    # metadata so the session-global nanosAsLong flag is only touched
    # when the file actually needs it (and then it must stay set: the
    # streaming scan consults it at execution time)
    from ..sources.tables import events_ts_is_nanos

    src_path = os.path.join(sf_dir, "events.parquet")
    if not events_ts_is_nanos(src_path):
        return (spark.readStream
                .schema(spark.read.parquet(src_path).schema)
                .format("parquet").load(spool))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = load_table(spark, sf_dir, "events")
    raw_schema = StructType([
        StructField("ts", LongType(), f.nullable) if f.name == "ts" else f
        for f in batch.schema.fields])
    raw = (spark.readStream.schema(raw_schema)
           .format("parquet")
           .load(spool))
    from ..sources.tables import convert_events_ts

    return convert_events_ts(raw)


def visitor_stats_stream(events: DataFrame,
                         window_duration: str = "10 minutes",
                         watermark: str = "1 second") -> DataFrame:
    """Streaming form of operators/dws.visitor_stats_window (A2+O2):
    the identical aggregation behind a bounded-out-of-orderness
    watermark; append mode emits each window once it closes."""
    from ..operators.dws import visitor_stats_window

    # watermarks require TIMESTAMP (not NTZ); with the session pinned
    # to UTC (session.harden) the wall clock is unchanged
    with_et = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return visitor_stats_window(
        with_et.withWatermark("ts", watermark), window_duration,
        streaming=True)


def run_to_completion(stream_df: DataFrame, checkpoint: str) -> DataFrame:
    """Drain a file-backed stream with availableNow into a memory sink
    and return it as a DataFrame. Used by the streaming==batch tests."""
    import uuid

    name = "sink_" + uuid.uuid4().hex[:12]
    query = (stream_df.writeStream
             .format("memory")
             .queryName(name)
             .outputMode("append")
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return stream_df.sparkSession.table(name)
