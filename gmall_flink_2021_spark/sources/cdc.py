"""Change-data-capture source modeling (S2/S3).

The reference embeds a Debezium MySQL binlog reader
(flink-CDC/.../FlinkCDC.java:34-44) and reshapes SourceRecords into
``{database, table, type, data, before-data}`` JSON
(MyDeserializerFunc.java:16-66, mapping create→insert). PySpark has
no native CDC connector; the engine models the change stream as a
DataFrame in exactly that envelope shape, arriving from any
transport (kafka topic, change-log files, or a Delta Change Data
Feed in production). The startup modes map as:
 - initial()  → replay the snapshot files/earliest offsets, then tail
 - latest()   → startingOffsets=latest / only new files
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CDC_SCHEMA


def read_changelog_stream(spark: SparkSession, path: str) -> DataFrame:
    """S2/S3: a directory of JSON-lines change records → the CDC
    envelope stream. Accepts Debezium-ish payloads: ``op``/``type``
    codes are normalized (c/create/r/read → insert, u → update,
    d → delete) exactly as MyDeserializerFunc.java:52-62 does."""
    raw = spark.readStream.format("text").load(path)
    return normalize_changelog(
        raw.select(F.from_json("value", CDC_SCHEMA).alias("r"))
           .select("r.*"))


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Batch form (the snapshot half of startup mode initial())."""
    raw = spark.read.format("text").load(path)
    return normalize_changelog(
        raw.select(F.from_json("value", CDC_SCHEMA).alias("r"))
           .select("r.*"))


def normalize_changelog(cdc: DataFrame) -> DataFrame:
    """create/read → insert (MyDeserializerFunc.java:58-61)."""
    t = F.lower(F.col("type"))
    return cdc.withColumn(
        "type",
        F.when(t.isin("c", "create", "r", "read", "insert"), "insert")
         .when(t.isin("u", "update"), "update")
         .when(t.isin("d", "delete"), "delete")
         .otherwise(t))


def write_changelog_fixture(rows: list[dict], path: str) -> None:
    """Test helper: spill CDC envelope dicts as JSON lines."""
    import json

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "changelog-0.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
