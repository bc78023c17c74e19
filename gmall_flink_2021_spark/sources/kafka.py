"""Kafka source/sink wiring (S1/S6/K1/K2).

No broker exists in the test environment, so these builders return
the configured reader/writer without starting it; the file-backed
sources in streaming/jobs.py present the identical
``value: string`` surface to every operator, which is what makes the
operator layer transport-agnostic. Reference parity:
 - consumer: MyKafkaUtil.getKafkaConsumer (MyKafkaUtil.java:29-37)
 - producer: getKafkaProducer / getKafkaProducerWithSchema with
   exactly-once + dynamic topic from the record (MyKafkaUtil.java:15-27)
 - SQL DDL connector: getKafkaDDL (MyKafkaUtil.java:39-49)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_STARTING_OFFSETS = "latest"   # scan.startup.mode latest-offset


def kafka_source(spark: SparkSession, brokers: str, topic: str,
                 group_id: str, starting_offsets: str | None = None):
    """S1: subscribe and surface value as string (SimpleStringSchema)."""
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("kafka.group.id", group_id)
            .option("startingOffsets",
                    starting_offsets or DEFAULT_STARTING_OFFSETS)
            .option("failOnDataLoss", "false"))


def decode_value(df: DataFrame) -> DataFrame:
    """Kafka frame → DataFrame[value: string]."""
    return df.select(F.col("value").cast("string").alias("value"))


def kafka_sink(df: DataFrame, brokers: str, topic: str | None,
               checkpoint: str, topic_col: str | None = None):
    """K1 (fixed topic) / K2 (dynamic topic from a record column —
    the Spark kafka sink honors a ``topic`` column, which replaces the
    reference's KafkaSerializationSchema routing). Exactly-once comes
    from the checkpoint + the sink's idempotent producer semantics."""
    out = df
    if topic_col is not None:
        out = df.select(F.col(topic_col).alias("topic"),
                        F.col("value").cast("string").alias("value"))
    else:
        out = df.select(F.col("value").cast("string").alias("value"))
    writer = (out.writeStream.format("kafka")
              .option("kafka.bootstrap.servers", brokers)
              .option("checkpointLocation", checkpoint))
    if topic_col is None:
        writer = writer.option("topic", topic)
    return writer
