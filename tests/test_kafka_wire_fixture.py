"""Kafka wire-fixture contract (VERDICT r8 #6).

No broker exists in this sandbox (the one standing `weak`), so this
module pins the exact SERIALIZED forms the engine would put on the
wire — consumer/producer option dicts per topology edge, and the
per-record (topic, value-UTF-8-bytes) envelopes of the DWD split and
CDC routing paths — against a committed golden fixture
(tests/fixtures/kafka_wire_contract.json). A future environment with
a broker replays the fixture unchanged: producers send
``value.encode('utf-8')`` to ``topic`` with the pinned producer
options, consumers subscribe with the pinned consumer options.

Reference parity: MyKafkaUtil.java:15-49 (consumer/producer/DDL),
BaseLogApp.java:110-117 (split side-outputs -> topics),
BaseDBApp.java:96-124 (dynamic table routing).

Regenerate deliberately after a contract change:
    python tests/test_kafka_wire_fixture.py --regen
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "kafka_wire_contract.json")

BROKERS = "broker-1:9092,broker-2:9092"


def _topology():
    from gmall_flink_2021_spark.sources import kafka as k

    edges = {}
    # S1 consumers: one per app, reference group ids
    for topic, group in [
            ("ods_base_log", "base_log_app"),
            ("ods_base_db", "base_db_app"),
            ("dwd_page_log", "unique_visit_app"),
            ("dwd_page_log", "user_jump_detail_app"),
            ("dwd_order_info", "order_wide_app"),
            ("dwd_order_detail", "order_wide_app"),
            ("dwm_order_wide", "payment_wide_app"),
            ("dwd_payment_info", "payment_wide_app")]:
        edges[f"consume:{topic}:{group}"] = k.consumer_options(
            BROKERS, topic, group)
    # replay mode for backfills
    edges["consume:ods_base_log:backfill"] = k.consumer_options(
        BROKERS, "ods_base_log", "base_log_app", "earliest")
    # K1/K2 producers
    edges["produce:default"] = k.producer_options(
        BROKERS, "/ck/producer")
    return edges


def _envelopes(spark):
    """(topic, value) rows for the split-log wire and the CDC routing
    wire, deterministic from the committed gmall fixtures."""
    from gmall_flink_2021_spark.operators import dwd
    from gmall_flink_2021_spark.schemas import (
        CDC_SCHEMA, TABLE_PROCESS_SCHEMA)
    from gmall_flink_2021_spark.sources import gmall_fixtures as fx
    from gmall_flink_2021_spark.sources import kafka as k

    lines = fx.page_log_lines()[:12]
    raw = spark.createDataFrame([(line,) for line in lines],
                                "value string")
    streams = dwd.split_log(dwd.parse_log(raw))
    split = k.wire_envelopes(streams).collect()

    cdc = spark.createDataFrame(
        [tuple(r[f.name] for f in CDC_SCHEMA.fields)
         for r in fx.cdc_rows()[:10]], CDC_SCHEMA)
    cfg = spark.createDataFrame(
        [tuple(r[f.name] for f in TABLE_PROCESS_SCHEMA.fields)
         for r in fx.table_process_rows()], TABLE_PROCESS_SCHEMA)
    routed = (dwd.route_cdc(dwd.filter_deletes(cdc), cfg)
              .filter(F.col("sink_type") == "kafka")
              .withColumn("value", F.col("data")))
    cdc_wire = k.route_topic(routed, topic_col="sink_table").collect()

    rows = ([{"path": "split_log", "topic": r.topic, "value": r.value}
             for r in split]
            + [{"path": "cdc_route", "topic": r.topic,
                "value": r.value} for r in cdc_wire])
    rows.sort(key=lambda r: (r["path"], r["topic"], r["value"]))
    for r in rows:
        r["value_sha256_utf8"] = hashlib.sha256(
            r["value"].encode("utf-8")).hexdigest()
    return rows


def _build(spark):
    return {"brokers": BROKERS, "topology": _topology(),
            "envelopes": _envelopes(spark)}


def test_wire_contract_matches_golden_fixture(spark):
    with open(FIXTURE) as fh:
        golden = json.load(fh)
    built = _build(spark)
    assert built["topology"] == golden["topology"]
    assert len(built["envelopes"]) == len(golden["envelopes"])
    for b, g in zip(built["envelopes"], golden["envelopes"]):
        assert b == g, (b, g)


def test_wire_envelopes_rejects_bad_inputs(spark):
    """Input validation (ADVICE r9): an unknown stream key or an
    empty dict must raise a ValueError naming the problem, not an
    opaque KeyError/TypeError from the routing internals."""
    import pytest

    from gmall_flink_2021_spark.sources.kafka import wire_envelopes

    with pytest.raises(ValueError, match="empty"):
        wire_envelopes({})
    df = spark.range(1).select(F.lit("x").alias("a"))
    with pytest.raises(ValueError, match="bogus.*dwd|unknown"):
        wire_envelopes({"start": df, "bogus": df})


def test_envelope_bytes_are_replayable():
    """The fixture alone must suffice to drive a real producer: every
    envelope's pinned sha256 matches its UTF-8 encoding, topics are
    non-empty ASCII, and values are valid JSON objects."""
    with open(FIXTURE) as fh:
        golden = json.load(fh)
    assert golden["envelopes"], "fixture must pin at least one record"
    for r in golden["envelopes"]:
        raw = r["value"].encode("utf-8")
        assert hashlib.sha256(raw).hexdigest() == r["value_sha256_utf8"]
        assert r["topic"].isascii() and r["topic"]
        assert isinstance(json.loads(r["value"]), dict)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if "--regen" not in sys.argv:
        sys.exit("pass --regen to rewrite the golden fixture")
    from gmall_flink_2021_spark.session import get_spark

    spark = get_spark("wire-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as fh:
        json.dump(_build(spark), fh, indent=1, sort_keys=True)
    print(f"wrote {FIXTURE}")
    spark.stop()
