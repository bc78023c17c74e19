"""DWD layer: dirty routing (P1), 3-way split (P4), CDC delete filter
(P2), config routing + projection (P3/J4) on the gmall-shaped
fixtures."""

import json

from pyspark.sql import functions as F

from gmall_flink_2021_spark.operators import dwd
from gmall_flink_2021_spark.schemas import CDC_SCHEMA, TABLE_PROCESS_SCHEMA
from gmall_flink_2021_spark.sources import gmall_fixtures as fx


def _raw_log(spark):
    lines = fx.page_log_lines()
    return spark.createDataFrame([(l,) for l in lines], "value string"), lines


def test_dirty_routing(spark):
    raw, lines = _raw_log(spark)
    parsed = dwd.parse_log(raw)
    n_dirty = dwd.dirty_records(parsed).count()
    expected_dirty = sum(1 for l in lines if not l.startswith("{"))
    assert n_dirty == expected_dirty > 0
    clean = parsed.filter(F.col("parsed._corrupt_record").isNull()).count()
    assert clean + n_dirty == len(lines)


def test_three_way_split(spark):
    raw, lines = _raw_log(spark)
    streams = dwd.split_log(dwd.parse_log(raw))
    parsed = [json.loads(l) for l in lines if l.startswith("{")]
    n_start = sum(1 for e in parsed if "start" in e)
    n_page = len(parsed) - n_start
    n_display = sum(len(e.get("displays", [])) for e in parsed)
    assert streams["start"].count() == n_start > 0
    assert streams["page"].count() == n_page > 0
    assert streams["display"].count() == n_display > 0
    # exer-corrected split: display rows carry parent page_id and ts
    row = streams["display"].first()
    assert row.page_id is not None and row.ts is not None


def test_cdc_routing_and_projection(spark):
    cdc = spark.createDataFrame(fx.cdc_rows(), CDC_SCHEMA)
    cfg = spark.createDataFrame(fx.table_process_rows(),
                                TABLE_PROCESS_SCHEMA)
    no_deletes = dwd.filter_deletes(cdc)
    assert cdc.filter(F.col("type") == "delete").count() == 1
    routed = dwd.route_cdc(no_deletes, cfg)
    # unknown table dropped (TableProcessFunction.java:145-148)
    assert routed.filter(F.col("table") == "mystery_table").count() == 0
    kafka_side = routed.filter(F.col("sink_type") == "kafka")
    hbase_side = routed.filter(F.col("sink_type") == "hbase")
    # orders + details + payments + favors + carts + refunds + comments
    assert kafka_side.count() == 10 + 20 + 10 + 5 + 5 + 3 + 3
    # skus + trademarks + users + provinces + spus + category3s
    assert hbase_side.count() == 9 + 3 + 5 + 3 + 3 + 4
    # P3 projection keeps only configured sink columns
    skus = dwd.project_sink_columns(
        routed, "dim_sku_info",
        ["id", "sku_name", "price", "spu_id", "category3_id", "tm_id"])
    assert skus.columns == ["id", "sku_name", "price", "spu_id",
                            "category3_id", "tm_id"]
    assert skus.count() == 9
    assert skus.filter(F.col("tm_id").isNull()).count() == 0
