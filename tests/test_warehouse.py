"""The composed warehouse topology end-to-end: ODS files in, serving
answers out, everything through the streaming jobs."""

import os

from pyspark.sql import functions as F

from gmall_flink_2021_spark.sources import cdc as cdc_src
from gmall_flink_2021_spark.sources import gmall_fixtures as fx
from gmall_flink_2021_spark.streaming.warehouse import Warehouse


def test_warehouse_end_to_end(spark, tmp_path):
    work = str(tmp_path / "wh")
    # default = exact reference-parity mode: every streaming==batch
    # comparison below is bit-exact. The opt-in constant-state 100 TB
    # posture (approx_distinct=True) is covered by
    # test_warehouse_approx_distinct_within_band.
    wh = Warehouse(spark, work, fx.table_process_rows())
    assert wh.approx_distinct is False  # documented parity default
    cdc_src.write_changelog_fixture(fx.cdc_rows(),
                                    os.path.join(work, "ods_db"))
    with open(os.path.join(work, "ods_log", "log-0.txt"), "w") as f:
        f.write("\n".join(fx.page_log_lines()))

    wh.run_all()

    # dims materialized and merged
    assert wh.dim("dim_sku_info").count() == 9
    assert wh.dim("dim_base_trademark").count() == 3
    # DWD topics exist with expected shapes
    assert spark.read.parquet(
        os.path.join(work, "dwd", "log_page")).count() > 0
    assert spark.read.parquet(
        os.path.join(work, "dwd", "dirty")).count() > 0
    # DWM wide table enriched
    ow = spark.read.parquet(os.path.join(work, "dwd", "dwm_order_wide"))
    assert ow.count() == 15
    assert ow.filter(F.col("tm_name").isNull()).count() == 0
    # stateful outputs landed
    assert spark.read.parquet(
        os.path.join(work, "dwd", "dwm_unique_visit")).count() > 0
    # DWS stats + serving answers
    vs = spark.read.parquet(os.path.join(work, "dws", "visitor_stats"))
    assert vs.agg(F.sum("pv_ct")).collect()[0][0] == spark.read.parquet(
        os.path.join(work, "dwd", "log_page")).count()
    g = wh.gmv("20200913").collect()[0].gmv
    assert g is not None and float(g) > 0
    top = wh.trademark_top("20200913").collect()
    assert top and top[0].tm_name in {"tm-a", "tm-b", "tm-c"}

    # streaming DWS: the true streaming visitor-stats job must agree
    # with the batch job on every watermark-closed window
    wh.run_visitor_stats_streaming()
    stream_vs = spark.read.parquet(
        os.path.join(work, "dws", "visitor_stats_stream")).drop("batch_id")
    page = spark.read.parquet(os.path.join(work, "dwd", "log_page"))
    import datetime

    max_et = page.agg(F.max(F.timestamp_millis("ts"))).collect()[0][0]
    horizon = max_et - datetime.timedelta(seconds=1)
    want = {tuple(r) for r in vs.filter(F.col("edt") <= horizon).collect()}
    got = {tuple(r) for r in
           stream_vs.filter(F.col("edt") <= horizon).collect()}
    assert want and got == want

    # streaming PaymentWide + ProductStats (topic-to-topic chaining):
    # closed windows must agree with the batch ProductStats job
    wh.run_payment_wide()
    wh.run_product_stats_streaming()
    pw = spark.read.parquet(os.path.join(work, "dwd", "dwm_payment_wide"))
    assert pw.count() == spark.read.parquet(
        os.path.join(work, "dws", "product_stats")).agg(
        F.sum("paid_order_ct")).collect()[0][0]
    from gmall_flink_2021_spark.operators import gmall_dwm, gmall_dws

    batch_ps = gmall_dws.product_stats(
        page=page, display=spark.read.parquet(
            os.path.join(work, "dwd", "log_display")),
        favor=wh.typed_fact("favor_info"),
        cart=wh.typed_fact("cart_info"),
        order_wide=ow.drop("batch_id"),
        payment_wide=pw.drop("batch_id"),
        refund=wh.typed_fact("order_refund_info"),
        comment=wh.typed_fact("comment_info"))
    stream_ps = spark.read.parquet(
        os.path.join(work, "dws", "product_stats_stream")).drop("batch_id")
    # the watermark tracks the max event time reaching the window
    # operator (post-filter union of the 8 sources), not the page max
    union_times = [
        wh.typed_fact("comment_info").agg(
            F.max(F.to_timestamp("create_time"))).collect()[0][0],
        wh.typed_fact("order_refund_info").agg(
            F.max(F.to_timestamp("create_time"))).collect()[0][0],
        pw.agg(F.max("payment_et")).collect()[0][0],
        page.filter(F.col("page.page_id") == "good_detail").agg(
            F.max(F.timestamp_millis("ts"))).collect()[0][0],
    ]
    union_max = max(t for t in union_times if t is not None)
    horizon2 = union_max - datetime.timedelta(seconds=1)
    wantp = {tuple(r) for r in
             batch_ps.filter(F.col("edt") <= horizon2).collect()}
    gotp = {tuple(r) for r in
            stream_ps.filter(F.col("edt") <= horizon2).collect()}
    assert wantp and gotp == wantp

    # streaming KeywordStats + ProvinceStats (the remaining DWS jobs)
    wh.run_keyword_stats_streaming()
    wh.run_province_stats_streaming()
    kw = spark.read.parquet(
        os.path.join(work, "dws", "keyword_stats_stream"))
    batch_kw = gmall_dws.keyword_stats(page)
    kmax = page.filter(F.col("page.page_id") == "good_list").agg(
        F.max(F.timestamp_millis("ts"))).collect()[0][0]
    kh = kmax - datetime.timedelta(seconds=1)
    assert ({tuple(r) for r in kw.drop("batch_id")
             .filter(F.col("edt") <= kh).collect()}
            == {tuple(r) for r in batch_kw
                .filter(F.col("edt") <= kh).collect()})
    prov = spark.read.parquet(
        os.path.join(work, "dws", "province_stats_stream"))
    batch_prov = gmall_dws.province_stats_sql(spark, ow.drop("batch_id"))
    omax = ow.agg(F.max("order_et")).collect()[0][0]
    oh = omax - datetime.timedelta(seconds=1)
    assert ({tuple(r) for r in prov.drop("batch_id")
             .filter(F.col("edt") <= oh).collect()}
            == {tuple(r) for r in batch_prov
                .filter(F.col("edt") <= oh).collect()})

    # idempotent re-run: same checkpoints, no new input → no duplicates
    before = ow.count()
    wh.run_base_db()
    wh.run_order_wide()
    after = spark.read.parquet(
        os.path.join(work, "dwd", "dwm_order_wide")).count()
    assert after == before

def test_dim_tables_are_config_driven(spark, tmp_path):
    """K4 runtime DDL + broadcast-state semantics: a table_process row
    arriving MID-STREAM materializes an unseen dim table for every
    later batch — name, column list, and pk all come from the config,
    nothing is hardcoded (TableProcessFunction.java:62-121,
    BaseDBApp.java:78-88). Records that arrive before their config row
    are dropped, exactly as the reference's unmatched-key path."""
    import json

    def color_row(cid, name):
        return {"database": "gmall2021", "table": "base_color",
                "type": "insert",
                "data": json.dumps({"color_id": cid, "color_name": name,
                                    "stray_field": "dropped"}),
                "before_data": "{}"}

    work = str(tmp_path / "wh_cfg")
    wh = Warehouse(spark, work, fx.table_process_rows())
    # batch 1: base_color has NO config yet -> its rows are dropped
    cdc_src.write_changelog_fixture(
        fx.cdc_rows() + [color_row(1, "pre-config-dropped")],
        os.path.join(work, "ods_db"))
    wh.run_base_db()
    assert not os.path.isdir(os.path.join(work, "dim", "dim_base_color"))

    # config row arrives mid-stream; later batches route the new table
    wh.add_config_rows([{
        "source_table": "base_color", "operate_type": "insert",
        "sink_type": "hbase", "sink_table": "dim_base_color",
        "sink_columns": "color_id,color_name", "sink_pk": "color_id",
        "sink_extend": None}])
    with open(os.path.join(work, "ods_db", "changelog-1.jsonl"), "w") as f:
        f.write(json.dumps(color_row(7, "crimson")) + "\n")
    wh.run_base_db()

    got = wh.dim("dim_base_color")
    # configured projection applied; configured (non-"id") pk respected;
    # only the post-config record landed
    assert got.columns == ["color_id", "color_name"]
    assert [tuple(r) for r in got.collect()] == [(7, "crimson")]
    # discovered by the dims() helper alongside the standard tables
    d = wh.dims()
    assert "base_color" in d and "sku_info" in d

    # schema evolution mid-stream: a config update widens the column
    # list; existing rows keep nulls in the new column (additive DDL)
    wh.add_config_rows([{
        "source_table": "base_color", "operate_type": "insert",
        "sink_type": "hbase", "sink_table": "dim_base_color",
        "sink_columns": "color_id,color_name,hex", "sink_pk": "color_id",
        "sink_extend": None}])
    with open(os.path.join(work, "ods_db", "changelog-2.jsonl"), "w") as f:
        f.write(json.dumps({
            "database": "gmall2021", "table": "base_color",
            "type": "insert",
            "data": json.dumps({"color_id": 8, "color_name": "navy",
                                "hex": "#001f3f"}),
            "before_data": "{}"}) + "\n")
    wh.run_base_db()
    evolved = {r["color_id"]: r for r in
               wh.dim("dim_base_color").collect()}
    assert set(evolved) == {7, 8}
    assert evolved[8]["hex"] == "#001f3f"
    assert evolved[7]["hex"] is None

    # cold fallback: a spec with NO column list derives column names
    # from the JSON payload itself (reference keeps such records
    # unfiltered, TableProcessFunction.java:62-68) — exercised via
    # the DataFrame-only json_object_keys scan, no .rdd hop
    wh.add_config_rows([{
        "source_table": "base_material", "operate_type": "insert",
        "sink_type": "hbase", "sink_table": "dim_base_material",
        "sink_columns": None, "sink_pk": "id", "sink_extend": None}])
    with open(os.path.join(work, "ods_db", "changelog-3.jsonl"), "w") as f:
        f.write(json.dumps({
            "database": "gmall2021", "table": "base_material",
            "type": "insert",
            "data": json.dumps({"id": 3, "material_name": "cotton",
                                "extra": "kept"}),
            "before_data": "{}"}) + "\n")
    wh.run_base_db()
    mat = wh.dim("dim_base_material")
    assert sorted(mat.columns) == ["extra", "id", "material_name"]
    row = mat.collect()[0]
    assert (row["id"], row["material_name"], row["extra"]) \
        == (3, "cotton", "kept")


def test_warehouse_approx_distinct_within_band(spark, tmp_path):
    """The OPT-IN 100 TB deployment posture is the constant-state
    path: approx_distinct=True swaps the per-window distinct order
    sets for HyperLogLog++ counters (the default stays exact for
    reference parity). Gate: against the exact batch ProductStats
    every summed metric must be identical (approximation touches ONLY
    the distinct counts) and each distinct count must sit inside the
    approx_count_distinct band (rsd 5% ⇒ ~3σ = 15%, with the ±2
    absolute floor for tiny groups — the same combined band as
    test_windowed_approx_uv_within_band)."""
    from gmall_flink_2021_spark.operators import gmall_dws

    work = str(tmp_path / "wh_approx")
    wh = Warehouse(spark, work, fx.table_process_rows(),
                   approx_distinct=True)
    assert wh.approx_distinct is True
    cdc_src.write_changelog_fixture(fx.cdc_rows(),
                                    os.path.join(work, "ods_db"))
    with open(os.path.join(work, "ods_log", "log-0.txt"), "w") as f:
        f.write("\n".join(fx.page_log_lines()))
    wh.run_base_db()
    wh.run_base_log()
    wh.run_order_wide()
    wh.run_payment_wide()
    wh.run_product_stats_streaming()

    page = spark.read.parquet(os.path.join(work, "dwd", "log_page"))
    ow = spark.read.parquet(
        os.path.join(work, "dwd", "dwm_order_wide")).drop("batch_id")
    pw = spark.read.parquet(
        os.path.join(work, "dwd", "dwm_payment_wide")).drop("batch_id")
    exact = gmall_dws.product_stats(
        page=page,
        display=spark.read.parquet(os.path.join(work, "dwd", "log_display")),
        favor=wh.typed_fact("favor_info"),
        cart=wh.typed_fact("cart_info"),
        order_wide=ow, payment_wide=pw,
        refund=wh.typed_fact("order_refund_info"),
        comment=wh.typed_fact("comment_info"))
    got = spark.read.parquet(
        os.path.join(work, "dws", "product_stats_stream")).drop("batch_id")

    approx_cols = {"order_ct", "paid_order_ct", "refund_order_ct"}
    key = ["stt", "sku_id"]
    want_rows = {(str(r["stt"]), r["sku_id"]): r for r in exact.collect()}
    got_rows = got.collect()
    assert got_rows, "streaming job emitted no closed windows"
    for r in got_rows:
        w = want_rows[(str(r["stt"]), r["sku_id"])]
        for f in exact.columns:
            if f in approx_cols:
                assert abs(r[f] - w[f]) <= max(0.15 * w[f], 2.0), \
                    (f, r["sku_id"], r[f], w[f])
            else:
                assert str(r[f]) == str(w[f]), (f, r["sku_id"])
