"""Every registry query must match its DuckDB oracle at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

import pytest

from gmall_flink_2021_spark.plans import ORACLES, QUERIES

from .conftest import SF_SMOKE
from .parity import compare, duck_connect


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        # genuinely non-SQL-expressible (e.g. HLL estimates): the
        # driver records a rows-only check — assert it returns rows
        assert df.count() > 0
        return
    problems = compare(df, ORACLES[name], duck)
    assert not problems, f"{name}: {problems}"


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    # everything except the documented approx ops is oracle-checked
    # round 7: every sketch query now grades as an audit form (exact
    # counters + in-band verdicts) with a real oracle — nothing in
    # the registry is rows-only anymore
    assert set(QUERIES) - set(ORACLES) == set()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_grading_window_rotation_logic(tmp_path):
    """The self-rotating grading window: never-graded queries first,
    then stalest green; a contract-changed query is promoted until an
    artifact of its change round (or newer) grades it green — a
    PRE-change green row must not expire the promotion."""
    import json

    from gmall_flink_2021_spark.plans.registry import _staleness_order

    queries = {n: None for n in ("a", "b", "c", "d")}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"hash_match": True, "spark_rows": 1, "err": None},
        "b": {"hash_match": True, "spark_rows": 1, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "b": {"hash_match": True, "spark_rows": 1, "err": None},
        "c": {"hash_match": None, "spark_rows": 3, "err": "no_oracle"},
    }))
    order, latest, max_round = _staleness_order(queries, str(tmp_path))
    # d never graded -> first; a green r1; b green r2; c rows-only r2
    assert order[0] == "d"
    assert order[1] == "a"
    assert set(order[2:]) == {"b", "c"}
    assert latest == {"a": 1, "b": 2, "c": 2}
    assert max_round == 2
    # promotion expiry semantics: a query changed in round 3 with its
    # newest green row at r2 must still be promoted (2 < 3); once an
    # r3 artifact grades it, it expires (3 >= 3)
    assert latest.get("b", 0) < 3          # would promote
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "b": {"hash_match": True, "spark_rows": 1, "err": None}}))
    _, latest2, _ = _staleness_order(queries, str(tmp_path))
    assert not (latest2.get("b", 0) < 3)   # expired
    # no artifacts at all -> None (static fallback stands alone)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert _staleness_order(queries, str(empty)) is None


def test_doc_length_audit_keeps_null_lang_group(spark, tmp_path):
    """Fixture for the exact edge the round-7 null-safe join guards
    (code-review finding): a NULL lang group must survive the audit's
    estimate x exact join on the Spark side, because the DuckDB
    oracle's GROUP BY keeps it — a plain inner join made the engine
    emit one row fewer and the driver hash go red."""
    import duckdb

    from pyspark.sql import functions as F

    rows = [(1, "en", 100), (2, "en", 200), (3, None, 50),
            (4, None, 70), (5, "zh", 30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long").withColumn(
        "text", F.concat(F.lit("x"), F.col("doc_id").cast("string")))
    sf = str(tmp_path / "nulldocs")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = QUERIES["doc_length_percentiles_approx"](spark, sf)
    assert got.filter(F.col("lang").isNull()).count() == 1

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet/*.parquet'")
    assert compare(got, ORACLES["doc_length_percentiles_approx"],
                   con) == []


def test_events_audits_null_ts_parity(spark, tmp_path):
    """Pin the NULL-ts group behavior of the three events-based sketch
    audits against their oracles on a corpus WITH a null timestamp:
    uv_accuracy keeps the NULL day group on both sides (groupBy ==
    GROUP BY), while the rolling and day→month rollup audits drop it
    on both sides (their est×exact joins are equality joins on both
    engines, and the expansion/sequence over a NULL day generates no
    rows). Without this fixture that consistency is coincidence a
    refactor could break on one side only."""
    import duckdb

    from pyspark.sql import functions as F

    rows = [(1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
            (2, "2024-01-01 11:00:00", 8, "click", 1.0, "{}"),
            (3, "2024-01-02 10:00:00", 7, "view", 1.0, "{}"),
            (4, None, 9, "view", 1.0, "{}")]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path / "nullts")
    events.coalesce(1).write.parquet(f"{sf}/events.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf}/events.parquet/*.parquet'")
    for name in ("unique_visitors_daily_approx",
                 "rolling_active_users_approx", "uv_sketch_rollup"):
        got = QUERIES[name](spark, sf)
        assert compare(got, ORACLES[name], con) == [], name
    # and the one that KEEPS the null group really does
    uv = QUERIES["unique_visitors_daily_approx"](spark, sf)
    assert uv.filter(F.col("day").isNull()).count() == 1
