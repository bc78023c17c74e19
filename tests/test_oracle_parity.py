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
    assert set(QUERIES) - set(ORACLES) == {"unique_visitors_daily_approx",
                                           "uv_sketch_rollup",
                                           "doc_length_percentiles_approx"}


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
