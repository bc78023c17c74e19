"""Quantitative accuracy gates for the no-oracle sketch queries.

The driver's CORRECTNESS row for `unique_visitors_daily_approx` and
`uv_sketch_rollup` is rows-only (sketch encodings aren't
SQL-expressible), so these tests supply the missing value-level
criterion: every estimate must land within ~3 standard errors of the
exact distinct count DuckDB computes on the same keys — the bands are
declared next to the oracles in ``plans.registry.SKETCH_GATES``.
"""

import sys

import pytest

from gmall_flink_2021_spark.plans.registry import QUERIES, SKETCH_GATES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    sys.path.insert(0, "tests")
    from parity import duck_connect

    return duck_connect(SF)


@pytest.mark.parametrize("name", sorted(SKETCH_GATES))
def test_sketch_estimates_within_error_band(spark, duck, name):
    result = QUERIES[name](spark, SF).toPandas()
    assert len(result) > 0
    for gate in SKETCH_GATES[name]:
        exact = duck.execute(gate["exact_sql"]).df()
        exact_by_key = {
            tuple(str(row[k]) for k in gate["keys"]): int(row["exact_ct"])
            for _, row in exact.iterrows()}
        checked = 0
        for _, row in result.iterrows():
            key = tuple(str(row[k]) for k in gate["keys"])
            assert key in exact_by_key, (name, gate["estimate"], key)
            exact_ct = exact_by_key[key]
            est = float(row[gate["estimate"]])
            rel_err = abs(est - exact_ct) / exact_ct
            assert rel_err <= gate["max_rel_err"], (
                f"{name}.{gate['estimate']} key={key}: est={est} "
                f"exact={exact_ct} rel_err={rel_err:.4f} "
                f"> {gate['max_rel_err']}")
            checked += 1
        assert checked == len(result)
