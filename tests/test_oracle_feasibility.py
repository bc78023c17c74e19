"""Machine-readable oracle-feasibility ceiling (VERDICT r8 #2).

The x16 full-registry oracle sweep's single exception —
cross_source_dup_matrix, whose exact-expansion DuckDB oracle needs
>115 GB of working set at the x16 replica corpus while the engine
finishes in 25 s — is pinned in
``registry.ORACLE_INFEASIBLE_ABOVE`` and honored by
``tests/run_parity.py`` (engine-only, reported as a SKIP), so a
full-corpus sweep needs zero prose-only exceptions.  These tests pin
the constant's referential integrity, the factor parsing, and the
sweep runner's behavior end-to-end.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

from gmall_flink_2021_spark.plans import ORACLES, QUERIES
from gmall_flink_2021_spark.plans.registry import (
    ORACLE_INFEASIBLE_ABOVE, oracle_is_feasible, replica_factor)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pin_names_real_registry_queries_with_oracles():
    for name in ORACLE_INFEASIBLE_ABOVE:
        assert name in QUERIES, name
        assert name in ORACLES, name  # the oracle EXISTS; it is
        # only infeasible above the pinned factor


def test_pinned_factors_cover_the_proven_scale():
    # the pin must never claim infeasibility at-or-below the bench
    # scale (factor 1) — that would silently unplug the driver gate
    assert all(f >= 1 for f in ORACLE_INFEASIBLE_ABOVE.values())
    # cross_source_dup_matrix is value-proven through x10 (SCALE.md
    # round 8: 1161 s oracle wall, PASS)
    assert ORACLE_INFEASIBLE_ABOVE["cross_source_dup_matrix"] == 10


def _marked(tmp_path, name, factor):
    d = tmp_path / name
    d.mkdir()
    (d / "replica_factor.json").write_text('{"factor": %d}' % factor)
    return str(d)


def test_replica_factor_reads_the_marker(tmp_path):
    # unmarked dirs — including names that LOOK like stress corpora —
    # are factor 1 (ADVICE r9: the basename pattern-match was a
    # silent-downgrade loophole)
    assert replica_factor("/root/testdata/sf0.001") == 1
    assert replica_factor("/root/testdata/sf0.1") == 1
    assert replica_factor("/tmp/gmall_adversarial/edge") == 1
    unmarked = tmp_path / "coincidental_x16"
    unmarked.mkdir()
    assert replica_factor(str(unmarked)) == 1
    # marked dirs carry their written factor regardless of name
    assert replica_factor(_marked(tmp_path, "stress_a", 10)) == 10
    assert replica_factor(_marked(tmp_path, "whatever", 16)) == 16
    assert replica_factor(_marked(tmp_path, "big", 32) + "/") == 32


def test_replicate_writes_the_marker(tmp_path, spark):
    import tests.stress_scale as stress_scale

    dst = str(tmp_path / "replicated")
    orig_factor, orig_dst = stress_scale.FACTOR, stress_scale.DST
    orig_src = stress_scale.SRC
    try:
        stress_scale.FACTOR, stress_scale.DST = 2, dst
        stress_scale.SRC = "/root/testdata/sf0.001"
        stress_scale.replicate(spark)
    finally:
        stress_scale.FACTOR, stress_scale.DST = orig_factor, orig_dst
        stress_scale.SRC = orig_src
    assert replica_factor(dst) == 2


def test_oracle_is_feasible_honors_the_pin(tmp_path):
    q = "cross_source_dup_matrix"
    assert oracle_is_feasible(q, "/root/testdata/sf0.01")
    assert oracle_is_feasible(q, _marked(tmp_path, "a", 10))
    assert not oracle_is_feasible(q, _marked(tmp_path, "b", 16))
    x32 = _marked(tmp_path, "c", 32)
    assert not oracle_is_feasible(q, x32)
    # unpinned queries are feasible everywhere
    assert oracle_is_feasible("pricing_summary", x32)


def test_run_parity_skips_infeasible_oracle_engine_only(tmp_path):
    """End-to-end: a corpus directory carrying an x16
    replica_factor.json marker makes run_parity run the ENGINE side
    only for the pinned query, report SKIP-ORACLE-INFEASIBLE with the
    engine row count, and exit 0."""
    corpus = tmp_path / "parity_pin"
    corpus.mkdir()
    (corpus / "replica_factor.json").write_text('{"factor": 16}')
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    corpus / f"{t}.parquet")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "run_parity.py"),
         str(corpus), "cross_source_dup_matrix"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "[SKIP-ORACLE-INFEASIBLE] cross_source_dup_matrix" \
        in out.stdout
    assert "engine rows=" in out.stdout
    assert "(1 oracle-infeasible, engine-only)" in out.stdout
