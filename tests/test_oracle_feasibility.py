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


def test_replica_factor_parsing():
    assert replica_factor("/root/testdata/sf0.001") == 1
    assert replica_factor("/root/testdata/sf0.1") == 1
    assert replica_factor("/tmp/gmall_adversarial/edge") == 1
    assert replica_factor("/tmp/gmall_stress_x10") == 10
    assert replica_factor("/tmp/gmall_stress_x16") == 16
    assert replica_factor("/tmp/gmall_stress_x32/") == 32


def test_oracle_is_feasible_honors_the_pin():
    q = "cross_source_dup_matrix"
    assert oracle_is_feasible(q, "/root/testdata/sf0.01")
    assert oracle_is_feasible(q, "/tmp/gmall_stress_x10")
    assert not oracle_is_feasible(q, "/tmp/gmall_stress_x16")
    assert not oracle_is_feasible(q, "/tmp/gmall_stress_x32")
    # unpinned queries are feasible everywhere
    assert oracle_is_feasible("pricing_summary", "/tmp/gmall_stress_x32")


def test_run_parity_skips_infeasible_oracle_engine_only(tmp_path):
    """End-to-end: a corpus directory whose name carries an x16
    replica factor makes run_parity run the ENGINE side only for the
    pinned query, report SKIP-ORACLE-INFEASIBLE with the engine row
    count, and exit 0."""
    corpus = tmp_path / "parity_pin_x16"
    corpus.mkdir()
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
