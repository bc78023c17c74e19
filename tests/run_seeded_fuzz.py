"""Dev loop for the seeded parity fuzz: build one corpus per seed
and run the FULL registry against the mirrored DuckDB oracles on it.

Usage: python tests/run_seeded_fuzz.py [seed ...]   (default: 3
random-ish seeds derived from the clock — the in-suite entry
tests/test_seeded_fuzz.py uses round-derived deterministic seeds)

Any failure prints the seed and the exact repro command.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = "/tmp/gmall_fuzz"


def sweep(spark, con, sf_dir, seed):
    from gmall_flink_2021_spark.plans import ORACLES, QUERIES
    from parity import compare

    failures = []
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            problems = compare(fn(spark, sf_dir), ORACLES[name], con)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            problems = [f"EXCEPTION: {type(e).__name__}: "
                        f"{str(e)[:400]}"]
        if problems:
            failures.append((name, problems))
            print(f"[FAIL seed={seed}] {name} "
                  f"({time.time() - t0:.1f}s)", flush=True)
            for p in problems:
                print(f"    {p}")
    return failures


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [
        int(time.time()) % 100000 + i for i in range(3)]
    from fuzz_corpus import build_seeded
    from parity import duck_connect

    from gmall_flink_2021_spark.session import get_spark

    spark = get_spark("seeded-fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    total = 0
    for seed in seeds:
        t0 = time.time()
        # convention: seeds >= 20000 also NULL-inject the relational
        # tables (orders/lineitem foreign keys, dates, statuses)
        sf_dir = build_seeded(ROOT, seed, force=True,
                              relational_dirt=seed >= 20000)
        fails = sweep(spark, duck_connect(sf_dir), sf_dir, seed)
        total += len(fails)
        print(f"seed {seed}: {len(fails)} failures "
              f"({time.time() - t0:.1f}s)  "
              f"repro: python tests/run_seeded_fuzz.py {seed}",
              flush=True)
    spark.stop()
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
