"""Warm 3-rep headline measurement (BASELINE.md's pinned set).

Single-shot bench walls mix codegen warmup, JIT and GC pauses into
the signal; the pinned headliners are therefore measured warm: one
discarded cold rep, then three timed reps, median reported. This
script is the repeatable form of the ad-hoc r7 measurement.

Usage:
  python tests/warm_headliners.py [sf_dir] [query ...]
    default sf_dir /root/testdata/sf0.1, default queries = the
    BASELINE.md pinned set (incl. simhash_band_pairs since r8).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HEADLINERS = [
    "visitor_stats_window", "order_wide_stats", "keyword_stats",
    "minhash_band_pairs", "dup_clusters", "langid_trigram",
    "ivfpq_ann", "bpe_merges", "contamination_check",
    "incremental_dedup",
    # added r8 (VERDICT r7 #4): warm-adjudicate the simhash wall
    "simhash_band_pairs",
]


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or HEADLINERS

    from gmall_flink_2021_spark.plans import QUERIES
    from gmall_flink_2021_spark.session import get_spark

    spark = get_spark("warm-headliners")
    spark.sparkContext.setLogLevel("ERROR")
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown query name(s): {unknown}")
    for name in names:
        fn = QUERIES[name]
        reps = []
        for rep in range(4):               # rep 0 = discarded cold
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            if rep:
                reps.append(dt)
        med = statistics.median(reps)
        print(f"{name:32s} warm median {med:5.2f} s  "
              f"(reps {'/'.join(f'{r:.2f}' for r in reps)})")
    # rig calibration alongside the walls, so the table can be
    # normalized against other rounds' rigs (VERDICT r9 #2)
    try:
        from rig_calibration import measure
    except ImportError:
        from tests.rig_calibration import measure
    print(f"rig_calibration {measure(spark)}")
    spark.stop()


if __name__ == "__main__":
    main()
