"""Capture .explain('formatted') output for registry queries into
plans/r11/<query>_<tag>.txt (the optimization round's before/after
plan evidence), plus optional noop-sink isolation timing (guide §1.4:
time the computation, not the collect/driver transfer).

Usage:
    python tests/capture_plans.py <tag> [query ...]

With no query names, captures the full registry. SPARK_GRAFT_SF_DIR
picks the data (default sf0.1). Timing is only done when
SPARK_GRAFT_PLAN_TIME=1 (two noop runs, min, printed to stderr).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gmall_flink_2021_spark.plans import QUERIES
    from gmall_flink_2021_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    do_time = os.environ.get("SPARK_GRAFT_PLAN_TIME") == "1"

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        if do_time:
            spark.sparkContext.setJobDescription(f"{name} noop [{tag}]")
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            print(f"plan-time {name} {tag} noop_min={best:.3f}s",
                  file=sys.stderr)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
