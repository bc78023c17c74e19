"""Full-registry scale sweep: run EVERY registry query at the x10
replica corpus (~sf1.0, 10x the bench scale) and compare each wall to
its sf0.1 wall, registry-wide — the proof that the per-operator
linearity story in SCALE.md generalizes (VERDICT r6 task #1).

Baseline walls come from bench_results.json (written by bench.py at
sf0.1); run `python bench.py` first if it is stale. Queries whose
audit forms refuse oversized inputs BY DESIGN (the in-code fences on
the exhaustive/all-pairs forms) are reported as FENCED, not failures.

Usage: python tests/sweep_full_registry.py [out_json]
           [--factor N] [query ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_args = sys.argv[1:]
FACTOR = 10
if "--factor" in _args:
    i = _args.index("--factor")
    FACTOR = int(_args[i + 1])
    del _args[i:i + 2]
SRC = "/root/testdata/sf0.1"
DST = f"/tmp/gmall_stress_x{FACTOR}"
OUT = _args[0] if _args else f"/tmp/sweep_x{FACTOR}_full.json"
ONLY = set(_args[1:])


def main():
    # stress_scale parses sys.argv at import time — hide ours, then
    # point its module-level FACTOR/DST at this sweep's factor (its
    # replicate() reads both globals)
    argv, sys.argv = sys.argv, sys.argv[:1]
    import stress_scale
    sys.argv = argv
    stress_scale.FACTOR = FACTOR
    stress_scale.DST = DST

    from gmall_flink_2021_spark.plans import QUERIES as REG
    from gmall_flink_2021_spark.session import get_spark

    spark = get_spark(f"sweep-x{FACTOR}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    stress_scale.replicate(spark)
    print(f"replicate x{FACTOR}: {time.time() - t0:.1f}s", flush=True)

    base = {}
    if os.path.exists("bench_results.json"):
        base = json.load(open("bench_results.json")).get("queries", {})

    rows = {}
    for name, fn in REG.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            n = len(fn(spark, DST).collect())
            err = None
        except RuntimeError as e:
            n, err = -1, f"FENCED: {str(e)[:200]}"
        except Exception as e:
            n, err = -1, f"ERROR: {type(e).__name__}: {str(e)[:200]}"
        wall = time.time() - t0
        b = base.get(name)
        ratio = (wall / b) if b else None
        rows[name] = {f"x{FACTOR}_wall": round(wall, 3), "rows": n,
                      "sf01_wall": b, "ratio": round(ratio, 2)
                      if ratio else None, "err": err}
        tag = ""
        if err:
            tag = "  <-- " + err.split(":")[0]
        elif ratio and ratio > 3 * FACTOR:
            tag = "  <-- >3x PER DATA"
        elif ratio and ratio > 2 * FACTOR:
            tag = "  <-- >2x per data"
        print(f"{name:32s} x{FACTOR}={wall:7.2f}s sf0.1={b if b else -1:6.2f}s "
              f"ratio={ratio if ratio else -1:6.1f}{tag}", flush=True)
        json.dump(rows, open(OUT, "w"), indent=1)
    total = sum(r[f"x{FACTOR}_wall"] for r in rows.values())
    print(f"\nTOTAL x{FACTOR} wall: {total:.1f}s over {len(rows)} queries",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
