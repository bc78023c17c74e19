"""Streaming soak with crash injection (VERDICT r8 #8).

Drives the three flagship incremental jobs — the UV sketch store,
the column-profile store, and the incremental MinHash dedup marks —
as a long-running ingest loop: every cycle appends a fresh seeded
micro-corpus to the source directories, runs one availableNow pass
of all three jobs IN A SUBPROCESS, and with probability --kill-p
SIGKILLs that subprocess at a random moment mid-pass before
restarting it. After each cycle the harness asserts exactly-once
convergence against batch recomputation over EVERYTHING ingested so
far, and records state-store sizes over time.

What exactly-once means per job (all pinned by unit tests; the soak
proves them under sustained growth + real SIGKILL):
 - uv/profile stores: merged_bid embedded + atomic rename publish —
   a replayed batch id is a no-op; counters match batch EXACTLY.
 - dedup marks/state: overwrite-by-batchId idempotent writes; marks
   match operators/dedup.minhash_dedup_marks over the full corpus.

Usage:
  python tests/soak_streaming.py [--minutes 10] [--kill-p 0.4]
      [--seed 90400] [--root /tmp/gmall_soak]
  python tests/soak_streaming.py --worker <root>     (internal)

Emits <root>/timeline.json and prints a SCALE.md-ready table.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROFILE_COLS = ["lang", "source", "n_chars"]


def _paths(root):
    return {k: os.path.join(root, k) for k in
            ("src_docs", "src_events", "uv_store", "prof_store",
             "dedup_out", "dedup_state", "ck_uv", "ck_prof",
             "ck_dedup")}


# ------------------------------------------------------------ worker
def worker(root: str) -> None:
    from gmall_flink_2021_spark.session import get_spark
    from gmall_flink_2021_spark.streaming.jobs import (
        minhash_dedup_stream, profile_sketch_stream, uv_sketch_stream)

    p = _paths(root)
    spark = get_spark("soak-worker")
    spark.sparkContext.setLogLevel("ERROR")
    docs_schema = spark.read.parquet(p["src_docs"]).schema
    ev_schema = spark.read.parquet(p["src_events"]).schema

    uv_sketch_stream(
        spark.readStream.schema(ev_schema).parquet(p["src_events"]),
        p["uv_store"], p["ck_uv"])
    profile_sketch_stream(
        spark.readStream.schema(docs_schema).parquet(p["src_docs"]),
        PROFILE_COLS, p["prof_store"], p["ck_prof"])
    minhash_dedup_stream(
        spark.readStream.schema(docs_schema).parquet(p["src_docs"]),
        p["dedup_out"], p["dedup_state"], p["ck_dedup"])
    spark.stop()


# ------------------------------------------------------------ feeder
def feed(root: str, cycle: int, seed: int) -> None:
    """Append one seeded micro-corpus: doc_ids strictly increase with
    the cycle (the dedup stream's arrival-order contract — DWD gates
    identity upstream, so only non-NULL ids are fed)."""
    from fuzz_corpus import _documents_rows, _events_rows
    from adversarial_corpus import _doc_schema, _evt_schema, _write

    rng = random.Random(seed * 1000 + cycle)
    docs = [(cycle * 100000 + i, t, lg, src, n)
            for i, (d, t, lg, src, n) in
            enumerate(_documents_rows(rng, 40))]
    evs = [(cycle * 100000 + i, ts, u, et, v, pr)
           for i, (e, ts, u, et, v, pr) in
           enumerate(_events_rows(rng, 120))]
    _write(os.path.join(root, "src_docs", f"c{cycle:04d}.parquet"),
           _doc_schema(), docs)
    _write(os.path.join(root, "src_events", f"c{cycle:04d}.parquet"),
           _evt_schema(), evs)


# ------------------------------------------------------------ verify
def verify(spark, root: str) -> dict:
    import pyspark.sql.functions as F

    from gmall_flink_2021_spark.operators.dedup import \
        minhash_dedup_marks
    from gmall_flink_2021_spark.streaming import sinks

    p = _paths(root)
    docs = spark.read.parquet(p["src_docs"])
    events = spark.read.parquet(p["src_events"])
    problems = []

    sinks.recover_store(p["uv_store"])
    uv = spark.read.parquet(p["uv_store"])
    # NULL-day group included: uv_daily_sketches counts undated
    # events' page views under the NULL day
    want_pv = {str(r.day): r.pv for r in
               events.groupBy(F.date_trunc("DAY", "ts").alias("day"))
               .agg(F.count(F.lit(1)).alias("pv")).collect()}
    got_pv = {str(r.day): r.pv_ct for r in uv.collect()}
    if want_pv != got_pv:
        problems.append(f"uv pv_ct mismatch: {len(want_pv)} batch "
                        f"days vs {len(got_pv)} store days")

    sinks.recover_store(p["prof_store"])
    prof = {r.col_name: (r.ct, r.null_ct) for r in
            spark.read.parquet(p["prof_store"]).collect()}
    n = docs.count()
    for c in PROFILE_COLS:
        nn = docs.filter(F.col(c).isNull()).count()
        if prof.get(c, (None, None))[:2] != (n, nn):
            problems.append(
                f"profile {c}: store {prof.get(c)} != batch {(n, nn)}")

    got = {r.doc_id: (r.is_dup, r.earliest_prior) for r in
           spark.read.parquet(p["dedup_out"]).collect()}
    marks_df, mh = minhash_dedup_marks(
        docs.filter(F.col("doc_id").isNotNull()))
    want = {r.doc_id: (r.is_dup, r.earliest_prior)
            for r in marks_df.collect()}
    mh.unpersist()
    if got != want:
        diff = [k for k in want if got.get(k) != want[k]][:5]
        n_bad = len([k for k in want if got.get(k) != want[k]])
        problems.append(
            f"dedup marks diverge on {n_bad} docs, e.g. {diff}")

    def du(path):
        total = 0
        for d, _, fs in os.walk(path):
            total += sum(os.path.getsize(os.path.join(d, f))
                         for f in fs)
        return total

    return {
        "problems": problems,
        "docs": n, "events": events.count(),
        "uv_store_bytes": du(p["uv_store"]),
        "prof_store_bytes": du(p["prof_store"]),
        "dedup_state_bytes": du(p["dedup_state"]),
        "dedup_out_rows": len(got),
    }


# ------------------------------------------------------------ driver
def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--worker":
        worker(argv[1])
        return

    def opt(name, default, cast=float):
        return cast(argv[argv.index(name) + 1]) if name in argv \
            else default

    minutes = opt("--minutes", 10.0)
    kill_p = opt("--kill-p", 0.4)
    seed = opt("--seed", 90400, int)
    root = opt("--root", "/tmp/gmall_soak", str)
    shutil.rmtree(root, ignore_errors=True)
    # only the SOURCE dirs may pre-exist: the jobs key their
    # cold-start behavior on their state/store paths not existing
    # yet (an empty state dir reads as a corrupt store)
    p = _paths(root)
    os.makedirs(p["src_docs"], exist_ok=True)
    os.makedirs(p["src_events"], exist_ok=True)

    from gmall_flink_2021_spark.session import get_spark

    spark = get_spark("soak-verify")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    deadline = time.time() + minutes * 60
    timeline, cycle, kills = [], 0, 0
    while time.time() < deadline:
        feed(root, cycle, seed)
        attempts = 0
        while True:
            attempts += 1
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", root],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if rng.random() < kill_p:
                time.sleep(rng.uniform(3, 25))
                if proc.poll() is None:
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    kills += 1
                    continue   # crashed mid-pass: restart (resume)
            rc = proc.wait()
            if rc == 0:
                break
            if attempts > 4:
                raise RuntimeError(f"worker kept failing (rc={rc})")
        row = verify(spark, root)
        row.update(cycle=cycle, kills_so_far=kills,
                   worker_attempts=attempts, t=round(time.time(), 1))
        timeline.append(row)
        json.dump(timeline, open(os.path.join(root, "timeline.json"),
                                 "w"), indent=1)
        status = "OK" if not row["problems"] else "FAIL"
        print(f"cycle {cycle:3d} [{status}] docs={row['docs']:6d} "
              f"events={row['events']:6d} kills={kills} "
              f"state(dedup/uv/prof)={row['dedup_state_bytes']}/"
              f"{row['uv_store_bytes']}/{row['prof_store_bytes']} B",
              flush=True)
        if row["problems"]:
            print("  " + "\n  ".join(row["problems"]), flush=True)
            sys.exit(1)
        cycle += 1
    print(f"\nSOAK PASS: {cycle} cycles, {kills} SIGKILLs, all "
          f"exactly-once checks green → {root}/timeline.json")
    spark.stop()


if __name__ == "__main__":
    main()
