"""Per-stage task-metric probe for registry queries (guide §1/§7).

Runs each named query against the noop sink with the Spark event log
enabled, then parses the event log to attribute wall time per stage:
task count, executor run/GC/deserialize time, shuffle fetch wait,
bytes read/written. This separates engine cost from this rig's
sporadic multi-second host stalls (a stall shows up as wall >>
executorRunTime; real cost shows up as run time).

Usage:
    python tests/probe_metrics.py <query> [query ...]   # sf from env
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gmall_flink_2021_spark.plans import QUERIES
    from gmall_flink_2021_spark.session import get_spark

    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evt_dir = "/tmp/spark-events-probe"
    import shutil
    shutil.rmtree(evt_dir, ignore_errors=True)
    os.makedirs(evt_dir, exist_ok=True)

    spark = get_spark("metric-probe", extra={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evt_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("PROBE_REPS", "2"))
    walls: dict[str, list[float]] = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"PROBE {name} r{rep}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(time.time() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----------------------------------------
    candidates = [os.path.join(evt_dir, f) for f in os.listdir(evt_dir)
                  if app_id in f]
    paths: list[str] = []
    for c in candidates:
        if os.path.isdir(c):      # Spark 4 rolling event-log dir
            paths += [os.path.join(c, f) for f in sorted(os.listdir(c))
                      if f.startswith("events")]
        else:
            paths.append(c)
    stages: dict[int, dict] = {}        # stageId -> aggregates
    stage_of_job: dict[int, list[int]] = {}
    desc_of_job: dict[int, str] = {}
    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in lines():
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc_of_job[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", "")
                stage_of_job[jid] = [s["Stage ID"]
                                     for s in ev["Stage Infos"]]
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                sm = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                ti = ev.get("Task Info") or {}
                agg = stages.setdefault(sid, {
                    "tasks": 0, "run_ms": 0, "gc_ms": 0, "deser_ms": 0,
                    "fetch_ms": 0, "sched_ms": 0, "result_ms": 0,
                    "sh_read_b": 0, "sh_write_b": 0, "in_b": 0,
                    "first_launch": float("inf"), "last_finish": 0})
                agg["tasks"] += 1
                agg["run_ms"] += m.get("Executor Run Time", 0)
                agg["gc_ms"] += m.get("JVM GC Time", 0)
                agg["deser_ms"] += m.get("Executor Deserialize Time", 0)
                agg["result_ms"] += m.get("Result Serialization Time", 0)
                agg["fetch_ms"] += sm.get("Fetch Wait Time", 0)
                agg["sh_read_b"] += (sm.get("Remote Bytes Read", 0)
                                     + sm.get("Local Bytes Read", 0))
                agg["sh_write_b"] += sw.get("Shuffle Bytes Written", 0)
                agg["in_b"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0)
                agg["first_launch"] = min(agg["first_launch"],
                                          ti.get("Launch Time", 0))
                agg["last_finish"] = max(agg["last_finish"],
                                         ti.get("Finish Time", 0))

    for name in names:
        print(f"\n=== {name}  walls={['%.2f' % w for w in walls[name]]}")
        jids = [j for j, d in desc_of_job.items()
                if d.startswith(f"PROBE {name} ")]
        seen = set()
        for j in sorted(jids):
            for sid in sorted(stage_of_job.get(j, [])):
                if sid in seen or sid not in stages:
                    continue
                seen.add(sid)
                a = stages[sid]
                span = (a["last_finish"] - a["first_launch"]) / 1000
                print(f"  [{desc_of_job[j][-2:]}] stage {sid:4d} "
                      f"tasks={a['tasks']:3d} span={span:6.2f}s "
                      f"run={a['run_ms'] / 1000:6.2f}s "
                      f"gc={a['gc_ms'] / 1000:5.2f}s "
                      f"deser={a['deser_ms'] / 1000:5.2f}s "
                      f"fetch={a['fetch_ms'] / 1000:5.2f}s "
                      f"in={a['in_b'] // 1024:6d}K "
                      f"shR={a['sh_read_b'] // 1024:6d}K "
                      f"shW={a['sh_write_b'] // 1024:6d}K")


if __name__ == "__main__":
    main()
