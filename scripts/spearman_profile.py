"""Stage-level profiler for ANY registry key (born as the round-11
spearman profile — verdict task #3: "profile which of the 8
exchanges dominates — stage-level timeline, not totals" — and since
used on dedup_minhash_lsh, where it surfaced the
InferFiltersFromGenerate serial pre-pass, and cdc_merge_orders).

Runs the query warm with the Spark event log enabled, then parses the
log for per-stage submit→complete wall spans, task-time totals and
shuffle bytes, printing a ranked table with each stage's plan-scope
names so stages map back to pipeline phases.  The two findings this
tool produced in round 11 (the one-effective-task scan on
single-row-group files; the inferred generator filter evaluating the
heavy map phase twice, serially) were both invisible in wall-clock
totals and obvious in the stage table.

Usage: python scripts/spearman_profile.py [--sf /root/testdata/sf0.1]
       [--key stats_spearman_corr] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--key", default="stats_spearman_corr")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark_events_")
    from duckdb_hdfs_spark.session import builder
    from duckdb_hdfs_spark.queries import load_all

    spark = (
        builder("spearman-profile")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qd = load_all()[args.key]

    # warm: tables + codegen
    from duckdb_hdfs_spark.sources.catalog import TABLES, load_table

    for tbl in TABLES:
        load_table(spark, args.sf, tbl).write.format("noop").mode(
            "overwrite"
        ).save()
    qd.spark(spark, args.sf).write.format("noop").mode("overwrite").save()

    # timed reps, tagged with a job group so the event log separates them
    walls = []
    sc = spark.sparkContext
    for i in range(args.reps):
        sc.setJobGroup(f"rep{i}", args.key)
        t0 = time.perf_counter()
        qd.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    sc.setJobGroup("done", "done")
    print(f"# wall per rep: {[round(w, 3) for w in walls]}", flush=True)
    app_id = sc.applicationId
    spark.stop()

    # parse the event log
    log = next(
        p for p in (os.path.join(evdir, f) for f in os.listdir(evdir))
        if app_id in p
    )
    if os.path.isdir(log):  # Spark 4 rolling event log directory
        logs = sorted(
            os.path.join(log, f) for f in os.listdir(log)
            if f.startswith("events")
        )
    else:
        logs = [log]
    jobs = {}  # jobId -> group
    stages = {}  # stageId -> dict
    def lines():
        for p in logs:
            with open(p) as fh:
                yield from fh

    if True:
        for line in lines():
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = (
                    ev.get("Properties", {}).get("spark.jobGroup.id"),
                    [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                )
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                scopes = []
                for r in si.get("RDD Info", []):
                    sc_json = r.get("Scope")
                    if sc_json:
                        try:
                            nm = json.loads(sc_json).get("name", "")
                        except Exception:  # noqa: BLE001
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                st = stages.setdefault(sid, {})
                st.update(
                    name=si.get("Stage Name", ""),
                    wall=(si.get("Completion Time", 0)
                          - si.get("Submission Time", 0)) / 1000.0,
                    tasks=si.get("Number of Tasks", 0),
                    scopes=scopes,
                )
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {})
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["shuffle_write"] = st.get("shuffle_write", 0) + (
                    (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                )

    # group stages by rep
    per_rep: dict[str, list[int]] = {}
    for _jid, (grp, sids) in jobs.items():
        if grp and grp.startswith("rep"):
            per_rep.setdefault(grp, []).extend(sids)

    for grp in sorted(per_rep):
        sids = [s for s in per_rep[grp] if "wall" in stages.get(s, {})]
        total_wall = sum(stages[s]["wall"] for s in sids)
        print(f"\n== {grp}: {len(sids)} stages, "
              f"sum stage wall {total_wall:.2f}s ==")
        for s in sorted(sids, key=lambda x: -stages[x]["wall"]):
            st = stages[s]
            print(
                f"  stage {s:>4}  wall {st['wall']:6.2f}s  "
                f"task {st.get('task_ms', 0) / 1000.0:7.2f}s  "
                f"tasks {st.get('tasks', 0):>3}  "
                f"shufW {st.get('shuffle_write', 0) / 1e6:8.2f}MB  "
                f"{' | '.join(st.get('scopes', [])[:6])[:110]}"
            )
    print(f"\nevent log: {log}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
