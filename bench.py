"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
"prev_commit_control": {...}}``

The ``prev_commit_control`` block re-runs the PREVIOUS round's commit
(hash in ``PREV_ROUND_COMMIT`` at the repo root) back-to-back in the
same session via a temporary git worktree, so every cross-round delta
is host-load-adjusted by construction: if HEAD and the control move
together, the drift is ambient; if they diverge, it is structural.
(Three consecutive verdicts burned on ambient-vs-structural ambiguity
before this existed.)  Control failures are reported inside the block,
never fail the bench.  Set SPARK_GRAFT_NO_CONTROL=1 to skip (the
control subprocess sets it to stop recursion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_control(repo: str, sf_dir: str) -> dict:
    """Bench the previous round's commit in a throwaway worktree."""
    marker = os.path.join(repo, "PREV_ROUND_COMMIT")
    if not os.path.exists(marker):
        return {"skipped": "no PREV_ROUND_COMMIT marker"}
    commit = open(marker).read().split()[0]
    wt = os.path.join("/tmp", f"bench_control_{commit[:12]}_{os.getpid()}")
    env = dict(os.environ, SPARK_GRAFT_NO_CONTROL="1", SPARK_GRAFT_SF_DIR=sf_dir)
    try:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo, capture_output=True, check=False,
        )
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", wt, commit],
            cwd=repo, capture_output=True, check=True, timeout=60,
        )
        out = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=wt, env=env, capture_output=True, text=True, timeout=1800,
        )
        line = next(
            (ln for ln in reversed(out.stdout.strip().splitlines())
             if ln.startswith("{")), None,
        )
        if out.returncode != 0 or line is None:
            return {
                "commit": commit,
                "error": f"rc={out.returncode}",
                "stderr_tail": out.stderr[-500:],
            }
        ctl = json.loads(line)
        return {
            "commit": commit,
            "value": ctl.get("value"),
            "queries": ctl.get("queries", {}),
        }
    except Exception as exc:  # noqa: BLE001 — the control must never fail the bench
        return {"commit": commit, "error": f"{type(exc).__name__}: {exc}"}
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo, capture_output=True, check=False,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_hdfs_spark import get_spark
    from duckdb_hdfs_spark.queries import load_all

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_queries = {n: qd for n, qd in registry.items() if qd.headline}

    # JVM + code-path + page-cache warmup (not counted): full scan of
    # every table the headline queries read, so timings measure engine
    # throughput (steady-state, what a long run amortizes to) rather
    # than first-touch disk I/O — the DuckDB baseline numbers were
    # likewise measured warm.
    # warm EVERY catalog table (catalog.TABLES), not a hand-kept list:
    # the previous hardcoded tuple omitted supplier, so headline q5's
    # first timed run paid first-touch I/O (round-7 review finding)
    from duckdb_hdfs_spark.sources.catalog import TABLES, load_table

    for tbl in TABLES:
        df = load_table(spark, sf_dir, tbl)
        df.rdd.getNumPartitions()  # JIT-warm the partition probe path
        df.write.format("noop").mode("overwrite").save()

    def run_once(qd) -> float:
        """Materialize EVERY output column via the noop sink —
        ``count()`` would let Catalyst prune the computed columns and
        time an empty projection."""
        t0 = time.perf_counter()
        df = qd.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name, qd in bench_queries.items():
        # median of 3: first run pays plan compile + codegen (the
        # median discards it); a min-of-N kept producing phantom
        # ±15% round-over-round swings from one lucky run.
        runs = sorted(run_once(qd) for _ in range(3))
        timings[name] = round(runs[1], 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    if not os.environ.get("SPARK_GRAFT_NO_CONTROL"):
        repo = os.path.dirname(os.path.abspath(__file__))
        spark.stop()  # free executor threads before the control's JVM
        result["prev_commit_control"] = _run_control(repo, sf_dir)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
