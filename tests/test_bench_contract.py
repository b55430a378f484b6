"""bench.py contract: the driver parses its stdout as ONE JSON line
with fixed keys — a stray print or schema drift breaks the round's
BENCH_r{N}.json silently, so pin the contract here (at sf0.001 so
the test is cheap; the driver runs sf0.1)."""

from __future__ import annotations

import pytest

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench() -> dict:
    """One driver-condition bench run at sf0.001/4cpu; returns the
    parsed single-line JSON payload (asserting the one-line rule)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got {lines!r}"
    return json.loads(lines[0])


@pytest.mark.slow  # spawns two full sf0.001 bench subprocesses (~2 min)
def test_bench_emits_single_json_line():
    """Driver-condition run (control NOT suppressed): stdout must
    still be ONE JSON line, now carrying the prev_commit_control
    block (the load-adjusted cross-round baseline, round-9 verdict
    task 3).  The control subprocess's own stdout is captured by
    bench.py and folded into the block — it must never leak."""
    payload = _run_bench()
    assert payload["metric"] == "headline_query_wall_time"
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert isinstance(payload["queries"], dict) and payload["queries"]
    from duckdb_hdfs_spark.queries import load_all

    headliners = {n for n, qd in load_all().items() if qd.headline}
    assert set(payload["queries"]) == headliners
    ctl = payload["prev_commit_control"]
    assert isinstance(ctl, dict)
    # a healthy control carries the previous commit's timings; a
    # broken one carries an error field — either way the bench JSON
    # stays parseable and the block says which
    assert ("queries" in ctl and ctl.get("value", 0) > 0) or (
        "error" in ctl or "skipped" in ctl
    ), ctl
    # stats_spearman_corr re-baseline sentinel (round 12, r11-verdict
    # task #5): the query's floor is committed (2.96s idle median,
    # stage profile in scripts/spearman_profile.py) and no further
    # optimization windows are spent on it — so a REGRESSION must be
    # caught mechanically.  The interleaved paired ratio (HEAD rep /
    # prev-round-commit rep, adjacent in time) cancels host load; a
    # genuine slowdown in the query's plan shows up as ratio >> 1
    # regardless of ambient noise.  1.25 = the widest ambient band
    # ever observed on this query (r11: 0.76-1.08) plus margin.
    # 1.25 was measured at sf0.1/32cpu; at THIS test's sf0.001/4cpu
    # the query is pure stage constants and the ambient band is far
    # wider — round 13 recorded 1.491 then 0.435 on back-to-back idle
    # runs of identical code (the 1.491 tripped the sentinel on a
    # zero-diff tree).  A breach therefore triggers ONE full re-run:
    # ambient blips are uncorrelated across runs, a genuine plan
    # regression reproduces.
    spearman_ratio = ctl.get("paired_ratio", {}).get("stats_spearman_corr")
    if spearman_ratio is not None and spearman_ratio > 1.25:
        retry = (
            _run_bench()
            .get("prev_commit_control", {})
            .get("paired_ratio", {})
            .get("stats_spearman_corr")
        )
        # the retry must PROVE the blip ambient: a missing control
        # ratio on the re-run is a loud failure, never a silent pass
        # (round-13 advisor: a None retry let a regression slip when
        # the second run's control block happened to be absent)
        assert retry is not None, (
            f"sentinel breach ({spearman_ratio}) and the retry run's "
            "control block carried no stats_spearman_corr paired ratio "
            "— cannot adjudicate; fix the control arm first"
        )
        assert retry <= 1.25, (
            f"stats_spearman_corr paired ratio breached the 1.25 re-baseline "
            f"sentinel TWICE ({spearman_ratio}, then {retry} on the retry) — "
            "the query regressed vs the previous round's commit "
            "(see README re-baseline paragraph)"
        )


def test_control_contains_bogus_commit_failure(tmp_path):
    """The interleaved prev-commit control must NEVER fail the bench:
    a marker pointing at a commit git cannot materialize (a rebased or
    garbage hash) yields an error-bearing block, run() returns None
    for every query, and finish() still produces the block."""
    import importlib.util as ilu
    import os
    import subprocess

    spec = ilu.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    m = ilu.module_from_spec(spec)
    spec.loader.exec_module(m)

    fake_repo = str(tmp_path / "repo")
    subprocess.run(["git", "init", "-q", fake_repo], check=True)
    (tmp_path / "repo" / "PREV_ROUND_COMMIT").write_text("deadbeef00 bogus\n")

    c = m._Control(fake_repo, "/root/testdata/sf0.001")
    assert not c.alive
    assert "error" in c.block and c.block["commit"] == "deadbeef00"
    assert c.run("q1_pricing_summary") is None
    block = c.finish({}, {})
    assert block["commit"] == "deadbeef00" and "error" in block
