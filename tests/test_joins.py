"""asof operator unit tests (the asof_* registry queries pin full
semantics against DuckDB ASOF JOIN; these cover the operator-level
contracts added by the round-7 review)."""

from __future__ import annotations

import pytest

from duckdb_hdfs_spark.operators.joins import asof_backward, asof_forward


def test_asof_payload_collision_raises(spark):
    """Payload columns sharing a name with a left column must raise
    ValueError at the call site instead of emitting duplicate output
    columns that fail with AMBIGUOUS_REFERENCE downstream."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 5, 99)], "k int, ts2 int, ts int")
    for fn in (asof_backward, asof_forward):
        with pytest.raises(ValueError, match="collide"):
            fn(left, right, on="k", left_ts="ts", right_ts="ts2",
               payload=["ts"])


def test_asof_directions_shared_body(spark):
    """Smoke the shared _asof body in both directions: backward picks
    the latest earlier right row, forward the earliest later one;
    inner drops unmatched, left keeps them with NULL payload."""
    left = spark.createDataFrame(
        [(1, 10), (1, 2), (2, 7)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 3, "a"), (1, 9, "b"), (1, 11, "c")], "k int, rts int, v string"
    )
    back = {
        (r.k, r.ts): r.v
        for r in asof_backward(
            left, right, on="k", left_ts="ts", right_ts="rts", payload=["v"]
        ).collect()
    }
    assert back == {(1, 10): "b"}  # ts=2 has no earlier row; k=2 unmatched
    fwd = {
        (r.k, r.ts): r.v
        for r in asof_forward(
            left, right, on="k", left_ts="ts", right_ts="rts", payload=["v"]
        ).collect()
    }
    assert fwd == {(1, 10): "c", (1, 2): "a"}
    left_how = asof_backward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload=["v"], how="left",
    )
    assert left_how.count() == 3
    nulls = left_how.filter("v IS NULL").count()
    assert nulls == 2  # (1,2) and (2,7)


def test_asof_null_keys_follow_sql_semantics(spark):
    """NULL join keys never match (DuckDB ASOF JOIN equality): a
    NULL-key left row is dropped under inner and kept with NULL
    payload under left; a NULL-key right row matches nothing
    (round-7 review — the union-sort window previously partitioned
    the NULLs together and matched them)."""
    left = spark.createDataFrame(
        [(1, 10), (None, 10)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (None, 5, "x")], "k int, rts int, v string"
    )
    inner = asof_backward(
        left, right, on="k", left_ts="ts", right_ts="rts", payload=["v"]
    ).collect()
    assert [(r.k, r.v) for r in inner] == [(1, "a")]
    left_how = asof_backward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload=["v"], how="left",
    )
    got = {r.k: r.v for r in left_how.collect()}
    assert got == {1: "a", None: None}


def test_asof_null_timestamps_never_match(spark):
    """NULL timestamps never satisfy ts >= / <= comparisons (round-7
    advisor): a NULL-right_ts row's payload must not be carried to
    any left row, and a NULL-left_ts row must find no match in
    EITHER direction — in particular under forward's desc sort,
    where Spark's default NULLS LAST would have placed it after all
    right rows and handed it a bogus payload."""
    left = spark.createDataFrame(
        [(1, 10), (1, None)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, None, "ghost")], "k int, rts int, v string"
    )
    back = asof_backward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload=["v"], how="left",
    )
    got = {r.ts: r.v for r in back.collect()}
    assert got == {10: "a", None: None}
    fwd = asof_forward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        payload=["v"], how="left",
    )
    got_f = {r.ts: r.v for r in fwd.collect()}
    # ts=10 has no later right row (rts=5 < 10; NULL never matches)
    assert got_f == {10: None, None: None}
