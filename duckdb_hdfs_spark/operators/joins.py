"""Join operators Spark lacks natively (SURVEY.md §2.9): as-of
(backward/forward) join — the time-series primitive DuckDB exposes as
``ASOF JOIN`` and the reference therefore serves over HDFS data.

Scale design: the classic formulations (join on key + inequality,
then keep the max) explode to |left| x |right-per-key| intermediate
rows.  The union-sort formulation here shuffles each input row ONCE:
tag both sides, union, window-sort per key by (ts, side), and carry
the last right-side payload forward with ``last(..., ignorenulls)``.
Cost is one shuffle + per-key sort — the same as any windowed
aggregate — regardless of how many right rows precede each left row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str,
    forward: bool,
) -> DataFrame:
    """Shared body of :func:`asof_backward` / :func:`asof_forward`
    (round-7 review: the two were ~55-line verbatim copies differing
    only in the ``__ts`` sort direction).  ``forward=True`` sorts
    time DESCENDING so the carried payload is the nearest LATER right
    row; in both directions right sorts before left at equal ts,
    giving the inclusive (<= / >=) match semantics."""
    clash = set(payload) & set(left.columns)
    if clash:
        # the output projects left columns AND payload columns by
        # name; a collision would emit duplicate column names that
        # blow up with AMBIGUOUS_REFERENCE far from this call site
        # (round-7 review finding)
        raise ValueError(
            f"payload columns collide with left columns: {sorted(clash)}; "
            "alias the right-side payload before the asof join"
        )
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # SQL join equality rejects NULL keys: a NULL-key right row can
    # never match anything (DuckDB ASOF JOIN ON l.k = r.k), but the
    # union-sort window PARTITIONS NULL keys together and would match
    # them — drop NULL-key right rows so NULL-key left rows find no
    # payload (dropped under 'inner', NULL payload under 'left'),
    # exactly the SQL semantics (round-7 review finding).  Same for
    # NULL right_ts: ``l.ts >= NULL`` is never true, but under asc
    # NULLS FIRST a NULL-__ts right row would sort ahead of every
    # left row and its payload would be carried as a bogus 'match'
    # (round-7 advisor finding).
    rt = (
        right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    rt = rt.withColumn(
        "__payload",
        F.struct(F.lit(True).alias("__m"), *[F.col(c) for c in payload]),
    )

    left_cols = list(left.columns)
    payload_t = rt.schema["__payload"].dataType
    left_sel = lt.select(
        *left_cols, "__side", "__ts", F.lit(None).cast(payload_t).alias("__payload")
    )
    right_sel = rt.select(
        F.col(on),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c != on
        ],
        "__side",
        "__ts",
        "__payload",
    )
    unioned = left_sel.unionByName(right_sel)
    # right rows sort before left rows at equal ts => inclusive match.
    # NULL-left_ts rows must sort FIRST in both directions: ``NULL >=
    # r.ts`` / ``NULL <= r.ts`` never match, and Spark's desc default
    # (NULLS LAST) would otherwise place them after every right row,
    # carrying a bogus payload (same class as the right_ts advisor
    # finding above; right-side NULL __ts is already filtered out).
    ts_order = (
        F.col("__ts").desc_nulls_first() if forward else F.col("__ts").asc_nulls_first()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    rows = carried.filter(F.col("__side") == 1)
    if how == "inner":
        rows = rows.filter(F.col("__match.__m"))
    return rows.select(
        *left_cols, *[F.col(f"__match.{c}").alias(c) for c in payload]
    )


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` key
    (DuckDB: ``l ASOF JOIN r ON l.on = r.on AND l.ts >= r.ts``).

    Right-side ties on (on, right_ts) must be resolved by the caller
    (e.g. keep max id per key+ts) — like DuckDB's ASOF, this picks an
    arbitrary row otherwise.  ``how='inner'`` drops left rows with no
    prior right row; ``'left'`` keeps them with null payload.  Match
    detection rides an explicit ``lit(true)`` marker field inside the
    payload struct — never a payload column, whose value may be
    legitimately NULL on a matched row.  Payload names must not
    collide with left column names (raises ValueError).
    """
    return _asof(left, right, on, left_ts, right_ts, payload, how, forward=False)


def asof_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    SMALLEST ``right_ts >= left_ts`` within the same ``on`` key
    (DuckDB: ``l ASOF JOIN r ON l.on = r.on AND l.ts <= r.ts``) — the
    forward/next-event direction of :func:`asof_backward`; identical
    union-sort shape via the shared :func:`_asof` body, differing
    only in the DESCENDING time order."""
    return _asof(left, right, on, left_ts, right_ts, payload, how, forward=True)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower: Column,
    upper: Column,
    right_ts: str,
    aggs: list[Column],
    group: list[str],
) -> DataFrame:
    """Interval join + aggregate: right rows with ``lower < right_ts
    <= upper`` per left row, grouped to ``group``.  Plans as a
    sort-merge equi-join on ``on`` with the range as a join residual —
    per-key bounded, never cartesian."""
    joined = left.join(
        right,
        (left[on] == right[on])
        & (right[right_ts] > lower)
        & (right[right_ts] <= upper),
    )
    return joined.groupBy(*[left[g] for g in group]).agg(*aggs)
