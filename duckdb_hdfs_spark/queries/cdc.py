"""Incremental-ingest (CDC) registry entries (SURVEY.md §2.11):
MERGE/upsert semantics and SCD type-2 history building.

A 100 TB corpus is never rebuilt from scratch — it is maintained by
applying change batches to a snapshot (the reference serves exactly
this pattern: DuckDB queries over an HDFS directory that ingest jobs
keep appending to).  These operators express the two canonical
incremental shapes as pure DataFrame plans:

- ``cdc_merge_orders``: MERGE INTO (upsert) without a join — union
  the snapshot and the change batch with a priority tag and keep the
  max-priority row per key via ``max_by`` (ONE hash-aggregate
  shuffle, map-side partial agg; a join-based MERGE shuffles both
  sides AND re-shuffles the output).  When the batch is small
  relative to the snapshot — the common nightly-CDC case — swap the
  aggregate for a broadcast anti-join union; the union+max_by form
  is the safe default when batch size is unbounded.
- ``cdc_scd2_priority_history``: slowly-changing-dimension type 2 —
  collapse each key's attribute timeline into validity intervals
  (gaps-and-islands: lag-change flag → running version sum → group).
  Two window passes over the SAME (key, time) sort order, so Spark
  performs one shuffle+sort and reuses it for both windows.

Round 4 rotated these keys into the driver's 50-entry window;
the sf0.001/sf0.01 pytest sweep covers them every round regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _dsum, _osum, _t


# --------------------------------------------------------------------------
@query(
    "cdc_merge_orders",
    headline=True,
    oracle=f"""
WITH snap AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS pri
    FROM orders WHERE o_orderkey % 3 <> 0
), batch AS (
    SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice,
           1 AS pri
    FROM orders WHERE o_orderkey % 5 = 0
), merged AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY pri DESC) AS rn
    FROM (SELECT * FROM snap UNION ALL SELECT * FROM batch)
)
SELECT CASE WHEN pri = 1 AND o_orderkey % 3 <> 0 THEN 'update'
            WHEN pri = 1 THEN 'insert'
            ELSE 'keep' END AS action,
       count(*) AS n_rows,
       {_osum('o_totalprice')} AS total_price
FROM merged WHERE rn = 1
GROUP BY action
""",
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert): apply a simulated CDC batch (every 5th
    order re-priced +10.0, status 'U') onto a snapshot (orders not
    divisible by 3).  Batch rows replace snapshot rows on key
    conflict; unmatched batch keys insert.  Audited per action
    (keep / update / insert) with row counts and decimal-summed
    totals.

    Spark-first MERGE: union + ``max_by(struct, priority)`` — a
    single hash-aggregate shuffle on the merge key with map-side
    partial aggregation, instead of the join + re-shuffle a naive
    MERGE compiles to.  At 100 TB the aggregate partitions by key
    hash, so AQE splits any hot key; no sort is required (contrast
    the oracle's row_number formulation, which sorts)."""
    ods = _t(spark, sf_dir, "orders")
    snap = ods.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(0).alias("pri")
    )
    batch = ods.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        F.lit(1).alias("pri"),
    )
    merged = (
        snap.unionByName(batch)
        .groupBy("o_orderkey")
        .agg(
            F.max_by(
                F.struct("o_orderstatus", "o_totalprice", "pri"), F.col("pri")
            ).alias("r")
        )
        .select("o_orderkey", "r.*")
    )
    action = (
        F.when((F.col("pri") == 1) & (F.col("o_orderkey") % 3 != 0), "update")
        .when(F.col("pri") == 1, "insert")
        .otherwise("keep")
    )
    return merged.groupBy(action.alias("action")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dsum(F.col("o_totalprice")).alias("total_price"),
    )


# --------------------------------------------------------------------------
@query(
    "cdc_scd2_priority_history",
    oracle="""
WITH seq AS (
    SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
           CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                THEN 1 ELSE 0 END AS chg
    FROM orders WHERE o_custkey % 53 = 1
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), ver AS (
    SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS version
    FROM seq
)
SELECT o_custkey, CAST(version AS BIGINT) AS version, o_orderpriority,
       min(o_orderdate) AS valid_from, max(o_orderdate) AS valid_to,
       count(*) AS n_orders
FROM ver
GROUP BY o_custkey, version, o_orderpriority
""",
)
def cdc_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build: collapse each customer's order-
    priority timeline into validity intervals.  Gaps-and-islands:
    a lag-based change flag, a running sum over the same (date, key)
    order to number versions, then one group-by per (customer,
    version) emitting [valid_from, valid_to] and the run length.

    Scale: both windows share one (o_custkey) partitioning and one
    (o_orderdate, o_orderkey) sort, so Spark plans a single
    shuffle+sort and pipelines the two WindowExecs; the final
    aggregate partial-aggregates map-side.  Per-customer history
    fits a partition at any corpus size (keys partition hash-wise)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 53 == 1)
        .withColumn(
            "chg",
            F.when(
                ~F.lag("o_orderpriority")
                .over(w)
                .eqNullSafe(F.col("o_orderpriority")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "version",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return seq.groupBy("o_custkey", "version", "o_orderpriority").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.max("o_orderdate").alias("valid_to"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
@query(
    "cdc_merge_with_deletes",
    oracle=f"""
WITH snap AS (
    SELECT o_orderkey, o_totalprice, 0 AS pri, 'K' AS op
    FROM orders WHERE o_orderkey % 3 <> 0
), batch AS (
    SELECT o_orderkey,
           o_totalprice + 10.0 AS o_totalprice,
           1 AS pri,
           CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
    FROM orders WHERE o_orderkey % 5 = 0
), merged AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY pri DESC) AS rn
    FROM (SELECT * FROM snap UNION ALL SELECT * FROM batch)
)
SELECT op AS action, count(*) AS n_rows,
       {_osum("CASE WHEN op = 'D' THEN 0.0 ELSE o_totalprice END")}
           AS total_price
FROM merged WHERE rn = 1
GROUP BY op
""",
)
def cdc_merge_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with DELETE semantics — the full CDC op-code triple
    (keep / upsert / delete): batch rows tagged D tombstone their key
    out of the result; U rows replace; unmatched snapshot rows keep.
    The audit reports surviving rows per action plus the tombstone
    count (deletes contribute no price mass).

    Same scale shape as cdc_merge_orders: union + max_by on the merge
    key — ONE hash-aggregate shuffle with map-side partials, no join;
    the action rollup is a single aggregate over the merged keys with
    a CASE'd price (tombstones contribute zero), so deletes add no
    extra pass."""
    ods = _t(spark, sf_dir, "orders")
    snap = ods.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        "o_totalprice",
        F.lit(0).alias("pri"),
        F.lit("K").alias("op"),
    )
    batch = ods.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        F.lit(1).alias("pri"),
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    merged = (
        snap.unionByName(batch)
        .groupBy("o_orderkey")
        .agg(
            F.max_by(
                F.struct("o_totalprice", "pri", "op"), F.col("pri")
            ).alias("r")
        )
        .select("o_orderkey", "r.*")
    )
    return merged.groupBy(F.col("op").alias("action")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dsum(
            F.when(F.col("op") == "D", F.lit(0.0)).otherwise(
                F.col("o_totalprice")
            )
        ).alias("total_price"),
    )


# --------------------------------------------------------------------------
@query(
    "cdc_snapshot_at",
    oracle=f"""
WITH ref AS (
    SELECT max(o_orderdate) - INTERVAL 365 DAY AS t FROM orders
),
log AS (
    SELECT o_orderkey, o_orderdate AS eff, 'I' AS op,
           o_orderstatus AS st, o_totalprice AS price
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY, 'U',
           'U', o_totalprice + 5.0
    FROM orders WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT o_orderkey, o_orderdate + INTERVAL 60 DAY, 'D', NULL, NULL
    FROM orders WHERE o_orderkey % 7 = 0
),
state AS (
    SELECT o_orderkey, op, st, price,
           row_number() OVER (PARTITION BY o_orderkey ORDER BY eff DESC) AS rn
    FROM log, ref WHERE eff <= t
)
SELECT st AS status, count(*) AS n_orders, {{osum}} AS total_price
FROM state WHERE rn = 1 AND op <> 'D'
GROUP BY st
""".format(osum=_osum("price")),
)
def cdc_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot reconstruction (round 5): rebuild table
    state AS OF a past timestamp from a CDC log — the read side of
    incremental ingest (audits, reproducible training snapshots,
    "what did the corpus look like when run X trained?").  The log is
    simulated from orders: an insert at o_orderdate, a re-price
    UPDATE +30 days for every 4th key, a DELETE tombstone +60 days
    for every 7th; the snapshot time is one year before the newest
    order (a broadcast 1-row aggregate, in-plan).

    Reconstruction is the repo's join-free CDC shape: filter the log
    to eff <= T, keep each key's latest op via ``max_by(struct,
    eff)`` (ONE hash-aggregate shuffle, map-side partials), survivors
    are keys whose last op is not a delete.  Effective timestamps are
    distinct per key by construction, so last-writer-wins is
    deterministic on both engines."""
    ods = _t(spark, sf_dir, "orders")
    ref = ods.agg(F.expr("max(o_orderdate) - INTERVAL 365 DAY").alias("t"))
    # ONE scan builds every log version: per order, an array of up to
    # 3 op structs (insert always; update / tombstone per key class),
    # null-filtered and exploded — a 3-leg union would scan orders 3x
    entry = lambda eff, op, st, price: F.struct(  # noqa: E731
        eff.alias("eff"), op.alias("op"), st.alias("st"), price.alias("price")
    )
    versions = F.filter(
        F.array(
            entry(
                F.col("o_orderdate"),
                F.lit("I"),
                F.col("o_orderstatus"),
                F.col("o_totalprice"),
            ),
            F.when(
                F.col("o_orderkey") % 4 == 0,
                entry(
                    F.expr("o_orderdate + INTERVAL 30 DAY"),
                    F.lit("U"),
                    F.lit("U"),
                    F.col("o_totalprice") + F.lit(5.0),
                ),
            ),
            F.when(
                F.col("o_orderkey") % 7 == 0,
                entry(
                    F.expr("o_orderdate + INTERVAL 60 DAY"),
                    F.lit("D"),
                    F.lit(None).cast("string"),
                    F.lit(None).cast("double"),
                ),
            ),
        ),
        lambda c: c.isNotNull(),
    )
    last = (
        ods.select("o_orderkey", F.explode(versions).alias("v"))
        .select("o_orderkey", "v.*")
        .join(F.broadcast(ref))
        .filter(F.col("eff") <= F.col("t"))
        .groupBy("o_orderkey")
        .agg(F.max_by(F.struct("op", "st", "price"), F.col("eff")).alias("r"))
        .select("o_orderkey", "r.*")
    )
    return (
        last.filter(F.col("op") != "D")
        .groupBy(F.col("st").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("price")).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "cdc_incremental_agg",
    # the oracle recomputes the aggregate from the fully merged state
    # — the incremental path must land on EXACTLY that (decimal
    # arithmetic is associative, so base + delta == recompute).
    oracle=f"""
WITH snap AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS pri
    FROM orders WHERE o_orderkey % 3 <> 0
), batch AS (
    SELECT o_orderkey, 'U' AS o_orderstatus,
           o_totalprice + 10.0 AS o_totalprice, 1 AS pri
    FROM orders WHERE o_orderkey % 5 = 0
), merged AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY pri DESC) AS rn
    FROM (SELECT * FROM snap UNION ALL SELECT * FROM batch)
)
SELECT o_orderstatus AS status, count(*) AS n_orders,
       {{osum}} AS total_price
FROM merged WHERE rn = 1
GROUP BY status
""".format(osum=_osum("o_totalprice")),
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (round 5): keep a per-status
    rollup current under a CDC batch WITHOUT rescanning the snapshot
    — the materialized-view-maintenance pattern that turns a 100 TB
    nightly recompute into work proportional to the BATCH.  The
    change feed carries before/after images (as real CDC feeds do),
    so the delta is derived purely from the batch: every change adds
    its after-image under the new status and, when it replaces an
    existing key, subtracts the before-image from the old status.

    Scale shape: the base aggregate is the stored rollup (derived
    here from one snapshot scan, since there is no persisted state
    between driver runs); the delta is one scan of the BATCH with a
    per-row 1-or-2 element explode, partial-aggregated to the tiny
    (status) grain; the merge is a broadcast-size outer join of two
    status-grain frames.  All sums accumulate in DECIMAL — exact and
    associative, so base + delta lands bit-identically on the full
    recompute the oracle performs."""
    # replayed rows (at-least-once delivery) are deduped AT THE KEY
    # GRAIN before the incremental math (duplicated-rows audit, round
    # 10): the incremental delta assumes each key appears once per
    # batch — a replayed change would double-add its after-image and
    # double-subtract its before-image.  The pick is DETERMINISTIC
    # (round-11 advice — dropDuplicates chose an arbitrary row,
    # output-invariant only under exact full-row twins): max_by over
    # a struct of EVERY payload column — a genuine total order over
    # the full row (round-12 advice: a partial struct left twins
    # equal on the ordered columns but differing elsewhere to
    # max_by's nondeterministic tie-break), so twins differing in ANY
    # non-key column (a real CDC feed without a version column)
    # resolve identically on every run and engine.
    # A groupBy max_by, not a per-key window: map-side partial
    # aggregation collapses replays before the shuffle, and state is
    # one struct per key — the same 100 TB shape as dropDuplicates.
    raw = _t(spark, sf_dir, "orders")
    payload = [c for c in raw.columns if c != "o_orderkey"]
    ods = raw.groupBy("o_orderkey").agg(
        F.max_by(
            F.struct(*payload),
            F.struct(*[F.col(c) for c in payload]),
        ).alias("_p")
    ).select("o_orderkey", *[F.col(f"_p.{c}").alias(c) for c in payload])
    snap = ods.filter(F.col("o_orderkey") % 3 != 0)
    base = snap.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s"),
    )
    batch = ods.filter(F.col("o_orderkey") % 5 == 0)
    # after-image always adds; before-image subtracts iff the key
    # exists in the snapshot (o_orderkey % 3 != 0)
    changes = F.filter(
        F.array(
            F.struct(
                F.lit("U").alias("status"),
                F.lit(1).cast("bigint").alias("dn"),
                (F.col("o_totalprice") + F.lit(10.0))
                .cast("decimal(18,6)")
                .alias("ds"),
            ),
            F.when(
                F.col("o_orderkey") % 3 != 0,
                F.struct(
                    F.col("o_orderstatus").alias("status"),
                    F.lit(-1).cast("bigint").alias("dn"),
                    (-F.col("o_totalprice")).cast("decimal(18,6)").alias("ds"),
                ),
            ),
        ),
        lambda c: c.isNotNull(),
    )
    delta = (
        batch.select(F.explode(changes).alias("c"))
        .groupBy(F.col("c.status").alias("status"))
        .agg(F.sum("c.dn").alias("dn"), F.sum("c.ds").alias("ds"))
    )
    merged = base.join(delta, "status", "full_outer").select(
        "status",
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .cast("bigint")
        .alias("n_orders"),
        # NULL iff BOTH sides are NULL — exactly SQL sum-of-union
        # semantics (all-NULL audit, round 10): a status whose every
        # contribution is NULL recomputes to NULL, while a join miss
        # against a real sum still coalesces to that sum
        F.round(
            F.when(
                F.col("s").isNull() & F.col("ds").isNull(),
                F.lit(None).cast("decimal(18,6)"),
            ).otherwise(
                F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,6)"))
                + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,6)"))
            ),
            2,
        )
        .cast("double")
        .alias("total_price"),
    )
    return merged.filter(F.col("n_orders") > 0)


# --------------------------------------------------------------------------
@query(
    "cdc_reordered_apply",
    oracle=f"""
WITH log AS (
    SELECT o_orderkey, o_totalprice AS price, 0 AS v, 'I' AS op
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_totalprice + 10.0, 1, 'U'
    FROM orders WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice + 20.0, 2, 'U'
    FROM orders WHERE o_orderkey % 8 = 0
    UNION ALL
    SELECT o_orderkey, NULL, 3, 'D'
    FROM orders WHERE o_orderkey % 7 = 0
),
lww AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY v DESC) AS rn
    FROM log
)
SELECT op AS action, count(*) AS n_rows,
       {{price_sum}} AS total_price
FROM lww WHERE rn = 1
GROUP BY op
""".replace("{price_sum}", _osum("CASE WHEN op = 'D' THEN 0.0 ELSE price END")),
)
def cdc_reordered_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDER CDC apply: a 4-version change log (insert →
    update → update → delete) merged in the SHUFFLED order
    [v3, v1, v0, v2] through the same version-guarded union + max_by
    fold the in-order pipelines use — the final state must equal
    last-writer-wins regardless of arrival order, which is the
    commutativity property that lets a production apply tolerate
    replayed, delayed, or parallel-partition batches without
    coordination (an apply that depends on arrival order corrupts
    state on the first replay).

    Scale shape: each fold step is ONE hash-aggregate shuffle on the
    key (join-free merge), checkpointed so the 4-step fold keeps
    constant lineage depth; the version column, not wall-clock
    arrival, is the total order."""
    orders = _t(spark, sf_dir, "orders")
    batches = [
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.lit(0).alias("v"),
            F.lit("I").alias("op"),
        ),
        orders.filter(F.col("o_orderkey") % 4 == 0).select(
            "o_orderkey",
            (F.col("o_totalprice") + 10.0).alias("price"),
            F.lit(1).alias("v"),
            F.lit("U").alias("op"),
        ),
        orders.filter(F.col("o_orderkey") % 8 == 0).select(
            "o_orderkey",
            (F.col("o_totalprice") + 20.0).alias("price"),
            F.lit(2).alias("v"),
            F.lit("U").alias("op"),
        ),
        orders.filter(F.col("o_orderkey") % 7 == 0).select(
            "o_orderkey",
            F.lit(None).cast("double").alias("price"),
            F.lit(3).alias("v"),
            F.lit("D").alias("op"),
        ),
    ]
    state = None
    for b in (batches[3], batches[1], batches[0], batches[2]):
        merged = b if state is None else state.unionByName(b)
        state = (
            merged.groupBy("o_orderkey")
            .agg(
                F.max_by(
                    F.struct("price", "v", "op"), F.col("v")
                ).alias("r")
            )
            .select("o_orderkey", "r.price", "r.v", "r.op")
            .localCheckpoint(eager=True)
        )
    return state.groupBy(F.col("op").alias("action")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dsum(
            F.when(F.col("op") == "D", 0.0).otherwise(F.col("price"))
        ).alias("total_price"),
    )
