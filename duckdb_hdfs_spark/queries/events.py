"""Events / time-series analytics (SURVEY.md §2.4): tumbling
windows, gap sessionization, funnels, retention, JSON props — the
batch faces of the streaming pipelines in
:mod:`duckdb_hdfs_spark.streaming`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _dsum, _t

SESSION_GAP_MIN = 30

#: THE gap-sessionization contract, oracle side: lag → new-session
#: flag → running sum, yielding one ``session_no`` per (user, 30-min
#: inactivity island).  Shared by every query whose oracle defines
#: "session" (ev_sessionize, ev_session_paths, and the streaming
#: sessionizers' batch twins) so they can never drift apart
#: (round-7 review: three verbatim copies).  Carries event_type /
#: event_id through; consumers that don't need them let the engine
#: prune.
def sess_ctes(src: str = "events") -> str:
    """Render :data:`SESS_CTES` over a caller-chosen source relation
    (round 12: the clamped-ingest streaming oracles sessionize
    ``clamped_events`` instead of the raw table)."""
    return f"""flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     > {SESSION_GAP_MIN} * 60 * 1000000
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_sess
    FROM {src}
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_type, ts, event_id,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_no
    FROM flagged
)"""


SESS_CTES = sess_ctes()


def sessionized(ev: DataFrame) -> DataFrame:
    """Spark side of :data:`SESS_CTES`: append ``session_no`` via
    lag → flag → cumulative sum — ONE shuffle on user_id, partitioned
    windows only, linear at any scale.  The streaming twin uses
    ``F.session_window`` with a watermark (see streaming/)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return flagged.withColumn(
        "session_no", F.sum("new_sess").over(cum)
    ).drop("new_sess")


#: per-user event-type entropy contract, oracle side: H = ln n −
#: (Σ c·ln c)/n with per-type ln(c) rounded to 6 decimals and the
#: weighted sum in DECIMAL (the repo's log-sum discipline — exact,
#: order-independent).  Shared by ev_user_entropy and
#: ev_bot_score_panel (round-7 review: two verbatim copies).
ENTROPY_CTES = """tc AS (
    SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
),
ent AS (
    SELECT user_id,
           CAST(sum(c) AS BIGINT) AS n_events,
           count(*) AS n_types,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - CAST(sum(
                       CAST(c AS DECIMAL(20, 8))
                       * CAST(round(ln(CAST(c AS DOUBLE)), 6)
                              AS DECIMAL(20, 8))
                   ) AS DOUBLE) / sum(c), 4) AS entropy
    FROM tc GROUP BY user_id
)"""

#: per-user inter-event gap contract, oracle side (NULL first-row
#: gaps retained — consumers filter).  Shared by ev_inter_event_times
#: and ev_bot_score_panel's cadence signal.
GAPS_CTE = """gaps AS (
    SELECT user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id))
               AS gap_us
    FROM events
)"""


def user_type_entropy(ev: DataFrame) -> DataFrame:
    """Spark side of :data:`ENTROPY_CTES`: (user_id, n_events,
    n_types, entropy) via two chained partial-aggregated group-bys on
    the same user-keyed shuffle."""
    tc = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    clogc = F.col("c").cast("decimal(20,8)") * F.round(
        F.log(F.col("c").cast("double")), 6
    ).cast("decimal(20,8)")
    return tc.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(clogc).cast("double") / F.sum("c"),
            4,
        ).alias("entropy"),
    )


def user_gaps(ev: DataFrame) -> DataFrame:
    """Spark side of :data:`GAPS_CTE` with the NULL first-row gap
    already filtered: (user_id, gap_us) — one user-keyed lag window
    whose partitioning the downstream per-user aggregate reuses."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())


# --------------------------------------------------------------------------
@query(
    "ev_tumbling_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
           AS val_sum
FROM events
GROUP BY 1, 2
""",
    headline=True,
)
def ev_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation via ``F.window`` (the same
    construct the streaming pipeline uses with a watermark).  Epoch-
    aligned hourly windows == date_trunc('hour') in the oracle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("val_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "val_sum",
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_sessionize",
    oracle=f"""
WITH {SESS_CTES}
SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sess
GROUP BY user_id, session_no
""",
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) rolled up per
    session — :func:`sessionized` / :data:`SESS_CTES` is the shared
    lag → flag → running-sum contract."""
    sess = sessionized(_t(spark, sf_dir, "events"))
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "ev_funnel",
    oracle="""
WITH stage AS (
    SELECT user_id,
           min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
           min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
           min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
    FROM events GROUP BY user_id
)
SELECT count(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
       count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
           AS n_view_click,
       count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click) AS n_full_funnel
FROM stage
""",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: one conditional-min pass
    per user then one global roll-up — no self-joins."""
    ev = _t(spark, sf_dir, "events")
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    has_view = F.col("t_view").isNotNull()
    vc = has_view & (F.col("t_click") > F.col("t_view"))
    full = vc & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.when(has_view, 1)).alias("n_view"),
        F.count(F.when(vc, 1)).alias("n_view_click"),
        F.count(F.when(full, 1)).alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_retention",
    oracle="""
WITH daily AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events
)
SELECT a.d AS day, count(*) AS returned_users
FROM daily a JOIN daily b
  ON a.user_id = b.user_id AND b.d = a.d + INTERVAL 1 DAY
GROUP BY a.d
""",
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention, join-free: distinct (user, day), then
    ``lead`` per user over the ordered days — the immediate next
    active day equals d+1 exactly when the user returned.  ONE events
    scan and one shuffle on user_id (the self-join formulation the
    oracle uses would re-execute the scan+distinct per side)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    return (
        daily.withColumn("next_d", F.lead("d").over(w))
        .filter(F.col("next_d") == F.col("d") + F.expr("INTERVAL 1 DAY"))
        .groupBy(F.col("d").alias("day"))
        .agg(F.count(F.lit(1)).alias("returned_users"))
    )


# --------------------------------------------------------------------------
@query(
    "ev_top_users",
    oracle="""
SELECT event_type, user_id, total_value, rk
FROM (
    SELECT event_type, user_id,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
               AS total_value,
           row_number() OVER (PARTITION BY event_type
                ORDER BY sum(CAST(value AS DECIMAL(28,6))) DESC,
                         user_id) AS rk
    FROM events
    GROUP BY event_type, user_id
) t WHERE rk <= 3
""",
)
def ev_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type top-3 users by total value: agg (exact decimal) then
    rank on the decimal sum so ordering ties are engine-identical.

    Scale note (round 7, measured from the executed plan): the
    ``row_number() <= k`` filter triggers Spark's
    InferWindowGroupLimit rewrite — a ``WindowGroupLimit Partial``
    (bounded per-group top-k heap) runs BEFORE the event_type
    exchange, so the low-cardinality type key never funnels the full
    per-user aggregate through its window tasks; only ≤ tasks × k
    survivors shuffle.  Pinned in
    test_plan_shape.py::test_ev_top_users_window_group_limit.  (A
    hand-rolled collect_list partial top-k was tried and REJECTED:
    its per-task state is the whole group×partition array, strictly
    worse than the built-in heap.)"""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(28,6)")).alias("dec_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("dec_value"), F.asc("user_id")
    )
    return (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "event_type",
            "user_id",
            F.round("dec_value", 2).cast("double").alias("total_value"),
            "rk",
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_json_props",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       -- json_valid + TRY_CAST mirror Spark's NULL-on-malformed
       -- get_json_object / try_cast (malformed-JSON audit, round 10):
       -- DuckDB's bare json_extract_string RAISES on a truncated
       -- payload and CAST raises on a type-confused one
       min(TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS INTEGER)) AS min_k,
       max(TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS INTEGER)) AS max_k,
       CAST(sum(TRY_CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.k') END
                         AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the props column — JVM-side
    ``get_json_object`` (stays in codegen; no Python UDF)."""
    ev = _t(spark, sf_dir, "events")
    # try_cast: a type-confused payload ('{"k": "str"}') must NULL,
    # not abort the job under ANSI (malformed-JSON audit, round 10)
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(k.try_cast("int")).alias("min_k"),
        F.max(k.try_cast("int")).alias("max_k"),
        F.sum(k.try_cast("bigint")).alias("sum_k"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_value_histogram",
    oracle="""
SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin,
       count(*) AS n, round(min(value), 4) AS bin_min,
       round(max(value), 4) AS bin_max
FROM events
GROUP BY event_type, bin
""",
)
def ev_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (floor binning is
    engine-identical on doubles; one partial-aggregated shuffle)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 25.0).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("bin_min"),
        F.round(F.max("value"), 4).alias("bin_max"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_anomaly_zscore",
    oracle="""
WITH stats AS (
    SELECT event_id, user_id, event_type, value,
           avg(value) OVER w AS mu,
           stddev_samp(value) OVER w AS sd,
           count(*) OVER w AS n_type
    FROM events
    WINDOW w AS (PARTITION BY event_type)
)
SELECT event_id, user_id, event_type,
       round(value, 4) AS value,
       round((value - mu) / sd, 4) AS zscore
FROM stats
WHERE n_type >= 10 AND abs(value - mu) > 3 * sd
""",
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous events: |value - mean| > 3 sigma within the event
    type.

    Scale shape (round 7): the per-type stats come from a
    partial-aggregated groupBy broadcast-joined back onto the event
    stream — NOT the ``avg() OVER (PARTITION BY event_type)`` window
    the oracle spells, which funnels each type's full event history
    through one window task (the ~5-value type key caps parallelism
    at 5 at any cluster size).  The join shape is one map-side
    combine shuffle of 5 stat rows + a broadcast hash join; the scan
    side never re-sorts or re-shuffles."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
        F.count(F.lit(1)).alias("n_type"),
    )
    # null-SAFE equality: groupBy and the oracle's PARTITION BY both
    # put NULL-typed events in one group, so a plain (null-rejecting)
    # equi-join would silently drop them (round-7 review finding)
    st = stats.withColumnRenamed("event_type", "st_type")
    return (
        ev.join(
            F.broadcast(st),
            F.col("event_type").eqNullSafe(F.col("st_type")),
        )
        .filter(
            (F.col("n_type") >= 10)
            & (F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"))
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias("zscore"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_rolling_dau",
    oracle="""
WITH daily AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
    FROM events
),
days AS (SELECT DISTINCT d FROM daily)
SELECT a.d AS day,
       count(DISTINCT b.user_id) AS wau
FROM days a
JOIN daily b ON b.d >= a.d - INTERVAL 6 DAY AND b.d <= a.d
GROUP BY a.d
""",
)
def ev_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU): distinct (day, user)
    pairs range-joined to the day spine, then distinct-count.  The
    distinct pass shrinks the join input to users x active-days; at
    larger windows the sketch path (HLL merge over daily sketches)
    replaces the exact distinct — same query shape."""
    ev = _t(spark, sf_dir, "events")
    # checkpoint: the panel feeds BOTH the day spine and the range
    # join — without it the events scan + distinct execute twice
    # (round-7 review; the ev_stickiness shape).  The spine is tiny
    # (one row per day) — broadcast it explicitly.
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = daily.select("d").distinct().withColumnRenamed("d", "day")
    joined = daily.join(
        F.broadcast(days),
        (F.col("d") >= F.col("day") - F.expr("INTERVAL 6 DAY"))
        & (F.col("d") <= F.col("day")),
    )
    return joined.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )


# --------------------------------------------------------------------------
@query(
    "ev_cohort_retention",
    oracle="""
WITH daily AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
    FROM events
),
firsts AS (
    SELECT user_id, min(d) AS cohort FROM daily GROUP BY user_id
)
SELECT f.cohort, CAST(date_diff('day', f.cohort, d.d) AS BIGINT) AS day_offset,
       count(*) AS n_active
FROM daily d JOIN firsts f ON d.user_id = f.user_id
GROUP BY f.cohort, day_offset
""",
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day,
    activity counted per day offset.  The cohort assignment is a
    window min over the SAME distinct (user, day) pass — one events
    scan, one shuffle on user_id (the aggregate-and-join-back
    formulation the oracle uses would scan twice)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id")
    with_cohort = daily.withColumn("cohort", F.min("d").over(w))
    return (
        with_cohort.select(
            "cohort",
            F.datediff(F.col("d"), F.col("cohort")).cast("bigint").alias(
                "day_offset"
            ),
        )
        .groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --------------------------------------------------------------------------
@query(
    "ev_user_lifetime",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       count(DISTINCT CAST(ts AS DATE)) AS active_days,
       strftime(CAST(min(ts) AS DATE), '%Y-%m-%d') AS first_day,
       strftime(CAST(max(ts) AS DATE), '%Y-%m-%d') AS last_day,
       date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1
           AS lifetime_days,
       round(CAST(count(*) AS DOUBLE)
             / count(DISTINCT CAST(ts AS DATE)), 4) AS events_per_active_day
FROM events
GROUP BY user_id
""",
)
def ev_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime engagement summary: first/last active day,
    active-day count, calendar lifetime, and events per active day —
    the user-level panel behind retention and LTV reporting.

    Scale: one partial-aggregated shuffle on user_id; the distinct
    day count shuffles one (user, day) pair per active day, bounded
    by calendar days x users, not by event volume."""
    ev = _t(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(d).alias("active_days"),
        F.date_format(F.min(d), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max(d), "yyyy-MM-dd").alias("last_day"),
        (F.datediff(F.max(d), F.min(d)) + 1).cast("bigint").alias(
            "lifetime_days"
        ),
        F.round(
            F.count(F.lit(1)).cast("double") / F.count_distinct(d), 4
        ).alias("events_per_active_day"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_markov_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
),
pair_counts AS (
    SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM pair_counts
""",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix over per-user streams:
    counts and row-normalized probabilities of each (from → to) pair —
    the empirical Markov chain behind next-action prediction and
    anomalous-sequence detection.

    Scale shape: one shuffle on user_id for the lag window, one
    partial-aggregated group-by on the (from, to) pair (cardinality =
    |event types|², tiny), and the row normalization windows over the
    from_type groups of that tiny matrix.  Probabilities divide
    integer counts and round — engine-exact."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pair_counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pair_counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wf), 4).alias("p"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_inter_event_times",
    oracle=f"""
WITH {GAPS_CTE}
SELECT user_id, count(*) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       round(quantile_cont(gap_us, 0.50), 2) AS p50_gap_us,
       round(quantile_cont(gap_us, 0.90), 2) AS p90_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
)
def ev_inter_event_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event arrival statistics (count, min, exact
    p50/p90 of the gap in microseconds) — the cadence features behind
    bot detection and engagement scoring, and the input for choosing
    sessionization gaps.

    Scale shape: one shuffle on user_id shared by the lag window and
    the group-by (same key → Spark reuses the partitioning); gaps are
    integer microseconds, and the exact interpolated percentile is
    the engine-portable stats_quantiles recipe."""
    gaps = user_gaps(_t(spark, sf_dir, "events"))
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.round(F.expr("percentile(gap_us, 0.50)"), 2).alias("p50_gap_us"),
        F.round(F.expr("percentile(gap_us, 0.90)"), 2).alias("p90_gap_us"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_hourly_profile",
    oracle="""
SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS hour_utc,
       count(*) AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type), 4) AS share
FROM events
GROUP BY event_type, hour_utc
""",
)
def ev_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type (counts + share of
    the type's daily cycle) — the seasonality panel behind anomaly
    baselines and traffic-shifting decisions.  Hours are UTC (the
    pinned session timezone), so bucketing is engine-identical.

    Scale shape: one partial-aggregated group-by to a bounded
    (types × 24) matrix; the share normalization windows over that
    tiny result."""
    ev = _t(spark, sf_dir, "events")
    grp = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_utc")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return grp.select(
        "event_type",
        "hour_utc",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 4).alias(
            "share"
        ),
    )


# --------------------------------------------------------------------------
@query(
    "ev_user_decile",
    # single-window oracle is the semantic spec; the Spark side runs
    # the two-phase distributed ntile (operators/ranks.py), which is
    # allocation-identical to SQL ntile by construction.
    oracle="""
WITH agg AS (
    SELECT user_id, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 4) AS DOUBLE)
               AS sum_value
    FROM events GROUP BY user_id
)
SELECT user_id, n_events, sum_value,
       ntile(10) OVER (ORDER BY n_events DESC, user_id) AS activity_decile
FROM agg
""",
)
def ev_user_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity deciles (round 5): aggregate each user's
    event count + decimal-summed value, then rank into 10 activity
    tiers — the engagement-segmentation panel (power-user cut-offs,
    cohort weighting).

    Scale shape: the decile runs through the two-phase distributed
    ntile (operators.ranks.distributed_ntile — range buckets from
    broadcast approx-quantile bounds, per-bucket row_number,
    broadcast prefix offsets), so no task ever holds the full user
    census; the per-user aggregate is one partial-aggregated
    shuffle."""
    from duckdb_hdfs_spark.operators.ranks import distributed_ntile

    ev = _t(spark, sf_dir, "events")
    agg = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .localCheckpoint(eager=True)
    )
    return distributed_ntile(
        agg,
        [("n_events", "desc"), ("user_id", "asc")],
        "activity_decile",
        n_buckets=10,
    ).select("user_id", "n_events", "sum_value", "activity_decile")


# --------------------------------------------------------------------------
@query(
    "ev_burst_flags",
    oracle="""
WITH winct AS (
    SELECT user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
               AS w5m
    FROM events
)
SELECT user_id, count(*) AS n_events,
       max(w5m) AS peak_5min,
       max(w5m) >= 3 AS burst_flag
FROM winct GROUP BY user_id
""",
)
def ev_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst / bot detection (round 5): each user's PEAK event count
    within any trailing 5-minute window, flagged at >= 3 — the rate
    panel behind abuse throttles and scraper filters.  The RANGE
    frame runs on epoch microseconds so frame edges are integer-exact
    on both engines.

    Scale shape: one shuffle on user_id serves both the window and
    the per-user rollup (same partitioning, Spark reuses the sort);
    frame state is bounded by the 5-minute span, not user history."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, 0)
    )
    return (
        ev.withColumn("w5m", F.count(F.lit(1)).over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("w5m").alias("peak_5min"),
            (F.max("w5m") >= 3).alias("burst_flag"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_cumulative_users",
    oracle="""
WITH first_day AS (
    SELECT user_id, min(date_trunc('day', ts)) AS d0 FROM events
    GROUP BY user_id
),
daily AS (SELECT d0 AS day, count(*) AS new_users FROM first_day GROUP BY d0)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cumulative_users
FROM daily
""",
)
def ev_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user growth curve (round 5): the audience
    panel every product dashboard opens with.  A naive per-day
    COUNT(DISTINCT user WHERE ts <= day) rescans history per day; the
    linear formulation counts each user once at their FIRST-seen day
    and cumulative-sums the per-day new-user counts — first-appearance
    + prefix sum, both distributed.

    Scale shape: one shuffle for min-day per user (partial-aggregated),
    one for the per-day rollup, then the two-phase distributed cumsum
    (operators.ranks.grouped_cumsum, empty group) over the day grain —
    no global window, no per-day history rescans."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    ev = _t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("d0")
    )
    daily = first_day.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    cum = grouped_cumsum(
        daily.withColumn("__ord", F.unix_micros("day")),
        [],
        [("__ord", "asc")],
        "new_users",
        "cumulative_users",
    )
    return cum.select("day", "new_users", "cumulative_users")


# --------------------------------------------------------------------------
@query(
    "ev_anomaly_mad",
    oracle="""
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, e.event_id, e.value, m.med,
           abs(e.value - m.med) AS adev
    FROM events e JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type,
       round(d.value, 4) AS value,
       round(d.med, 6) AS type_median,
       round(m.mad, 6) AS type_mad,
       abs(d.value - d.med) > 3 * 1.4826 * m.mad AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
""",
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly flags per event type (round 5) —
    the heavy-tail-safe alternative to ev_anomaly_zscore: a single
    extreme value inflates a z-score baseline's mean/σ and masks
    itself, but barely moves the median and the median absolute
    deviation (3·1.4826·MAD ≈ 3σ under normality).

    Determinism: Spark ``percentile`` == DuckDB ``quantile_cont``
    bit-for-bit (the stats_quantiles probe), and the flag compares
    UNROUNDED values — rounding is output-only.  Scale shape: two
    per-type aggregates (exact medians; the GK sketch is the
    single-pass swap-in at extreme group sizes) broadcast back onto
    the stream — the fact table shuffles zero times."""
    ev = _t(spark, sf_dir, "events")
    # the per-type baselines are tiny (one row per type) — checkpoint
    # both so the flag pass reads materialized medians instead of
    # re-deriving their fact-table scans per consumer branch
    med = (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("med"))
        .localCheckpoint(eager=True)
    )
    # checkpoint: dev feeds both the MAD aggregate and the final flag
    # select — without it the events scan + broadcast join execute
    # twice (round-7 review)
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .withColumn("adev", F.abs(F.col("value") - F.col("med")))
        .localCheckpoint(eager=True)
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
        .localCheckpoint(eager=True)
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.round("med", 6).alias("type_median"),
        F.round("mad", 6).alias("type_mad"),
        (F.col("adev") > 3 * 1.4826 * F.col("mad")).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_stickiness",
    oracle="""
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
dau AS (
    SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS dau
    FROM events GROUP BY day
),
wau AS (
    SELECT d.day, count(DISTINCT e.user_id) AS wau
    FROM days d JOIN events e
      ON e.ts >= d.day - INTERVAL 6 DAY AND e.ts < d.day + INTERVAL 1 DAY
    GROUP BY d.day
)
SELECT d.day, dau.dau, wau.wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
FROM days d JOIN dau USING (day) JOIN wau USING (day)
""",
)
def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day (round 5): the engagement-quality
    ratio every growth dashboard tracks (1.0 = everyone active daily;
    0.14 = weekly one-timers).  WAU reuses the ev_rolling_dau range
    join — distinct users over each trailing 7-day window via a
    bounded day × events interval join, never a per-day rescan of
    history.

    Scale shape: events collapse ONCE to the distinct (user, day)
    panel, which is localCheckpoint-ed — the day spine, DAU counts,
    and the WAU interval join all derive from the materialized panel,
    so the event stream is scanned exactly once (the previous
    4-branch lineage re-scanned it per consumer).  The broadcast day
    spine joins the PANEL, not raw events: fan-out is ≤7 panel rows
    per (user, day), and the distinct aggregates partial-aggregate
    before their shuffles.  The final 3-way join runs at day grain."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = daily.select(F.col("d").alias("day")).distinct()
    dau = daily.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    wau = (
        F.broadcast(days)
        .join(
            daily,
            (F.col("d") >= F.col("day") - F.expr("INTERVAL 6 DAY"))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_anomaly_ewma",
    oracle="""
WITH daily AS (
    SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
    FROM events GROUP BY 1, 2
),
j AS (
    SELECT a.event_type, a.day, a.n, b.n AS pn,
           datediff('day', b.day, a.day) AS gap
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type
     AND datediff('day', b.day, a.day) BETWEEN 1 AND 14
)
SELECT event_type, day, n,
       count(*) AS n_prior,
       round(sum(CAST(pn AS DOUBLE) / (1::BIGINT << gap))
             / sum(1.0 / (1::BIGINT << gap)), 6) AS ewma,
       CASE WHEN n > 2.0 * (sum(CAST(pn AS DOUBLE) / (1::BIGINT << gap))
                            / sum(1.0 / (1::BIGINT << gap)))
            THEN 1 ELSE 0 END AS is_burst
FROM j GROUP BY 1, 2, 3
""",
)
def ev_anomaly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA anomaly baseline per event type: each day's count vs the
    exponentially-weighted mean of the preceding 14 days with decay
    α = 1/2 — the recency-weighted sibling of ev_anomaly_zscore
    (uniform window) and ev_anomaly_mad (robust), completing the
    anomaly-detector family.

    Determinism: the decay weight is 1/2^gap built from an integer
    shift (``shiftleft``/``<<``), NEVER libm ``pow`` — every weight is
    an exact binary double, every term n·2⁻ᵍᵃᵖ is exact (≤31
    significant bits), and the 14-term sums are exact in double, so
    numerator/denominator are order-independent and the flag
    threshold is engine-identical without rounding tricks.

    Scale shape: the daily panel is ONE partial-aggregated shuffle of
    the event stream, localCheckpoint-ed so the self-join reads the
    tiny (type × day) panel, not the stream, twice.  The join is
    equi-keyed on event_type with the 14-day band as residual —
    per-key rows are bounded by the calendar (days), not the data."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("n").alias("pn"),
    )
    gap = F.datediff(F.col("day"), F.col("b_day"))
    j = (
        daily.join(
            b,
            (F.col("event_type") == F.col("b_type")) & gap.between(1, 14),
        )
        .withColumn("gap", gap)
        .withColumn("w", F.expr("1.0d / shiftleft(1L, cast(gap AS INT))"))
    )
    ewma_raw = F.sum(F.col("pn").cast("double") * F.col("w")) / F.sum("w")
    return j.groupBy("event_type", "day", "n").agg(
        F.count(F.lit(1)).alias("n_prior"),
        F.round(ewma_raw, 6).alias("ewma"),
        F.when(F.col("n") > 2.0 * ewma_raw, 1).otherwise(0).alias("is_burst"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_session_paths",
    oracle=f"""
WITH {SESS_CTES},
ranked AS (
    SELECT user_id, session_no, event_type,
           row_number() OVER (PARTITION BY user_id, session_no
                              ORDER BY ts, event_id) AS rn
    FROM sess
),
paths AS (
    SELECT user_id, session_no,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM ranked WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
""",
)
def ev_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session-opening paths: the first ≤3 event types of every
    30-min session concatenated ('view>click>purchase'), ranked by
    session count — the path-analysis panel product teams read next
    to the funnel (which fixes the stage order; this one discovers
    it).

    Scale shape: sessionization is the ev_sessionize lag→cumsum shape
    (one user-keyed shuffle, partitioned windows only); the per-session
    path folds via sort_array over a ≤3-element collect_list (bounded
    by the rn filter BEFORE the aggregate, so state per session is 3
    structs, not the whole session); the final top-20 is
    TakeOrderedAndProject (no global sort), tie-broken on the path
    string so the cut is deterministic on both engines."""
    sess = sessionized(_t(spark, sf_dir, "events"))
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    )
    first3 = sess.withColumn("rn", rn).filter(F.col("rn") <= 3)
    paths = first3.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# --------------------------------------------------------------------------
@query(
    "ev_daily_conversion_wilson",
    oracle="""
WITH daily AS (
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchases
    FROM events GROUP BY 1
)
SELECT day, n_events, purchases,
       round(CAST(purchases AS DOUBLE) / n_events, 6) AS purchase_share,
       round((CAST(purchases AS DOUBLE) / n_events
              + (1.96 * 1.96) / (2 * CAST(n_events AS DOUBLE))
              - 1.96 * sqrt(((CAST(purchases AS DOUBLE) / n_events)
                             * (1 - CAST(purchases AS DOUBLE) / n_events)
                             + (1.96 * 1.96) / (4 * CAST(n_events AS DOUBLE)))
                            / CAST(n_events AS DOUBLE)))
             / (1 + (1.96 * 1.96) / CAST(n_events AS DOUBLE)), 6)
           AS wilson_low
FROM daily
""",
)
def ev_daily_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase share (purchases / ALL events — a true
    proportion in [0,1]) with the 95% Wilson-score lower bound — the
    statistically honest way to rank days (or experiments) when daily
    volumes differ by orders of magnitude (a 2-of-3 day shouldn't
    outrank a 400-of-1000 day).

    Determinism: the Wilson formula uses only +,−,×,÷ and one IEEE
    ``sqrt`` (correctly rounded by the standard, so engine-identical
    — the repo's libm rule bans transcendentals, not sqrt), composed
    in the SAME association order on both engines, then rounded once.

    Scale shape: one conditional-count aggregation (map-side partial)
    at day grain; the bound is a map-only expression on the tiny
    panel."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "purchases"
        ),
    )
    z2 = F.lit(1.96) * F.lit(1.96)
    nv = F.col("n_events").cast("double")
    p = F.col("purchases").cast("double") / F.col("n_events")
    wilson = (
        p
        + z2 / (2 * nv)
        - F.lit(1.96) * F.sqrt((p * (1 - p) + z2 / (4 * nv)) / nv)
    ) / (1 + z2 / nv)
    return daily.select(
        "day",
        "n_events",
        "purchases",
        F.round(p, 6).alias("purchase_share"),
        F.round(wilson, 6).alias("wilson_low"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_active_streaks",
    oracle="""
WITH daily AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
isl AS (
    SELECT user_id,
           datediff('day', DATE '1970-01-01', d)
             - row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS island
    FROM daily
),
streaks AS (
    SELECT user_id, island, count(*) AS len
    FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM streaks GROUP BY user_id
""",
)
def ev_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands classic at day grain (engagement teams ship this
    as 'your streak'; cohort analysts use it as a habit-strength
    feature).  Island id = day-number minus per-user row_number:
    constant exactly on consecutive runs.

    Scale shape: events collapse to the distinct (user, day) panel in
    one partial-aggregated pass, then every window is PARTITIONED by
    user (bounded by calendar days per user) — the same single
    user-keyed shuffle sessionization uses, reused by both the window
    and the two group-bys."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = daily.select(
        "user_id",
        (
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_funnel_windowed",
    oracle="""
WITH s1 AS (
    SELECT user_id, event_type, ts, event_id,
           max(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lv
    FROM events
),
s2 AS (
    SELECT user_id, event_type, ts, event_id, lv,
           CASE WHEN event_type = 'click' AND lv IS NOT NULL
                     AND epoch_us(ts) - epoch_us(lv) <= 3600000000
                THEN 1 ELSE 0 END AS is_qc
    FROM s1
),
s3 AS (
    SELECT user_id, event_type, ts, is_qc,
           max(CASE WHEN is_qc = 1 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS qc_ts
    FROM s2
),
per_user AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
           max(is_qc) AS has_qc,
           max(CASE WHEN event_type = 'purchase' AND qc_ts IS NOT NULL
                         AND epoch_us(ts) - epoch_us(qc_ts) <= 86400000000
                    THEN 1 ELSE 0 END) AS has_qp
    FROM s3 GROUP BY user_id
)
SELECT CAST(sum(has_view) AS BIGINT) AS n_view_users,
       CAST(sum(has_qc) AS BIGINT) AS n_click_1h_users,
       CAST(sum(has_qp) AS BIGINT) AS n_purchase_24h_users
FROM per_user
""",
)
def ev_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED funnel: view → click within 1 hour of the latest
    view → purchase within 24 hours of the latest qualifying click —
    the realistic attribution funnel (ev_funnel's unbounded ordering
    credits a purchase to a view from three weeks earlier).

    Spark-first shape: NO self-joins — the 'latest view before me'
    and 'latest qualifying click before me' lookups are running
    conditional ``max`` windows over the per-user ordered stream
    (the as-of union-sort trick applied twice in one pass), so the
    whole funnel costs ONE user-keyed shuffle; the second window
    reuses the first's partitioning and sort.  Per-user flags then
    roll up map-side."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ev = _t(spark, sf_dir, "events")
    s1 = ev.withColumn(
        "lv", F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "is_qc",
        F.when(
            (F.col("event_type") == "click")
            & F.col("lv").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("lv")
                <= 3_600_000_000
            ),
            1,
        ).otherwise(0),
    )
    s3 = s2.withColumn(
        "qc_ts", F.max(F.when(F.col("is_qc") == 1, F.col("ts"))).over(w)
    )
    per_user = s3.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("has_view"),
        F.max("is_qc").alias("has_qc"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("qc_ts").isNotNull()
                & (
                    F.unix_micros("ts") - F.unix_micros("qc_ts")
                    <= 86_400_000_000
                ),
                1,
            ).otherwise(0)
        ).alias("has_qp"),
    )
    return per_user.agg(
        F.sum("has_view").alias("n_view_users"),
        F.sum("has_qc").alias("n_click_1h_users"),
        F.sum("has_qp").alias("n_purchase_24h_users"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_new_vs_returning",
    oracle="""
WITH daily AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
first_day AS (
    SELECT user_id, min(day) AS d0 FROM daily GROUP BY user_id
)
SELECT day,
       CAST(count(*) FILTER (WHERE day = d0) AS BIGINT) AS new_users,
       CAST(count(*) FILTER (WHERE day > d0) AS BIGINT) AS returning_users,
       round(CAST(count(*) FILTER (WHERE day = d0) AS DOUBLE) / count(*), 6)
           AS new_share
FROM daily JOIN first_day USING (user_id)
GROUP BY day
""",
)
def ev_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active-user split — the growth
    dashboard's first panel (is the DAU curve acquisition or
    retention?).  A user is 'new' on their first active day, ever.

    Scale shape: events collapse to the distinct (user, day) panel;
    first-active day is a per-user MIN window over the SAME user-keyed
    shuffle partitioning (no join back to the raw stream — the oracle
    writes the join formulation, Spark reuses the panel's window),
    then one day-grain conditional rollup."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    flagged = daily.withColumn("d0", F.min("day").over(w))
    return flagged.groupBy("day").agg(
        F.count(F.when(F.col("day") == F.col("d0"), 1)).alias("new_users"),
        F.count(F.when(F.col("day") > F.col("d0"), 1)).alias(
            "returning_users"
        ),
        F.round(
            F.count(F.when(F.col("day") == F.col("d0"), 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("new_share"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_gap_filled_daily",
    oracle="""
WITH daily AS (
    SELECT date_trunc('day', ts) AS day, count(*) AS n
    FROM events GROUP BY 1
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
)
SELECT spine.day, CAST(coalesce(n, 0) AS BIGINT) AS n_events,
       CASE WHEN n IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine LEFT JOIN daily USING (day)
""",
)
def ev_gap_filled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily event counts: a generated calendar spine
    (min..max day) left-joined onto the observed daily panel so
    MISSING days appear as explicit zero rows — the prerequisite for
    any window/forecast arithmetic downstream (a moving average over
    a panel with silent holes is wrong; ev_anomaly_ewma et al. are
    only safe because this dataset happens to be dense — this
    operator makes that assumption checkable and repairable).

    Scale shape: one partial-aggregated scan to the day panel; the
    spine derives from the panel's 1-row min/max aggregate via
    ``sequence`` + explode (calendar-sized, broadcast onto the panel
    join — never a data-sized generate)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "ev_linear_attribution",
    oracle="""
WITH p AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'purchase'
),
v AS (
    SELECT user_id AS v_user, ts AS v_ts FROM events
    WHERE event_type = 'view'
),
j AS (
    SELECT p.event_id, p.value, v.v_ts,
           count(*) OVER (PARTITION BY p.event_id) AS n_views
    FROM p JOIN v
      ON p.user_id = v.v_user
     AND v.v_ts <= p.ts AND v.v_ts > p.ts - INTERVAL 7 DAY
)
SELECT date_trunc('day', v_ts) AS view_day,
       count(*) AS n_credited_views,
       CAST(sum(CAST(round(1.0 / n_views, 6) AS DECIMAL(18,6))) AS DOUBLE)
           AS credited_purchases,
       CAST(sum(CAST(round(value / n_views, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS credited_value
FROM j GROUP BY 1
""",
)
def ev_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR (equal-credit) attribution: every view in the 7 days
    before a purchase gets 1/n of the conversion and 1/n of its value
    — completing the attribution family (asof_purchase_last_view =
    last-touch, ev_first_touch_attribution = first-touch; linear is
    what growth teams reconcile the two against).  Credited mass per
    view-DAY is the output a channel-spend dashboard consumes.

    Determinism: per-view credits (1/n and value/n — IEEE divisions)
    round to 6 decimals BEFORE the day-level sum, which runs in
    DECIMAL — reducer order cannot move the total.

    Scale shape: the same user-keyed interval join the other
    attribution ops use (per-key bounded fan-out), the per-purchase
    view count is a purchase-PARTITIONED window on the join output,
    and the day rollup partial-aggregates."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    j = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("ts"))
        & (F.col("v_ts") > F.col("ts") - F.expr("INTERVAL 7 DAY")),
    )
    w = Window.partitionBy("event_id")
    jj = j.withColumn("n_views", F.count(F.lit(1)).over(w))
    credit = F.round(F.lit(1.0) / F.col("n_views"), 6).cast("decimal(18,6)")
    vcredit = F.round(F.col("value") / F.col("n_views"), 6).cast(
        "decimal(28,6)"
    )
    return jj.groupBy(F.date_trunc("day", "v_ts").alias("view_day")).agg(
        F.count(F.lit(1)).alias("n_credited_views"),
        F.sum(credit).cast("double").alias("credited_purchases"),
        F.sum(vcredit).cast("double").alias("credited_value"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_user_entropy",
    oracle=f"""
WITH {ENTROPY_CTES}
SELECT user_id, n_events, n_types, entropy FROM ent
""",
)
def ev_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy over event types — H = ln n −
    (Σ c·ln c)/n, the text_token_entropy recipe applied to the event
    stream: 0 = single-action bots, high = diverse organic usage (a
    standard bot/engagement feature next to ev_inter_event_times and
    ev_burst_flags).

    Determinism: per-type ln(c) rounds to 6 decimals, the weighted
    sum runs in DECIMAL, and the final assembly is the identical
    double expression on both engines (the repo's log-sum
    discipline).

    Scale shape: two chained partial-aggregated group-bys on the same
    user-keyed shuffle (:func:`user_type_entropy`)."""
    return user_type_entropy(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
def _first_purchase_24h(ev, v, how: str):
    """Bounded 24 h first-purchase lookup shared by the conversion
    family (ev_conversion_survival / ev_nelson_aalen /
    ev_conversion_latency_quantiles): per view row in ``v`` (whose
    columns are all kept as the group key), attach ``fp_ts`` = the
    same user's earliest purchase in [v_ts, v_ts + 24 h).  The join
    is user-keyed with a closed time bound, so fan-out is bounded
    and AQE-splittable; ``how`` picks left (censoring-aware callers)
    vs inner (converters only)."""
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") < F.col("v_ts") + F.expr("INTERVAL 24 HOUR")),
            how,
        )
        .groupBy(*v.columns)
        .agg(F.min("p_ts").alias("fp_ts"))
    )



# --------------------------------------------------------------------------
@query(
    "ev_conversion_survival",
    oracle="""
WITH mx AS (SELECT max(ts) AS m FROM events),
v AS (
    SELECT user_id, ts AS v_ts FROM events, mx
    WHERE event_type = 'view' AND ts <= m - INTERVAL 24 HOUR
),
p AS (
    SELECT user_id AS p_user, ts AS p_ts FROM events
    WHERE event_type = 'purchase'
),
firstp AS (
    SELECT v.user_id, v.v_ts, min(p.p_ts) AS fp_ts
    FROM v LEFT JOIN p
      ON v.user_id = p.p_user
     AND p.p_ts >= v.v_ts AND p.p_ts < v.v_ts + INTERVAL 24 HOUR
    GROUP BY v.user_id, v.v_ts
),
d AS (
    SELECT CASE WHEN fp_ts IS NULL THEN NULL
                ELSE epoch_us(fp_ts) - epoch_us(v_ts) END AS dt_us
    FROM firstp
)
SELECT count(*) AS n_views,
       CAST(sum(CASE WHEN dt_us <= 60000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS conv_1m,
       CAST(sum(CASE WHEN dt_us <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS conv_1h,
       CAST(sum(CASE WHEN dt_us <= 21600000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS conv_6h,
       CAST(sum(CASE WHEN dt_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS conv_24h,
       round(CAST(sum(CASE WHEN dt_us IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS conv_rate_24h
FROM d
""",
)
def ev_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion SURVIVAL curve: of all views with a
    FULL 24-hour follow-up window (views in the last day of the
    stream are right-censored and excluded — the censoring-honest
    cut), how many converted within 1 min / 1 h / 6 h / 24 h?  The
    cumulative-incidence numbers product teams fit attribution
    horizons against (the 7-day lookback in the attribution ops is a
    choice; this curve is the evidence).

    Scale shape: the first-purchase lookup is the user-keyed interval
    join (bounded fan-out) collapsed by min() per view; the horizon
    counts are conditional sums in ONE 1-row aggregate — adding a
    horizon adds an expression, not a pass."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(F.broadcast(mx))
        .filter(F.col("ts") <= F.col("m") - F.expr("INTERVAL 24 HOUR"))
        .select("user_id", F.col("ts").alias("v_ts"))
    )
    firstp = _first_purchase_24h(ev, v, "left")
    dt = F.when(
        F.col("fp_ts").isNotNull(),
        F.unix_micros("fp_ts") - F.unix_micros("v_ts"),
    )
    d = firstp.select(dt.alias("dt_us"))
    return d.agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(F.when(F.col("dt_us") <= 60_000_000, 1).otherwise(0))
        .cast("long")
        .alias("conv_1m"),
        F.sum(F.when(F.col("dt_us") <= 3_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("conv_1h"),
        F.sum(F.when(F.col("dt_us") <= 21_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("conv_6h"),
        F.sum(F.when(F.col("dt_us").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("conv_24h"),
        F.round(
            F.sum(F.when(F.col("dt_us").isNotNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("conv_rate_24h"),
    )


# --------------------------------------------------------------------------
@query(
    "ev_bot_score_panel",
    oracle=f"""
WITH {ENTROPY_CTES},
{GAPS_CTE},
cadence AS (
    SELECT user_id, CAST(min(gap_us) AS BIGINT) AS min_gap_us
    FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
)
SELECT ent.user_id, n_events, entropy,
       coalesce(min_gap_us, -1) AS min_gap_us,
       CASE WHEN n_events >= 20 AND entropy < 0.6 THEN 1 ELSE 0 END
           + CASE WHEN coalesce(min_gap_us, -1) BETWEEN 0 AND 1000000
                  THEN 1 ELSE 0 END AS bot_score,
       (CASE WHEN n_events >= 20 AND entropy < 0.6 THEN 1 ELSE 0 END
        + CASE WHEN coalesce(min_gap_us, -1) BETWEEN 0 AND 1000000
               THEN 1 ELSE 0 END) >= 2 AS is_bot
FROM ent LEFT JOIN cadence ON ent.user_id = cadence.user_id
""",
)
def ev_bot_score_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite BOT-SCORE panel: the behavioral family's capstone —
    low type-entropy at volume (single-action automation) and a
    sub-second minimum inter-event gap each add a point; two points
    flags the user (the pipeline_quality_filter reason-code pattern
    applied to behavior).  Each signal is individually available
    (ev_user_entropy, ev_inter_event_times, ev_burst_flags); the
    panel is what a trust-and-safety reviewer actually reads.

    Scale shape: both signals reuse ONE user-keyed shuffle family
    (type counts aggregate; lag window), joined at user grain; all
    thresholds integer/rounded-double — engine-identical.  Signals
    come from the shared builders (:func:`user_type_entropy`,
    :func:`user_gaps`) so the panel can never drift from the
    individual feature queries it composes."""
    ev = _t(spark, sf_dir, "events")
    ent = user_type_entropy(ev).drop("n_types")
    cadence = user_gaps(ev).groupBy("user_id").agg(
        F.min("gap_us").cast("bigint").alias("min_gap_us")
    )
    j = ent.join(cadence, "user_id", "left").select(
        "user_id",
        "n_events",
        "entropy",
        F.coalesce("min_gap_us", F.lit(-1)).alias("min_gap_us"),
    )
    p1 = F.when(
        (F.col("n_events") >= 20) & (F.col("entropy") < 0.6), 1
    ).otherwise(0)
    p2 = F.when(
        F.col("min_gap_us").between(0, 1_000_000), 1
    ).otherwise(0)
    return j.select(
        "user_id",
        "n_events",
        "entropy",
        "min_gap_us",
        (p1 + p2).alias("bot_score"),
        ((p1 + p2) >= 2).alias("is_bot"),
    )


# --------------------------------------------------------------------------
#: CUSUM drift allowance (k, in σ units) and alarm threshold (h):
#: the textbook σ/2 slack + 4σ decision interval (Page 1954; Montgomery
#: SPC).  Fixed literals shared by both engines.
CUSUM_K = "0.5"
CUSUM_H = "4.0"


def _cusum_oracle() -> str:
    return f"""
WITH daily AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           count(*) AS c
    FROM events GROUP BY event_type, day
),
st AS (
    SELECT event_type, count(*) AS n_days,
           sum(CAST(c AS DECIMAL(20,0))) AS sc,
           sum(CAST(c AS DECIMAL(20,0)) * c) AS sc2
    FROM daily GROUP BY event_type
),
z AS (
    SELECT d.event_type, d.day, d.c,
           -- nullif on BOTH the dof and the sqrt: a single-day or
           -- constant panel yields NULL z on both engines (no
           -- inf/NaN divergence), and window sums skip NULLs
           -- identically
           CAST(round((d.c - CAST(sc AS DOUBLE) / n_days)
                      / nullif(sqrt((CAST(sc2 AS DOUBLE)
                                     - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                                       / n_days)
                                    / nullif(n_days - 1, 0)), 0), 6)
                AS DECIMAL(20,6)) AS z
    FROM daily d JOIN st USING (event_type)
),
p AS (
    SELECT event_type, day, c, z,
           sum(z - {CUSUM_K}) OVER w AS p_pos,
           sum(-z - {CUSUM_K}) OVER w AS p_neg
    FROM z
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
    SELECT event_type, day, c, z,
           p_pos - least(CAST(0 AS DECIMAL(38,6)), min(p_pos) OVER w)
               AS s_pos,
           p_neg - least(CAST(0 AS DECIMAL(38,6)), min(p_neg) OVER w)
               AS s_neg
    FROM p
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, c AS n_events,
       CAST(z AS DOUBLE) AS z_day,
       round(CAST(s_pos AS DOUBLE), 6) AS cusum_pos,
       round(CAST(s_neg AS DOUBLE), 6) AS cusum_neg,
       s_pos > {CUSUM_H} OR s_neg > {CUSUM_H} AS drift_alarm
FROM s
"""


@query("ev_cusum_changepoint", oracle=_cusum_oracle())
def ev_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detection on daily event counts per type
    (Page 1954): standardized residuals accumulate through
    Sₜ = max(0, Sₜ₋₁ + zₜ − k) on each side; an alarm fires when
    either side exceeds h — the SEQUENTIAL changepoint monitor that
    catches slow drifts the per-day z-score (ev_anomaly_zscore) and
    EWMA (ev_anomaly_ewma) baselines miss, completing the anomaly
    family.  The max(0, ·) recursion is NOT a recurrence at the
    engine level: Sₜ = Pₜ − min(0, min_{j≤t} Pⱼ) with P the plain
    cumulative sum of (z − k), so two stock windows (cumsum, running
    min) express it exactly.

    Determinism: per-type mean/σ assemble from exact integer count
    sums with one division and one √; z rounds to 6dp then enters
    DECIMAL, so both window accumulations are exact — no float folds.

    Scale shape: the shuffle collapses events to the (type, day)
    panel via partial aggregation; both windows run over that
    CALENDAR-BOUNDED panel (rows = days × types, independent of event
    volume), so the per-type partitions stay small at any corpus
    scale."""
    ev = _t(spark, sf_dir, "events")
    # checkpoint the calendar-bounded day panel: it feeds both the
    # per-type moment fold and the z attach — without the pin each
    # branch re-executes the events scan (2 scans measured)
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("c").cast("decimal(20,0)")).alias("sc"),
        F.sum(F.col("c").cast("decimal(20,0)") * F.col("c")).alias("sc2"),
    )
    mean = F.col("sc").cast("double") / F.col("n_days")
    std = F.sqrt(
        (
            F.col("sc2").cast("double")
            - F.col("sc").cast("double")
            * F.col("sc").cast("double")
            / F.col("n_days")
        )
        / F.nullif(F.col("n_days") - 1, F.lit(0))
    )
    z = (
        F.round((F.col("c") - mean) / F.nullif(std, F.lit(0.0)), 6)
        .cast("decimal(20,6)")
        .alias("z")
    )
    zd = daily.join(F.broadcast(st), "event_type").select(
        "event_type", "day", "c", z
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    k = F.lit(CUSUM_K).cast("decimal(20,6)")
    p = zd.select(
        "event_type",
        "day",
        "c",
        "z",
        F.sum(F.col("z") - k).over(w).alias("p_pos"),
        F.sum(-F.col("z") - k).over(w).alias("p_neg"),
    )
    zero = F.lit("0").cast("decimal(38,6)")
    s_pos = F.col("p_pos") - F.least(zero, F.min("p_pos").over(w))
    s_neg = F.col("p_neg") - F.least(zero, F.min("p_neg").over(w))
    h = F.lit(CUSUM_H).cast("decimal(20,6)")
    return p.select(
        "event_type",
        "day",
        F.col("c").alias("n_events"),
        F.col("z").cast("double").alias("z_day"),
        F.round(s_pos.cast("double"), 6).alias("cusum_pos"),
        F.round(s_neg.cast("double"), 6).alias("cusum_neg"),
        ((s_pos > h) | (s_neg > h)).alias("drift_alarm"),
    )


# --------------------------------------------------------------------------
def _srm_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    b = f"{md5_int60_sql('CAST(user_id AS VARCHAR)')} % 2"
    return f"""
WITH assign AS (
    SELECT user_id, CASE WHEN {b} = 0 THEN 'A' ELSE 'B' END AS arm,
           count(*) AS n_events,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch
    FROM events GROUP BY user_id, arm
),
arms AS (
    SELECT arm, count(*) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted
    FROM assign GROUP BY arm
),
tot AS (
    SELECT sum(n_users) AS n,
           sum(CASE WHEN arm = 'A' THEN n_users ELSE 0 END) AS na,
           sum(CASE WHEN arm = 'B' THEN n_users ELSE 0 END) AS nb
    FROM arms
)
SELECT arm, n_users, n_events, n_converted,
       round(CAST(n_converted AS DOUBLE) / n_users, 6) AS conv_rate,
       round(CAST((na - nb) * (na - nb) AS DOUBLE) / n, 6) AS srm_chi2,
       CAST((na - nb) * (na - nb) AS DOUBLE) / n > 3.841 AS srm_alarm
FROM arms CROSS JOIN tot
"""


@query("ev_abtest_srm", oracle=_srm_oracle())
def ev_abtest_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment health panel with the sample-ratio-mismatch
    check (Fabijan et al. 2019 — the diagnostic every experimentation
    platform runs BEFORE reading a result): users hash-assign 50/50
    via the same md5 split sample_hash_split uses, and the 1-dof
    chi-square of the observed arm sizes, (n_A − n_B)²/n as exact
    integer arithmetic, flags a broken assignment pipe at the 5%
    level.  Per-arm user/event/conversion columns are the experiment
    read that the SRM check gates.

    Determinism: assignment is md5 (never RNG); the chi-square is an
    integer expression with one final double division.

    Scale shape: one partial-aggregated shuffle to user grain (the
    assignment and per-user flags ride it), then a 2-row arm rollup
    and a broadcast 1-row total — no windows, no joins of data."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")
    assign = ev.groupBy(
        "user_id",
        F.when(
            md5_int60(F.col("user_id").cast("string")) % 2 == 0, "A"
        )
        .otherwise("B")
        .alias("arm"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purch"
        ),
    )
    # checkpoint the 2-row arm rollup: it feeds both the total fold and
    # the output join — without the pin each branch re-executes the
    # events scan
    arms = (
        assign.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("n_purch") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_converted"),
        )
        .localCheckpoint(eager=True)
    )
    tot = arms.agg(
        F.sum("n_users").alias("n"),
        F.sum(F.when(F.col("arm") == "A", F.col("n_users")).otherwise(0)).alias(
            "na"
        ),
        F.sum(F.when(F.col("arm") == "B", F.col("n_users")).otherwise(0)).alias(
            "nb"
        ),
    )
    chi2 = ((F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb"))).cast(
        "double"
    ) / F.col("n")
    return arms.join(F.broadcast(tot)).select(
        "arm",
        "n_users",
        "n_events",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_users"), 6).alias(
            "conv_rate"
        ),
        F.round(chi2, 6).alias("srm_chi2"),
        (chi2 > 3.841).alias("srm_alarm"),
    )


# --------------------------------------------------------------------------
def _gini_oracle() -> str:
    return """
WITH c AS (
    SELECT event_type, user_id, count(*) AS cnt
    FROM events GROUP BY event_type, user_id
),
rk AS (
    SELECT event_type, cnt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cnt, user_id) AS i
    FROM c
),
s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(cnt AS DECIMAL(19,0))) AS DOUBLE) AS tot,
           CAST(sum(CAST(i AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
                AS DOUBLE) AS sic
    FROM rk GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(tot AS BIGINT) AS n_events,
       round(2 * sic / nullif(n * tot, 0) - (n + 1) / n, 6) AS gini
FROM s
"""


@query("ev_gini_concentration", oracle=_gini_oracle())
def ev_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity per event type — the
    inequality summary of the engagement distribution (0 = everyone
    equally active, ->1 = a few power users generate everything).
    The one-number companion to ev_user_decile's full distribution
    and ev_bot_score_panel's outlier flags: a rising Gini is the
    canonical "bot ring / whale concentration" drift alarm.

    Computed from the sorted-rank identity G = 2*sum(i*x_i)/(n*S)
    - (n+1)/n over counts sorted ascending (deterministic (cnt,
    user_id) tiebreak).  Ranks and counts are exact integers; both
    moment sums accumulate in DECIMAL(19,0) products (exact,
    order-independent), and the G assembly is one fixed-order double
    expression — no transcendentals at all, bit-identical
    cross-engine.

    Scale shape: user-grain counts partial-aggregate before their
    one shuffle; the per-type ascending rank is NOT a per-type window
    (a 5-valued event_type would funnel 100 TB/5 through single
    window tasks) but operators.ranks.grouped_cumsum of the constant
    1 — the range-bucketed two-phase rank, distributed across value
    buckets — followed by one partial-aggregated panel fold."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rk = grouped_cumsum(
        c.withColumn("one", F.lit(1)),
        ["event_type"],
        [("cnt", "asc"), ("user_id", "asc")],
        "one",
        "i",
    )
    idec = F.col("i").cast("decimal(19,0)")
    cdec = F.col("cnt").cast("decimal(19,0)")
    s = rk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(cdec).cast("double").alias("tot"),
        F.sum(idec * cdec).cast("double").alias("sic"),
    )
    n, tot, sic = F.col("n"), F.col("tot"), F.col("sic")
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_users"),
        tot.cast("bigint").alias("n_events"),
        F.round(
            2 * sic / F.nullif(n * tot, F.lit(0.0)) - (n + 1) / n, 6
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
def _twa_oracle() -> str:
    return """
WITH seg AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(value AS DECIMAL(18,6)) AS v,
           epoch_us(ts) AS t,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id) AS nxt
    FROM events
),
ud AS (
    SELECT user_id, day,
           CAST(sum(CASE WHEN nxt IS NULL THEN NULL ELSE v * (nxt - t) END)
                AS DOUBLE) AS wsum,
           max(t) - min(t) AS span
    FROM seg GROUP BY 1, 2
),
twa AS (
    SELECT day,
           CAST(round(wsum / span, 6) AS DECIMAL(18,6)) AS twa
    FROM ud WHERE span > 0
)
SELECT day,
       count(*) AS n_user_days,
       round(CAST(sum(twa) AS DOUBLE) / count(*), 6) AS mean_twa
FROM twa GROUP BY day
"""


@query("ev_time_weighted_value", oracle=_twa_oracle())
def ev_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user-day, rolled up to a
    daily panel — the hypertable-style LOCF integral (each value
    holds until the user's next event; the day's average weights
    values by how long they were 'current', not by event count).
    The read that separates 'briefly spiked' from 'stayed high' —
    a per-event mean cannot; single-event user-days carry no span
    and are excluded on both engines.

    Determinism: timestamps are exact microsecond integers; each
    LOCF segment weight v·(t_next − t) multiplies a DECIMAL value by
    an integer gap (exact, order-independent sum); the per-user-day
    TWA rounds to 6dp then DECIMAL-sums into the daily mean.  Equal
    timestamps order by event_id — their segments weigh zero, so the
    tiebreak only pins WHICH value owns the next nonzero segment,
    identically in both engines.

    Scale shape: one lead window partitioned at (user_id, day) grain
    — full key cardinality, never a hot panel — feeding two
    partial-aggregated group-bys (user-day, then day).

    Domain bound (extreme-values audit, round 10): v stays
    DECIMAL(18,6) because the segment weight multiplies it by a
    microsecond gap (up to ~8.6e10/day) — (18,6)x(20,0) is the widest
    exact product under the 38-digit decimal ceiling, so |value| >=
    1e12 is rejected IDENTICALLY by both engines at the cast; the
    plain-sum keys widened to (28,6) have no such product."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.unix_micros("ts").alias("t"),
        "ts",
        "event_id",
    ).withColumn("nxt", F.lead(F.unix_micros("ts")).over(w))
    ud = seg.groupBy("user_id", "day").agg(
        F.sum(
            F.when(F.col("nxt").isNull(), None).otherwise(
                F.col("v") * (F.col("nxt") - F.col("t"))
            )
        )
        .cast("double")
        .alias("wsum"),
        (F.max("t") - F.min("t")).alias("span"),
    )
    twa = ud.filter(F.col("span") > 0).select(
        "day",
        F.round(F.col("wsum") / F.col("span"), 6)
        .cast("decimal(18,6)")
        .alias("twa"),
    )
    return twa.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.round(F.sum("twa").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_twa"
        ),
    )


# --------------------------------------------------------------------------
def _nelson_aalen_oracle() -> str:
    return """
WITH mx AS (SELECT max(ts) AS m FROM events),
v AS (
    SELECT e.user_id, e.ts AS v_ts, mx.m
    FROM events e, mx WHERE e.event_type = 'view'
),
fp AS (
    SELECT v.v_ts, v.m, min(p.ts) AS fp_ts
    FROM v LEFT JOIN events p
      ON p.event_type = 'purchase' AND p.user_id = v.user_id
     AND p.ts >= v.v_ts AND p.ts < v.v_ts + INTERVAL 24 HOUR
    GROUP BY v.user_id, v.v_ts, v.m
),
subj AS (
    SELECT CASE WHEN fp_ts IS NOT NULL
                THEN epoch_us(fp_ts) - epoch_us(v_ts)
                ELSE least(86400000000, epoch_us(m) - epoch_us(v_ts))
           END AS obs_us,
           (fp_ts IS NOT NULL) AS is_event
    FROM fp
),
panel AS (
    SELECT CAST(obs_us // 3600000000 AS BIGINT) AS hour_bucket,
           sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS d_events,
           sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS c_censored
    FROM subj GROUP BY 1
),
risk AS (
    SELECT hour_bucket, d_events, c_censored,
           (SELECT sum(d_events + c_censored) FROM panel)
           - coalesce(sum(d_events + c_censored) OVER
                 (ORDER BY hour_bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
    FROM panel
),
hz AS (
    SELECT hour_bucket, n_at_risk, d_events, c_censored,
           CAST(round(CAST(d_events AS DOUBLE) / n_at_risk, 9)
                AS DECIMAL(12,9)) AS hazard
    FROM risk
)
SELECT CAST(hour_bucket AS BIGINT) AS hour_bucket,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(c_censored AS BIGINT) AS c_censored,
       CAST(hazard AS DOUBLE) AS hazard,
       CAST(sum(hazard) OVER (ORDER BY hour_bucket) AS DOUBLE)
           AS cum_hazard,
       round(exp(-CAST(sum(hazard) OVER (ORDER BY hour_bucket)
                       AS DOUBLE)), 6) AS survival_est
FROM hz
"""


@query("ev_nelson_aalen", oracle=_nelson_aalen_oracle())
def ev_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator for the view→purchase
    delay with RIGHT CENSORING (round 9): every view is a subject,
    the event is that user's first purchase within 24 h, and views
    whose follow-up is cut short by the stream end are censored at
    what was actually observed — the estimator ev_conversion_survival
    deliberately sidesteps by excluding incomplete-follow-up views.
    H(t) = Σ_{t_j ≤ t} d_j/n_j over hourly buckets; survival ≈
    exp(−H) (the product-limit relation).  The censoring-honest
    survival curve is what attribution-horizon and session-timeout
    choices should be read against.

    Determinism: d_j/n_j is one IEEE double division of exact
    integers rounded to 9 dp and held as DECIMAL(12,9), so the
    cumulative hazard is an EXACT decimal sum (order-free); the only
    transcendental is the final exp on an identical double, rounded
    to 6 dp on both engines.

    Scale shape: the first-purchase lookup is the bounded 24 h
    user-keyed interval join (same shape as ev_conversion_survival);
    everything after is a ≤25-row hourly panel — at-risk counts and
    the hazard cumsum are broadcast theta-joins over that panel
    (panel_rank's pattern), never a partition-less window over data.
    """
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(F.broadcast(mx))
        .select("user_id", F.col("ts").alias("v_ts"), "m")
    )
    firstp = _first_purchase_24h(ev, v, "left")
    obs_us = F.when(
        F.col("fp_ts").isNotNull(),
        F.unix_micros("fp_ts") - F.unix_micros("v_ts"),
    ).otherwise(
        F.least(
            F.lit(86_400_000_000),
            F.unix_micros("m") - F.unix_micros("v_ts"),
        )
    )
    subj = firstp.select(
        (obs_us / F.lit(3_600_000_000)).cast("bigint").alias("hour_bucket"),
        F.col("fp_ts").isNotNull().alias("is_event"),
    )
    panel = (
        subj.groupBy("hour_bucket")
        .agg(
            F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d_events"),
            F.sum(F.when(F.col("is_event"), 0).otherwise(1)).alias(
                "c_censored"
            ),
        )
        .localCheckpoint(eager=True)
    )
    tot = panel.agg(
        F.sum(F.col("d_events") + F.col("c_censored")).alias("n_total")
    )
    prior = panel.select(
        F.col("hour_bucket").alias("j"),
        (F.col("d_events") + F.col("c_censored")).alias("rem"),
    )
    risk = (
        panel.join(F.broadcast(prior), F.col("j") < F.col("hour_bucket"), "left")
        .groupBy("hour_bucket", "d_events", "c_censored")
        .agg(F.coalesce(F.sum("rem"), F.lit(0)).alias("gone"))
        .join(F.broadcast(tot))
        .select(
            "hour_bucket",
            (F.col("n_total") - F.col("gone")).alias("n_at_risk"),
            "d_events",
            "c_censored",
        )
    )
    hz = risk.select(
        "hour_bucket",
        "n_at_risk",
        "d_events",
        "c_censored",
        F.round(F.col("d_events").cast("double") / F.col("n_at_risk"), 9)
        .cast("decimal(12,9)")
        .alias("hazard"),
    ).localCheckpoint(eager=True)
    hzo = hz.select(F.col("hour_bucket").alias("j"), F.col("hazard").alias("h_j"))
    cum = (
        hz.join(F.broadcast(hzo), F.col("j") <= F.col("hour_bucket"))
        .groupBy("hour_bucket", "n_at_risk", "d_events", "c_censored", "hazard")
        .agg(F.sum("h_j").cast("double").alias("cum_hazard"))
    )
    return cum.select(
        F.col("hour_bucket").cast("bigint").alias("hour_bucket"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d_events").cast("bigint").alias("d_events"),
        F.col("c_censored").cast("bigint").alias("c_censored"),
        F.col("hazard").cast("double").alias("hazard"),
        "cum_hazard",
        F.round(F.exp(-F.col("cum_hazard")), 6).alias("survival_est"),
    )


# --------------------------------------------------------------------------
def _power_mde_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    b = f"{md5_int60_sql('CAST(user_id AS VARCHAR)')} % 2"
    return f"""
WITH assign AS (
    SELECT user_id,
           CASE WHEN {b} = 0 THEN 'A' ELSE 'B' END AS arm,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id, arm
),
arms AS (
    SELECT arm, count(*) AS n_users, sum(converted) AS n_conv
    FROM assign GROUP BY arm
),
w AS (
    SELECT a.n_users AS n_a, b2.n_users AS n_b,
           a.n_conv AS conv_a, b2.n_conv AS conv_b,
           CAST(a.n_conv + b2.n_conv AS DOUBLE)
               / (a.n_users + b2.n_users) AS p_pool,
           CAST(least(a.n_users, b2.n_users) AS DOUBLE) AS n_min
    FROM arms a JOIN arms b2 ON a.arm = 'A' AND b2.arm = 'B'
)
SELECT CAST(n_a AS BIGINT) AS n_users_a,
       CAST(n_b AS BIGINT) AS n_users_b,
       round(CAST(conv_a AS DOUBLE) / n_a, 6) AS conv_rate_a,
       round(CAST(conv_b AS DOUBLE) / n_b, 6) AS conv_rate_b,
       round(p_pool, 6) AS pooled_rate,
       round(2.801585 * sqrt(2.0 * p_pool * (1.0 - p_pool) / n_min), 6)
           AS mde_abs_80pct,
       round(2.801585 * sqrt(2.0 * p_pool * (1.0 - p_pool) / n_min)
             / nullif(p_pool, 0), 6) AS mde_rel_80pct,
       (2.801585 * sqrt(2.0 * p_pool * (1.0 - p_pool) / n_min)
        / nullif(p_pool, 0)) <= 0.10 AS powered_for_10pct_lift
FROM w
"""


@query("ev_power_mde", oracle=_power_mde_oracle())
def ev_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at 80% power / 5% two-sided alpha
    for the running A/B assignment (round 9) — the design-honesty
    panel that belongs NEXT TO ev_abtest_srm and
    stats_proportions_ztest: before reading any significance test,
    ask what lift the experiment could even see.  MDE_abs =
    (z_{α/2}+z_β)·√(2p̄(1−p̄)/n) with z constants 1.959964+0.841621
    folded to the literal 2.801585; an experiment whose relative MDE
    exceeds the lift the team hopes for is undersized no matter what
    the p-value says.

    Determinism: the user-grain conversion flags and arm counts are
    exact integers off the same md5 split as ev_abtest_srm; the MDE
    assembles in one fixed-order double expression (one IEEE sqrt,
    literal z-sum), with a mirrored nullif on the zero-conversion
    degenerate.

    Scale shape: one user-grain partial-aggregated shuffle to the
    2-row arm panel, then a 2-row join — adding power columns costs
    expressions, not passes."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")
    assign = ev.groupBy(
        "user_id",
        F.when(md5_int60(F.col("user_id").cast("string")) % 2 == 0, "A")
        .otherwise("B")
        .alias("arm"),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_conv"),
    )
    a = arms.filter(F.col("arm") == "A").select(
        F.col("n_users").alias("n_a"), F.col("n_conv").alias("conv_a")
    )
    b = arms.filter(F.col("arm") == "B").select(
        F.col("n_users").alias("n_b"), F.col("n_conv").alias("conv_b")
    )
    j = a.join(F.broadcast(b))
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    n_min = F.least(F.col("n_a"), F.col("n_b")).cast("double")
    mde_abs = 2.801585 * F.sqrt(2.0 * p_pool * (1.0 - p_pool) / n_min)
    mde_rel = mde_abs / F.nullif(p_pool, F.lit(0.0))
    return j.select(
        F.col("n_a").cast("bigint").alias("n_users_a"),
        F.col("n_b").cast("bigint").alias("n_users_b"),
        F.round(F.col("conv_a").cast("double") / F.col("n_a"), 6).alias(
            "conv_rate_a"
        ),
        F.round(F.col("conv_b").cast("double") / F.col("n_b"), 6).alias(
            "conv_rate_b"
        ),
        F.round(p_pool, 6).alias("pooled_rate"),
        F.round(mde_abs, 6).alias("mde_abs_80pct"),
        F.round(mde_rel, 6).alias("mde_rel_80pct"),
        (mde_rel <= 0.10).alias("powered_for_10pct_lift"),
    )


# --------------------------------------------------------------------------
def _dow_adjusted_oracle() -> str:
    return """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           dayofweek(CAST(ts AS DATE)) AS dow, count(*) AS c
    FROM events GROUP BY 1, 2, 3
),
prof AS (
    SELECT event_type, dow,
           CAST(sum(CAST(c AS DECIMAL(20,0))) AS DOUBLE) / count(*)
               AS dow_mean
    FROM daily GROUP BY event_type, dow
),
resid AS (
    SELECT d.event_type, d.day, d.c, p.dow_mean,
           d.c - p.dow_mean AS r
    FROM daily d JOIN prof p
      ON d.event_type = p.event_type AND d.dow = p.dow
),
st AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(r * r, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS srr
    FROM resid GROUP BY event_type
)
SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day,
       CAST(r.c AS BIGINT) AS n_events,
       round(r.dow_mean, 6) AS dow_mean,
       round(r.r / nullif(sqrt(st.srr / nullif(st.n - 1, 0)), 0), 6)
           AS resid_z,
       abs(r.r / nullif(sqrt(st.srr / nullif(st.n - 1, 0)), 0)) > 3.0
           AS is_anomaly
FROM resid r JOIN st ON r.event_type = st.event_type
"""


@query("ev_anomaly_dow_adjusted", oracle=_dow_adjusted_oracle())
def ev_anomaly_dow_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-adjusted anomaly flags (round 9): subtract each
    (type, weekday)'s own mean before scoring — the adjustment every
    production alert needs because Mondays ALWAYS spike: a plain
    z-score (ev_anomaly_zscore) either alarms weekly or, tuned not
    to, goes blind to a genuine Tuesday burst hiding under the
    weekly swing.  Scores each day's residual against the
    residual-pool standard deviation at 3σ — the seasonal member of
    the anomaly family (z / MAD / EWMA / CUSUM / this).

    Determinism: daily and weekday-profile counts are exact
    integers/DECIMAL ratios; residual squares round to 6 dp then
    DECIMAL-sum; the z assembles in fixed-order doubles with
    mirrored zero-variance/single-row guards.

    Scale shape: one partial-agged shuffle to (type, day) grain
    (checkpointed), then two panel-sized rollups (≤7 weekday rows,
    1 stat row per type) broadcast back onto the day panel — the
    event stream shuffles exactly once."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.dayofweek(F.col("ts").cast("date")).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    prof = daily.groupBy("event_type", "dow").agg(
        (
            F.sum(F.col("c").cast("decimal(20,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("dow_mean")
    )
    resid = daily.join(F.broadcast(prof), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "c",
        "dow_mean",
        (F.col("c") - F.col("dow_mean")).alias("r"),
    ).localCheckpoint(eager=True)
    st = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("r") * F.col("r"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("srr"),
    )
    sd = F.sqrt(F.col("srr") / F.nullif(F.col("n") - 1, F.lit(0)))
    z = F.col("r") / F.nullif(sd, F.lit(0.0))
    return resid.join(F.broadcast(st), "event_type").select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("c").cast("bigint").alias("n_events"),
        F.round("dow_mean", 6).alias("dow_mean"),
        F.round(z, 6).alias("resid_z"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
def _conv_latency_oracle() -> str:
    return """
WITH v AS (
    SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
),
fp AS (
    SELECT v.user_id, v.v_ts, min(p.ts) AS fp_ts
    FROM v JOIN events p
      ON p.event_type = 'purchase' AND p.user_id = v.user_id
     AND p.ts >= v.v_ts AND p.ts < v.v_ts + INTERVAL 24 HOUR
    GROUP BY v.user_id, v.v_ts
),
d AS (
    SELECT CAST(epoch_us(fp_ts) - epoch_us(v_ts) AS DOUBLE) / 1000000
        AS delay_s
    FROM fp
)
SELECT CAST(count(*) AS BIGINT) AS n_conversions,
       round(quantile_cont(delay_s, 0.25), 3) AS p25_s,
       round(quantile_cont(delay_s, 0.50), 3) AS p50_s,
       round(quantile_cont(delay_s, 0.90), 3) AS p90_s,
       round(quantile_cont(delay_s, 0.99), 3) AS p99_s,
       round(quantile_cont(delay_s, 0.99) / nullif(
             quantile_cont(delay_s, 0.50), 0), 4) AS p99_to_p50
FROM d
"""


@query("ev_conversion_latency_quantiles", oracle=_conv_latency_oracle())
def ev_conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """View→purchase conversion-latency quantile ladder (round 9):
    p25/p50/p90/p99 of the delay between a view and that user's
    first purchase within 24 h, plus the p99/p50 tail ratio — the
    DISTRIBUTIONAL companion to ev_conversion_survival's cumulative
    incidence (which answers 'how many convert by t'; this answers
    'how long does a typical vs a tail conversion take', the numbers
    attribution windows and session timeouts are tuned against).

    Determinism: delays are exact integer microseconds scaled by one
    division; quantiles via the percentile ↔ quantile_cont
    bit-parity probe; rounding is output-only and the tail ratio
    guards the degenerate all-instant case with a mirrored nullif.

    Scale shape: the bounded 24 h user-keyed interval join
    (ev_conversion_survival's shape) collapsed by min() per view,
    then ONE aggregate — exact percentiles at test scale, with the
    GK sketch as the documented swap-in at extreme row counts."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    fp = _first_purchase_24h(ev, v, "inner")
    d = fp.select(
        (
            (F.unix_micros("fp_ts") - F.unix_micros("v_ts")).cast("double")
            / 1_000_000
        ).alias("delay_s")
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.round(F.expr("percentile(delay_s, 0.25)"), 3).alias("p25_s"),
        F.round(F.expr("percentile(delay_s, 0.50)"), 3).alias("p50_s"),
        F.round(F.expr("percentile(delay_s, 0.90)"), 3).alias("p90_s"),
        F.round(F.expr("percentile(delay_s, 0.99)"), 3).alias("p99_s"),
        F.round(
            F.expr("percentile(delay_s, 0.99)")
            / F.nullif(F.expr("percentile(delay_s, 0.50)"), F.lit(0.0)),
            4,
        ).alias("p99_to_p50"),
    )
