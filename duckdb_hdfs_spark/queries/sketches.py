"""Mergeable-sketch registry entries (SURVEY.md §2.11): HyperLogLog
distinct sketches and Misra-Gries heavy hitters.

At 100 TB, exact global statistics are re-computed constantly unless
the engine keeps MERGEABLE partial summaries: a sketch per partition
/ day / source that unions into any rollup without re-scanning raw
data.  Two families:

- ``sketch_hll_distinct``: Apache DataSketches HLL via the built-in
  ``hll_sketch_agg`` / ``hll_union_agg`` (JVM-side, map-side partial
  aggregation).  Per-group sketches union into the global sketch —
  the raw table is scanned once, ever.  The estimate is verified
  against the exact distinct count with a relative-error bound, so
  the oracle check is deterministic (the bound boolean hashes, the
  estimate itself does not need to).
- ``sketch_heavy_hitters``: distributed Misra-Gries.  Each partition
  builds a capacity-m summary (mapInPandas, vectorized batch merge:
  add exact batch counts, then subtract the (m+1)-th largest and
  drop non-positives — the mergeable-summaries formulation of
  Agarwal/Cormode et al. 2012, which preserves the n/m error bound
  under merging).  Partials sum by key (one tiny shuffle), candidates
  with estimate above ``threshold - n/m`` are exact-verified with one
  broadcast-semi-joined re-scan.  Because every item with true
  frequency > threshold is GUARANTEED to survive the sketch (error
  <= n/m < threshold), the final output equals the exact
  GROUP BY / HAVING answer — bit-identical to the oracle — while the
  shuffled state is bounded by m per partition instead of one row
  per distinct key.

Round 4 rotated these keys into the driver's 50-entry window;
the sf0.001/sf0.01 pytest sweep covers them every round regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t

#: Misra-Gries summary capacity.  The heavy-hitter threshold is
#: n // HH_INV_FRAC; MG_CAPACITY > HH_INV_FRAC guarantees the sketch
#: error n/MG_CAPACITY stays strictly below the threshold at EVERY
#: scale, so no true heavy hitter can be evicted.
MG_CAPACITY = 256
HH_INV_FRAC = 125


# --------------------------------------------------------------------------
@query(
    "sketch_hll_distinct",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS hll_ok
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type, count(DISTINCT user_id) AS n_exact,
       TRUE AS hll_ok
FROM events
""",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL distinct-user sketches, unioned into the
    global sketch WITHOUT re-scanning events — the mergeable-rollup
    pattern (daily sketches → monthly rollup for free).  Emits the
    exact count plus a boolean asserting the HLL estimate lands
    within 5% relative error (lgConfigK=12 ⇒ ~1.6% standard error),
    so the comparison is deterministic.

    Scale: ``hll_sketch_agg`` partial-aggregates map-side (a sketch
    per task, merged at the reducer — constant bytes per group, never
    one row per distinct user); the union of the 5 per-type sketches
    is driver-trivial.  The exact countDistinct alongside is the
    AUDIT (it shuffles one row per distinct (type, user)); production
    rollups would carry only the sketch column."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    # global sketch = union of the per-type sketches (no events rescan);
    # the exact global distinct is the audit and does rescan.  Joined on
    # a literal key so the two single-row aggregates broadcast-hash-join
    # (a crossJoin would plan a CartesianProduct).
    total = per.agg(F.hll_union_agg("sk").alias("sk")).withColumn("k", F.lit(1))
    total_exact = ev.agg(F.count_distinct("user_id").alias("n_exact")).withColumn(
        "k", F.lit(1)
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
        <= 0.05 * F.col("n_exact")
    ).alias("hll_ok")
    per_rows = per.select("event_type", "n_exact", ok)
    all_rows = total.join(F.broadcast(total_exact), "k").select(
        F.lit("__all__").alias("event_type"), "n_exact", ok
    )
    return per_rows.unionByName(all_rows)


# --------------------------------------------------------------------------
def _mg_partial_factory(capacity: int):
    """Per-partition Misra-Gries summary as a vectorized mapInPandas
    function: exact value_counts per Arrow batch merged into the
    running summary, then the mergeable-summaries prune (subtract the
    (capacity+1)-th largest weight, drop non-positives).  Total
    subtracted weight across all prunes is <= n_partition/capacity —
    the MG error bound.

    The summary CARRIES ITS OWN MASS: one sentinel row
    (user_id NULL, w = exact partition row count) per partition, so
    the global n — and hence the n-derived threshold — falls out of
    the same pass with no separate counting scan of the input."""
    import numpy as np
    import pandas as pd

    def mg_partial(batches):
        counters: dict[int, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for uid, cnt in pdf["user_id"].value_counts().items():
                counters[int(uid)] = counters.get(int(uid), 0) + int(cnt)
            if len(counters) > capacity:
                w = np.fromiter(counters.values(), dtype=np.int64)
                # (capacity+1)-th largest = capacity-th index from top
                sub = int(np.partition(w, -capacity - 1)[-capacity - 1])
                counters = {
                    k: v - sub for k, v in counters.items() if v - sub > 0
                }
        yield pd.DataFrame(
            {
                "user_id": pd.Series(list(counters) + [None], dtype="Int64"),
                "w": pd.Series(
                    list(counters.values()) + [n_rows], dtype="int64"
                ),
            }
        )

    return mg_partial


@query(
    "sketch_heavy_hitters",
    headline=True,
    oracle=f"""
SELECT user_id, count(*) AS n_events
FROM events GROUP BY user_id
HAVING count(*) > (SELECT count(*) // {HH_INV_FRAC} FROM events)
""",
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with more than n/125 of all events, found via
    distributed Misra-Gries: capacity-256 per-partition summaries
    (bounded state — 256 rows shuffle per partition, NOT one row per
    distinct user), summed by key, pruned at ``threshold - n/256``,
    then exact-verified with one broadcast-semi-joined re-scan.  The
    MG guarantee (estimate >= true - n/256, and n/256 < n/125) means
    every true heavy hitter survives to the verify step, so the
    output is bit-identical to the exact GROUP BY/HAVING oracle.

    Scale: pass 1 shuffles ≤ 256 rows per map task regardless of key
    cardinality (billions of users cost the same as thousands); the
    candidate set is ≤ a few hundred keys → broadcast; pass 2 is a
    scan + broadcast-hash semi-join + partial-aggregated count on the
    few surviving keys.  Exactly-correct answer, sketch-bounded
    memory."""
    ev = _t(spark, sf_dir, "events")
    # ONE sketch pass produces both the summaries and the exact total
    # (each partition's sentinel row carries its row count), so the
    # n-derived threshold needs no separate counting scan or driver
    # action.  The partials are sketch-bounded (≤ capacity+1 rows per
    # partition), so the eager localCheckpoint materializes a tiny
    # set once and both consumers read it without re-running the
    # mapInPandas pass.
    partials = (
        ev.select("user_id")
        .mapInPandas(_mg_partial_factory(MG_CAPACITY), "user_id long, w long")
        .localCheckpoint(eager=True)
    )
    tot = partials.filter(F.isnull("user_id")).agg(
        F.sum("w").alias("n_total")
    )
    thr = F.floor(F.col("n_total") / HH_INV_FRAC)
    cands = (
        partials.filter(F.isnotnull("user_id"))
        .groupBy("user_id")
        .agg(F.sum("w").alias("est"))
        .join(F.broadcast(tot))
        .filter(F.col("est") > thr - F.col("n_total") / MG_CAPACITY)
        .select("user_id")
    )
    return (
        ev.join(F.broadcast(cands), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .join(F.broadcast(tot))
        .filter(F.col("n_events") > thr)
        .select("user_id", "n_events")
    )


# --------------------------------------------------------------------------
@query(
    "sketch_quantiles_approx",
    # the oracle states the exact quantiles and asserts the bound
    # holds (within_bound TRUE) — the Spark side must land its
    # sketch estimates inside the +/-1%-rank corridor around the
    # exact quantile for the hash to match (same contract as
    # sketch_hll_distinct / distinct_users_approx).
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50_exact,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag
""",
)
def sketch_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SKETCH with a verified rank-error bound:
    ``approx_percentile`` (Greenwald-Khanna; mergeable per-partition
    summaries, map-side partial aggregation — one scan, tiny shuffle)
    next to the exact interpolated quantile, emitting the exact p50
    and a boolean asserting GK's rank-bound guarantee by COUNTS:
    count(x <= v) >= 0.49*n and count(x < v) <= 0.51*n — i.e. the
    returned value's rank is within +/-1% of the median rank, with n
    the NON-NULL population (count(col), not count(*)): an all-NULL
    group has no rank bound to violate, so the boolean stays TRUE on
    both engines (all-NULL audit, round 10).

    At 100 TB the exact-percentile branch (full sort per group) is
    the audit, the sketch is the product: GK summaries are the only
    way to serve per-group quantiles from a single pass with bounded
    state (accuracy 10000 -> ~0.01% rank error, ~KB per group)."""
    li = _t(spark, sf_dir, "lineitem")
    # the bound check is GK's ACTUAL guarantee — the returned value's
    # RANK is within ±1% of the median rank: count(x ≤ v) ≥ 0.49·n and
    # count(x < v) ≤ 0.51·n.  (The earlier interpolated-value corridor
    # [q(.49), q(.51)] degenerates at tiny groups, where it can
    # contain no data element at all — tiny-data audit r9.)
    g1 = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias(
            "p50_exact"
        ),
        F.expr("approx_percentile(l_extendedprice, 0.50, 10000)").alias("ap"),
    )
    return (
        li.join(F.broadcast(g1), "l_returnflag")
        .groupBy("l_returnflag", "p50_exact")
        .agg(
            (
                (
                    F.sum(
                        F.when(
                            F.col("l_extendedprice") <= F.col("ap"), 1
                        ).otherwise(0)
                    )
                    >= 0.49 * F.count("l_extendedprice")
                )
                & (
                    F.sum(
                        F.when(
                            F.col("l_extendedprice") < F.col("ap"), 1
                        ).otherwise(0)
                    )
                    <= 0.51 * F.count("l_extendedprice")
                )
            ).alias("within_bound")
        )
        .select("l_returnflag", "p50_exact", "within_bound")
    )


# --------------------------------------------------------------------------
BLOOM_BITS = 1024   # m
BLOOM_K = 3         # hash functions
#: bits packed per BIGINT word — 62, not 64: a shift into bit 63 is a
#: signed-overflow error in DuckDB (and the sign bit invites subtle
#: two's-complement mismatches); 17 words cover the 1024 positions
BLOOM_WORD_BITS = 62
BLOOM_WORDS = (BLOOM_BITS + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS


def _bloom_pos_sql(j: int, key: str) -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    expr = f"'bloom{j}-' || CAST({key} AS VARCHAR)"
    return f"{md5_int60_sql(expr)} % {BLOOM_BITS}"


def _bloom_oracle() -> str:
    member_pos = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(j, 'user_id')} AS pos FROM members"
        for j in range(BLOOM_K)
    )
    probe_flags = " AND ".join(
        f"(words[CAST({_bloom_pos_sql(j, 'p.user_id')} // {BLOOM_WORD_BITS}"
        f" AS INTEGER) + 1]"
        f" & (CAST(1 AS BIGINT) << CAST({_bloom_pos_sql(j, 'p.user_id')}"
        f" % {BLOOM_WORD_BITS} AS INTEGER))) <> 0"
        for j in range(BLOOM_K)
    )
    return f"""
WITH members AS MATERIALIZED (
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'purchase' AND user_id % 3 = 0
),
pos AS ({member_pos}),
wordbits AS (
    SELECT CAST(pos // {BLOOM_WORD_BITS} AS INTEGER) AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD_BITS} AS INTEGER)) AS bits
    FROM pos GROUP BY w
),
bloom AS MATERIALIZED (
    SELECT list(coalesce(bits, 0) ORDER BY i) AS words
    FROM (SELECT unnest(generate_series(0, {BLOOM_WORDS - 1})) AS i)
    LEFT JOIN wordbits ON w = i
),
probes AS MATERIALIZED (SELECT DISTINCT user_id FROM events),
flagged AS (
    SELECT p.user_id,
           ({probe_flags}) AS hit,
           m.user_id IS NOT NULL AS is_member
    FROM probes p
    CROSS JOIN bloom
    LEFT JOIN members m ON p.user_id = m.user_id
)
SELECT count(*) AS n_probes,
       CAST(count(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
       CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS n_flagged,
       CAST(count(*) FILTER (WHERE hit AND NOT is_member) AS BIGINT)
           AS n_false_pos,
       CAST(count(*) FILTER (WHERE is_member AND NOT hit) AS BIGINT)
           AS n_missed
FROM flagged
"""


@query("sketch_bloom_filter", oracle=_bloom_oracle())
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter build + probe (round 5): the
    semi-join-reduction primitive — at 100 TB you broadcast a KB-size
    bit array to pre-filter a fact scan instead of shuffling it into
    a join (Spark's own runtime row-group skipping uses exactly this
    sketch).  Built here over a purchaser blocklist (k=3 md5-derived
    positions in m=1024 bits, per-partition partial ``bit_or`` into
    16 words — a mergeable summary like the HLL/MG ops) and probed
    by every distinct user; the audit counts flagged rows, false
    positives against the exact membership, and misses (MUST be 0 —
    a Bloom filter has no false negatives; a non-zero value here
    means the bit math broke).

    Engine-portable: positions come from md5, the bit array is
    BLOOM_WORDS (17) BIGINT words of BLOOM_WORD_BITS (62) usable bits
    each — 62, not 64, because setting bit 63 of a signed BIGINT
    overflows in DuckDB (see the constants' comment) — and probes
    test words[pos div 62] & (1 << pos mod 62) identically in both
    engines, so the audit row is hash-exact, not statistical."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")
    members = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 3 == 0))
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def pos(j: int):
        return md5_int60(
            F.concat(F.lit(f"bloom{j}-"), F.col("user_id").cast("string"))
        ) % BLOOM_BITS

    def pos_sql(j: int) -> str:
        return (
            f"(CAST(conv(substring(md5(concat('bloom{j}-', "
            f"CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % {BLOOM_BITS})"
        )

    posns = members.select(
        F.explode(F.array(*[pos(j) for j in range(BLOOM_K)])).alias("p")
    )
    # shiftleft with a COLUMN amount only exists in SQL form — the
    # python F.shiftleft signature takes a literal int
    wordbits = posns.groupBy(
        (F.col("p") / BLOOM_WORD_BITS).cast("int").alias("w")
    ).agg(
        F.bit_or(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT))"
            )
        ).alias("bits")
    )
    dense = (
        spark.range(BLOOM_WORDS)
        .select(F.col("id").cast("int").alias("i"))
        .join(wordbits, F.col("i") == F.col("w"), "left")
        .select("i", F.coalesce(F.col("bits"), F.lit(0)).alias("bits"))
    )
    bloom = dense.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "bits"))), lambda s: s["bits"]
        ).alias("words")
    )
    probes = ev.select("user_id").distinct()
    hit = F.expr(
        " AND ".join(
            f"(element_at(words, CAST({pos_sql(j)} DIV {BLOOM_WORD_BITS}"
            f" AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT),"
            f" CAST({pos_sql(j)} % {BLOOM_WORD_BITS} AS INT))) <> 0"
            for j in range(BLOOM_K)
        )
    )
    flagged = (
        probes.join(F.broadcast(bloom))
        .join(
            members.select(F.col("user_id").alias("m_uid")),
            F.col("user_id") == F.col("m_uid"),
            "left",
        )
        .select(
            hit.alias("hit"), F.col("m_uid").isNotNull().alias("is_member")
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count(F.when(F.col("is_member"), 1)).cast("bigint").alias("n_members"),
        F.count(F.when(F.col("hit"), 1)).cast("bigint").alias("n_flagged"),
        F.count(F.when(F.col("hit") & ~F.col("is_member"), 1))
        .cast("bigint")
        .alias("n_false_pos"),
        F.count(F.when(F.col("is_member") & ~F.col("hit"), 1))
        .cast("bigint")
        .alias("n_missed"),
    )


# --------------------------------------------------------------------------
CMS_D = 3     # hash rows
CMS_W = 256   # counters per row


def _cms_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    def col_sql(j: int, key: str) -> str:
        expr = f"'cms{j}-' || CAST({key} AS VARCHAR)"
        return f"{md5_int60_sql(expr)} % {CMS_W}"

    cells = " UNION ALL ".join(
        f"SELECT {j} AS j, {col_sql(j, 'user_id')} AS c FROM events"
        for j in range(CMS_D)
    )
    est = ", ".join(
        f"counters[{j} * {CMS_W} + CAST({col_sql(j, 'h.user_id')} AS INTEGER) + 1]"
        for j in range(CMS_D)
    )
    return f"""
WITH cells AS ({cells}),
cnt AS (SELECT j, c, count(*) AS n FROM cells GROUP BY j, c),
sketch AS MATERIALIZED (
    SELECT list(coalesce(n, 0) ORDER BY i) AS counters
    FROM (SELECT unnest(generate_series(0, {CMS_D * CMS_W - 1})) AS i)
    LEFT JOIN cnt ON cnt.j * {CMS_W} + cnt.c = i
),
heavy AS MATERIALIZED (
    SELECT user_id, count(*) AS n_exact FROM events
    GROUP BY user_id HAVING count(*) >= 50
)
SELECT h.user_id, h.n_exact,
       CAST(least({est}) AS BIGINT) AS cms_est,
       CAST(least({est}) AS BIGINT) >= h.n_exact AS never_undercounts
FROM heavy h CROSS JOIN sketch
"""


@query("sketch_count_min", oracle=_cms_oracle())
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Count-Min sketch (round 5): the frequency-estimate
    sibling of the HLL/MG/Bloom family — d=3 hash rows × w=256
    counters built by per-partition partial counting and merged by
    plain addition (counters are linear, the definitive mergeable
    summary), then point-queried for every heavy user (≥ 50 events)
    as min over rows of the addressed counters.  The CMS one-sided
    guarantee — estimates never undercount — is emitted as a checked
    boolean per key; the estimate itself is deterministic (exact
    integer counters), so the audit is hash-exact, not statistical.

    Scale: the sketch is 768 integers regardless of key cardinality;
    building it shuffles ≤ d·w rows per map task (partial aggregation
    collapses each task to its counter cells), and queries broadcast
    the one-row counter array — no lookup join against raw data."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")

    def cms_col(j: int):
        return md5_int60(
            F.concat(F.lit(f"cms{j}-"), F.col("user_id").cast("string"))
        ) % CMS_W

    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), cms_col(j).alias("c"))
                    for j in range(CMS_D)
                ]
            )
        ).alias("cell")
    ).select("cell.j", "cell.c")
    cnt = cells.groupBy("j", "c").agg(F.count(F.lit(1)).alias("n"))
    sketch = (
        spark.range(CMS_D * CMS_W)
        .select(F.col("id").cast("int").alias("i"))
        .join(
            cnt,
            F.col("i") == F.col("j") * CMS_W + F.col("c").cast("int"),
            "left",
        )
        .select("i", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "n"))),
                lambda s: s["n"],
            ).alias("counters")
        )
    )
    heavy = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .filter(F.col("n_exact") >= 50)
    )
    est = F.least(
        *[
            F.element_at(
                F.col("counters"),
                (F.lit(CMS_W * j) + cms_col(j).cast("int") + 1).cast("int"),
            )
            for j in range(CMS_D)
        ]
    ).cast("bigint")
    return heavy.join(F.broadcast(sketch)).select(
        "user_id",
        "n_exact",
        est.alias("cms_est"),
        (est >= F.col("n_exact")).alias("never_undercounts"),
    )


# --------------------------------------------------------------------------
@query(
    "sketch_hll_intersection",
    oracle="""
WITH panel AS (
    SELECT DISTINCT event_type, user_id FROM events
),
n AS (SELECT event_type, count(*) AS n FROM panel GROUP BY event_type),
inter AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_inter
    FROM panel a JOIN panel b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b,
       na.n AS n_a, nb.n AS n_b, n_inter,
       TRUE AS inter_ok
FROM inter
JOIN n na ON inter.type_a = na.event_type
JOIN n nb ON inter.type_b = nb.event_type
""",
)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user OVERLAP between event types estimated
    from HLL sketches by inclusion-exclusion (|A∩B| ≈ |A| + |B| −
    |A∪B|, the union via sketch merge — no rescan), exact-audited:
    the emitted boolean asserts the estimate lands within
    5%·(|A|+|B|)+2 of the exact intersection (intersection error
    compounds both sketches' bounds, hence the summed tolerance).
    The production value: audience-overlap matrices over 10⁹-user
    sets from kilobyte sketches, no pairwise user-level join.

    Scale shape: ONE events scan → distinct (type, user) panel,
    localCheckpoint-ed; per-type sketches AND exact counts derive
    from the panel (sketch state is constant bytes per type); the
    5×5 pair frame is sketch-sized and joins on a literal key
    (broadcast hash, not cartesian); the exact-intersection AUDIT
    self-joins the panel on user_id — the one data-sized shuffle,
    absent from the production form which carries only sketches."""
    ev = _t(spark, sf_dir, "events")
    panel = (
        ev.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    per = panel.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn("k", F.lit(1))
    a = per.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n").alias("n_a"),
        "k",
    )
    b = per.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n").alias("n_b"),
        "k",
    )
    pairs = a.join(F.broadcast(b), "k").filter(
        F.col("type_a") < F.col("type_b")
    )
    inter = (
        panel.alias("x")
        .join(
            panel.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    est = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    )
    return (
        pairs.join(F.broadcast(inter), ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            (
                F.abs(est - F.col("n_inter"))
                <= 0.05 * (F.col("n_a") + F.col("n_b")) + 2
            ).alias("inter_ok"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "sketch_hll_rolling_wau",
    # the rolling 7-day distinct must land within 5% of exact for
    # every day; HLL union is order-independent so the flag is
    # deterministic.
    oracle="""
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
panel AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events)
SELECT day,
       CAST((SELECT count(DISTINCT user_id) FROM panel
             WHERE d >= day - INTERVAL 6 DAY AND d <= day) AS BIGINT)
           AS wau_exact,
       TRUE AS hll_ok
FROM days
""",
)
def sketch_hll_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING 7-day distinct users from DAILY HLL sketches: one
    sketch per day, each day's WAU = union of its trailing 7 sketches
    — the scalable form of ev_rolling_dau (the exact version
    re-touches 7 days of user rows per day; the sketch version
    touches 7 KILOBYTE summaries, and the daily sketches are the
    same ones the daily dashboard already stores).  Estimates are
    exact-audited within 5%.

    Scale shape: events collapse ONCE to (day, user) for the daily
    sketches AND the exact audit panel (checkpointed); the rolling
    union is a day-spine × 7-sketch interval join at calendar grain —
    data volume appears only in the first aggregation."""
    ev = _t(spark, sf_dir, "events")
    panel = (
        ev.select(F.date_trunc("day", "ts").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    daily_sk = panel.groupBy("d").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).localCheckpoint(eager=True)
    days = daily_sk.select(F.col("d").alias("day"))
    rolled = (
        F.broadcast(days)
        .join(
            daily_sk,
            (F.col("d") >= F.col("day") - F.expr("INTERVAL 6 DAY"))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk7"))
    )
    exact = (
        F.broadcast(days.withColumnRenamed("day", "xday"))
        .join(
            panel,
            (F.col("d") >= F.col("xday") - F.expr("INTERVAL 6 DAY"))
            & (F.col("d") <= F.col("xday")),
        )
        .groupBy("xday")
        .agg(F.countDistinct("user_id").alias("wau_exact"))
        .withColumnRenamed("xday", "day")
    )
    return (
        rolled.join(exact, "day")
        .select(
            "day",
            "wau_exact",
            (
                F.abs(F.hll_sketch_estimate("sk7") - F.col("wau_exact"))
                <= 0.05 * F.col("wau_exact")
            ).alias("hll_ok"),
        )
    )


# --------------------------------------------------------------------------
def _cms_join_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    def col_sql(j: int, key: str) -> str:
        expr = f"'cms{j}-' || CAST({key} AS VARCHAR)"
        return f"{md5_int60_sql(expr)} % {CMS_W}"

    cells = " UNION ALL ".join(
        f"""SELECT event_type, {j} AS j, {col_sql(j, 'user_id')} AS c
            FROM events WHERE event_type IN ('view', 'purchase')"""
        for j in range(CMS_D)
    )
    return f"""
WITH cells AS ({cells}),
cnt AS MATERIALIZED (
    SELECT event_type, j, c, count(*) AS n FROM cells GROUP BY 1, 2, 3
),
ip AS (
    SELECT a.j, CAST(sum(a.n * b.n) AS BIGINT) AS ip
    FROM (SELECT j, c, n FROM cnt WHERE event_type = 'view') a
    JOIN (SELECT j, c, n FROM cnt WHERE event_type = 'purchase') b
      ON a.j = b.j AND a.c = b.c
    GROUP BY a.j
),
est AS (SELECT CAST(min(ip) AS BIGINT) AS cms_est FROM ip),
truth AS (
    SELECT CAST(sum(v * p) AS BIGINT) AS true_join_size
    FROM (
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'view') AS v,
               count(*) FILTER (WHERE event_type = 'purchase') AS p
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id
    )
)
SELECT true_join_size, cms_est,
       cms_est >= true_join_size AS never_undercounts
FROM truth CROSS JOIN est
"""


@query("sketch_cms_join_size", oracle=_cms_join_oracle())
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE estimation from Count-Min sketches: |views ⋈
    purchases on user| estimated as minⱼ Σ_c cA[j][c]·cB[j][c] — the
    AMS/CMS inner-product identity query optimizers use to predict a
    join's output cardinality from per-relation kilobyte sketches
    BEFORE paying for the join (each row's inner product
    over-estimates, so the min keeps CMS's one-sided guarantee,
    emitted as a checked boolean beside the exact Σ fA·fB truth).

    Scale shape: BOTH sides' sketches build in one pass over the
    filtered stream (cells keyed by (side, row, counter),
    partial-aggregated, checkpointed); the inner product joins two
    d×w count sets (768 rows each); the exact truth is the audit —
    the production use carries only sketches, no raw-data join."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )

    def cms_col(j: int):
        return md5_int60(
            F.concat(F.lit(f"cms{j}-"), F.col("user_id").cast("string"))
        ) % CMS_W

    cells = ev.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), cms_col(j).alias("c"))
                    for j in range(CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("event_type", "cell.j", "cell.c")
    cnt = (
        cells.groupBy("event_type", "j", "c")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    a = cnt.filter(F.col("event_type") == "view").select(
        "j", "c", F.col("n").alias("na")
    )
    b = cnt.filter(F.col("event_type") == "purchase").select(
        "j", "c", F.col("n").alias("nb")
    )
    est = (
        a.join(b, ["j", "c"])
        .groupBy("j")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("ip"))
        .agg(F.min("ip").cast("bigint").alias("cms_est"))
    )
    truth = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("v"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
        )
        .agg(
            F.sum(F.col("v") * F.col("p")).cast("bigint").alias(
                "true_join_size"
            )
        )
    )
    return truth.join(F.broadcast(est)).select(
        "true_join_size",
        "cms_est",
        (F.col("cms_est") >= F.col("true_join_size")).alias(
            "never_undercounts"
        ),
    )


# --------------------------------------------------------------------------
#: KMV sketch size: k smallest distinct hash values retained.  The
#: estimator's relative standard error is ~1/sqrt(k-2) ≈ 6.3% at 256;
#: the oracle pins the ESTIMATE bit-exactly (same md5-derived order
#: statistics on both engines), and within_bound additionally asserts
#: the estimate landed inside 4 standard errors of the exact count.
KMV_K = 256
#: 2^60 — the md5_int60 hash domain size (15 hex chars).
KMV_DOMAIN = float(1 << 60)


def _kmv_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    h = md5_int60_sql("CAST(o_custkey AS VARCHAR)")
    return f"""
WITH hs AS (SELECT DISTINCT {h} AS h FROM orders),
bk AS (SELECT h FROM hs ORDER BY h LIMIT {KMV_K}),
kt AS (SELECT max(h) AS h_k, count(*) AS k_used FROM bk),
ex AS (SELECT count(DISTINCT o_custkey) AS n_exact FROM orders)
SELECT CAST(k_used AS BIGINT) AS k_used, h_k AS kth_min_hash,
       round(CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
                  ELSE (k_used - 1) * {KMV_DOMAIN!r} / h_k END, 2)
           AS kmv_est,
       n_exact,
       round(abs(CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
                      ELSE (k_used - 1) * {KMV_DOMAIN!r} / h_k END
                 - n_exact) / nullif(n_exact, 0), 4) AS rel_err,
       abs(CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
                ELSE (k_used - 1) * {KMV_DOMAIN!r} / h_k END
           - n_exact) / nullif(n_exact, 0) <= 0.25 AS within_bound
FROM kt CROSS JOIN ex
"""


@query("sketch_kmv_distinct", oracle=_kmv_oracle())
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    the bottom-k formulation of Beyer et al. 2007): keep the KMV_K
    smallest distinct hash values; est = (k-1) * DOMAIN / h_(k).
    Completes the mergeable-summary family with the ORDER-STATISTICS
    sketch: two KMV sets union by merge-and-truncate (keep the k
    smallest of the union), so per-source / per-day sketches roll up
    without rescanning — and unlike HLL, KMV supports set
    INTERSECTION estimates natively (the k smallest of the union are
    a uniform sample of the union).

    Determinism: every order statistic is an exact md5-derived
    integer, the estimator is one double expression over a 1-row
    fold — bit-identical cross-engine (no float accumulation).

    Scale shape: the hash projection is map-side; the distinct
    collapses via partial aggregation (each map task emits its local
    distinct hash set once); the bottom-k is TakeOrderedAndProject —
    a bounded k-element heap per partition merged on the driver,
    never a global sort.  A production rollup keeps only the k-hash
    set per shard (mergeable); the exact-count arm here exists to
    AUDIT the estimator and shares the scan."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    od = _t(spark, sf_dir, "orders")
    hs = od.select(
        md5_int60(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    bk = hs.orderBy("h").limit(KMV_K)
    kt = bk.agg(
        F.max("h").alias("h_k"), F.count(F.lit(1)).alias("k_used")
    )
    ex = od.agg(F.count_distinct("o_custkey").alias("n_exact"))
    est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise((F.col("k_used") - 1) * F.lit(KMV_DOMAIN) / F.col("h_k"))
    # empty input: n_exact = 0 — rel/within_bound NULL on both
    # engines via mirrored nullif (zero-row audit, round 10)
    rel = F.abs(est - F.col("n_exact")) / F.nullif(
        F.col("n_exact"), F.lit(0)
    )
    return kt.join(F.broadcast(ex)).select(
        F.col("k_used").cast("bigint").alias("k_used"),
        F.col("h_k").alias("kth_min_hash"),
        F.round(est, 2).alias("kmv_est"),
        "n_exact",
        F.round(rel, 4).alias("rel_err"),
        (rel <= 0.25).alias("within_bound"),
    )


# --------------------------------------------------------------------------
def _kmv_jaccard_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    h = md5_int60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH uh AS (
    SELECT DISTINCT event_type, {h} AS h FROM events
),
nt AS (SELECT event_type, count(*) AS n FROM uh GROUP BY event_type),
sig AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM uh
    ) WHERE rn <= {KMV_K}
),
pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb, a.n AS n_a, b.n AS n_b
    FROM nt a JOIN nt b ON a.event_type < b.event_type
),
inter AS (
    SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS i
    FROM uh a JOIN uh b ON a.h = b.h AND a.event_type < b.event_type
    GROUP BY 1, 2
),
u AS (
    SELECT p.ta, p.tb, s.h,
           max(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS ia,
           max(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS ib
    FROM pairs p JOIN sig s ON s.event_type IN (p.ta, p.tb)
    GROUP BY 1, 2, 3
),
topk AS (
    SELECT ta, tb, ia, ib FROM (
        SELECT ta, tb, ia, ib,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM u
    ) WHERE rn <= {KMV_K}
),
est AS (
    SELECT ta, tb, count(*) AS k_used,
           CAST(sum(ia * ib) AS BIGINT) AS it
    FROM topk GROUP BY 1, 2
)
SELECT p.ta AS type_a, p.tb AS type_b,
       CAST(p.n_a AS BIGINT) AS n_users_a,
       CAST(p.n_b AS BIGINT) AS n_users_b,
       CAST(coalesce(i.i, 0) AS BIGINT) AS inter_exact,
       round(CAST(coalesce(i.i, 0) AS DOUBLE)
             / (p.n_a + p.n_b - coalesce(i.i, 0)), 6) AS jaccard_exact,
       round(CAST(e.it AS DOUBLE) / e.k_used, 6) AS kmv_jaccard_est,
       round(abs(CAST(e.it AS DOUBLE) / e.k_used
                 - CAST(coalesce(i.i, 0) AS DOUBLE)
                   / (p.n_a + p.n_b - coalesce(i.i, 0))), 6) AS abs_err,
       abs(CAST(e.it AS DOUBLE) / e.k_used
           - CAST(coalesce(i.i, 0) AS DOUBLE)
             / (p.n_a + p.n_b - coalesce(i.i, 0))) <= 0.2 AS within_bound
FROM pairs p
LEFT JOIN inter i ON p.ta = i.ta AND p.tb = i.tb
JOIN est e ON p.ta = e.ta AND p.tb = e.tb
"""


@query("sketch_kmv_jaccard", oracle=_kmv_jaccard_oracle())
def sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard similarity of per-event-type user sets via
    KMV bottom-k signatures (Beyer et al. 2007: the k smallest
    hashes of A ∪ B are a uniform sample of the union, so the
    fraction of them present in BOTH sets estimates J(A,B)) — the
    set-INTERSECTION capability HLL cannot provide, and the reason
    sketch_kmv_distinct's order-statistics family earns its place:
    per-segment user sketches roll up into overlap matrices without
    rescanning raw events.  An exact-Jaccard arm audits the estimate
    (the sketch_hll_distinct pattern: the bound boolean hashes).

    Determinism: signatures are exact md5-order statistics; the
    estimate is a ratio of exact integers — no float accumulation.

    Scale shape: the distinct (type, user-hash) projection partial-
    aggregates into ONE materialized pass reused by all three
    branches (counts, exact-intersection self-join on the hash,
    signatures).  Per-type bottom-k rides the InferWindowGroupLimit
    rewrite (bounded k-heap per task BEFORE the shuffle — the
    ev_top_users plan pin); everything downstream of the signatures
    operates on ≤ types·k rows.  The exact arm's self-join shuffles
    on the 60-bit hash (no hot keys: a hash value repeats at most
    once per type)."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")
    uh = (
        ev.select(
            "event_type",
            md5_int60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
        # three consumers (counts, self-join, signatures): pin ONE
        # evaluation of the distinct or the events scan runs thrice
        .localCheckpoint(eager=True)
    )
    nt = uh.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    sig = (
        uh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    pairs = (
        nt.alias("a")
        .join(
            # broadcast the types-grain panel: a non-equi join of two
            # unsized aggregates would otherwise plan a cartesian
            F.broadcast(nt.alias("b")),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
    )
    inter = (
        uh.alias("a")
        .join(
            uh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # union stream per pair: two broadcast equi-joins (never an
    # OR-condition nested loop), grouped to presence flags
    rep = sig.join(F.broadcast(pairs), sig.event_type == pairs.ta).union(
        sig.join(F.broadcast(pairs), sig.event_type == pairs.tb)
    )
    u = rep.groupBy("ta", "tb", "h").agg(
        F.max(
            F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)
        ).alias("ia"),
        F.max(
            F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)
        ).alias("ib"),
    )
    wp = Window.partitionBy("ta", "tb").orderBy("h")
    est = (
        u.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.sum(F.col("ia") * F.col("ib")).cast("bigint").alias("it"),
        )
    )
    i0 = F.coalesce(F.col("i"), F.lit(0))
    j_exact = i0.cast("double") / (F.col("n_a") + F.col("n_b") - i0)
    j_est = F.col("it").cast("double") / F.col("k_used")
    return (
        # both panels are type-pair grain (≤ types² rows): broadcast
        # them onto the pair spine instead of SMJ exchanges
        pairs.join(F.broadcast(inter), ["ta", "tb"], "left")
        .join(F.broadcast(est), ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("n_a").cast("bigint").alias("n_users_a"),
            F.col("n_b").cast("bigint").alias("n_users_b"),
            i0.cast("bigint").alias("inter_exact"),
            F.round(j_exact, 6).alias("jaccard_exact"),
            F.round(j_est, 6).alias("kmv_jaccard_est"),
            F.round(F.abs(j_est - j_exact), 6).alias("abs_err"),
            (F.abs(j_est - j_exact) <= 0.2).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
#: Linear-counting bitmap size.  LC is the SMALL-cardinality regime
#: sketch (std err ≈ √(m(e^t−t−1))/n at load t=n/m): below ~0.1·m
#: distinct values it beats HLL's ~1.04/√m noise, which is why
#: production HLLs (and Spark's own) switch to linear counting under
#: low fill.  2^16 buckets = an 8 KiB bitmap per group in a real
#: bitmap-agg rollup.
LC_M = 65536


def _linear_counting_oracle() -> str:
    from duckdb_hdfs_spark.functions.hashing import md5_int60_sql

    b = f"{md5_int60_sql('CAST(user_id AS VARCHAR)')} % {LC_M}"
    return f"""
WITH g AS (
    SELECT event_type,
           count(DISTINCT {b}) AS occupied,
           count(DISTINCT user_id) AS n_exact
    FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(occupied AS BIGINT) AS occupied_buckets,
       CAST(n_exact AS BIGINT) AS n_exact,
       round({LC_M} * ln(CAST({LC_M} AS DOUBLE)
                         / nullif({LC_M} - occupied, 0)), 2) AS lc_est,
       round(abs({LC_M} * ln(CAST({LC_M} AS DOUBLE)
                             / nullif({LC_M} - occupied, 0)) - n_exact)
             / n_exact, 4) AS rel_err,
       abs({LC_M} * ln(CAST({LC_M} AS DOUBLE)
                       / nullif({LC_M} - occupied, 0)) - n_exact)
           / n_exact <= 0.05 AS within_bound
FROM g
"""


@query("sketch_linear_counting", oracle=_linear_counting_oracle())
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (probabilistic) counting per event type (round 9;
    Whang et al. 1990): hash each user into an LC_M-bucket bitmap and
    estimate n̂ = −m·ln(V) from the empty fraction V — the
    SMALL-cardinality regime estimator that completes the
    distinct-count ladder (exact → HLL's 1.04/√m at scale → KMV's
    order statistics → LC when the fill is low, exactly the regime
    where production HLLs themselves switch to linear counting).
    The exact arm shares the scan and audits the estimate.

    Determinism: bucket occupancy is exact integer set arithmetic on
    md5-derived buckets; the estimator is one ln of an identical
    rational double, rounded on both engines; the saturated-bitmap
    degenerate (V=0) NULLs through a mirrored nullif.

    Scale shape: one partial-aggregated shuffle (each map task emits
    its local distinct (type, bucket) pairs once — at most m per type
    per task, the bitmap-union property that makes LC mergeable); a
    production rollup would carry the 8 KiB bitmap itself via
    bit_or aggregation, byte-identical semantics."""
    from duckdb_hdfs_spark.functions.hashing import md5_int60

    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count_distinct(
            md5_int60(F.col("user_id").cast("string")) % LC_M
        ).alias("occupied"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    est = F.lit(float(LC_M)) * F.log(
        F.lit(float(LC_M))
        / F.nullif((F.lit(LC_M) - F.col("occupied")).cast("double"), F.lit(0.0))
    )
    rel = F.abs(est - F.col("n_exact")) / F.col("n_exact")
    return g.select(
        "event_type",
        F.col("occupied").cast("bigint").alias("occupied_buckets"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(est, 2).alias("lc_est"),
        F.round(rel, 4).alias("rel_err"),
        (rel <= 0.05).alias("within_bound"),
    )
