"""Round-3 LLM-data-pipeline additions (SURVEY.md §2.11): repetition
signals, benchmark contamination, prefix-fingerprint dedup, filtered
ANN, and int8 embedding quantization — the remaining passes a
training-data curation pipeline runs that §2.5-2.7 did not yet cover.

All are oracle-checked.  Round 4 rotated this module's keys into
the driver's 50-entry CORRECTNESS window (queries/__init__.py
_DRIVER_PRIORITY); the sf0.001/sf0.01 pytest sweep covers them every
round regardless.

Scale notes per query are in the docstrings; the common theme is
map-only per-document feature extraction (zero shuffle) and
broadcast-bounded joins for the set-membership passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_hdfs_spark.functions.hashing import (
    md5_int60,
    md5_int60_sql,
    tokens,
    tokens_sql,
    word_kgrams,
    word_shingles,
    word_shingles_sql,
)
from duckdb_hdfs_spark.functions.text import quality_score, quality_score_sql
from duckdb_hdfs_spark.functions.vectors import cosine_sql
from duckdb_hdfs_spark.operators.similarity import brute_topk
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t

_TOKS = tokens_sql("text")

# DuckDB mirror of word_kgrams(toks, k) (functions/hashing.py:60):
# unconditional single-space joins with ''-coalesced out-of-range
# tails, n = greatest(len - (k-1), 1) — the same construction the
# text_fingerprint oracle uses, probe-verified bit-identical.
_G2 = "tk[i] || ' ' || coalesce(tk[i+1], '')"
_G3 = "tk[i] || ' ' || coalesce(tk[i+1], '') || ' ' || coalesce(tk[i+2], '')"


def _dup_frac(arr):
    """1 - distinct/total over an array column, rounded — the Gopher-
    style duplicate-fraction repetition signal."""
    return F.round(
        1.0 - F.size(F.array_distinct(arr)).cast("double") / F.size(arr), 4
    )


# --------------------------------------------------------------------------
@query(
    "text_repetition",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents WHERE text IS NOT NULL),
g AS (
    SELECT doc_id, tk,
           list_transform(generate_series(1, greatest(len(tk) - 1, 1)),
                          i -> {_G2}) AS g2,
           list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
                          i -> {_G3}) AS g3
    FROM t
)
SELECT doc_id, len(tk) AS n_tokens,
       round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 4)
           AS dup_word_frac,
       round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 4)
           AS dup_2gram_frac,
       round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 4)
           AS dup_3gram_frac
FROM g
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: duplicate word / 2-gram /
    3-gram fractions (the Gopher repetition filters).  A document
    whose token stream is mostly repeats is boilerplate or spam.

    Scale: pure map work over the documents scan — zero shuffle, all
    JVM-side array expressions, trivially linear at 100 TB."""
    # NULL text excluded on both engines (NULL-injection audit r9):
    # 0/0 n-gram fractions otherwise diverge NaN-vs-NULL cross-engine
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        _dup_frac(toks).alias("dup_word_frac"),
        _dup_frac(word_kgrams(toks, 2)).alias("dup_2gram_frac"),
        _dup_frac(word_kgrams(toks, 3)).alias("dup_3gram_frac"),
    )


# --------------------------------------------------------------------------
@query(
    "text_contamination",
    oracle=f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
g AS (
    SELECT doc_id, source,
           list_distinct(list_transform(
               generate_series(1, greatest(len(tk) - 2, 1)), i -> {_G3}))
               AS grams
    FROM t
),
bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
          WHERE source = 'src0'),
cand AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
         FROM g WHERE source <> 'src0')
SELECT cand.doc_id, any_value(n_grams) AS n_grams,
       count(b.gram) AS n_contaminated,
       round(CAST(count(b.gram) AS DOUBLE) / any_value(n_grams), 4)
           AS contamination
FROM cand LEFT JOIN bench b ON cand.gram = b.gram
GROUP BY cand.doc_id
""",
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each candidate
    document's distinct word 3-grams that appear anywhere in the
    held-out set (source = 'src0' stands in for the eval benchmark).
    The decontamination pass every training corpus needs before a
    model ships.

    Scale: the benchmark gram set is DISTINCT-reduced and broadcast
    (eval benchmarks are tiny next to a 100 TB corpus); candidates
    explode their distinct grams map-side, probe the broadcast set,
    and reduce per doc_id with map-side partial counts — one shuffle
    on doc_id, no corpus self-join."""
    docs = _t(spark, sf_dir, "documents")
    grams = F.array_distinct(word_kgrams(tokens(F.col("text")), 3))
    base = docs.select("doc_id", "source", grams.alias("grams"))
    # no-infer explodes (round-11 scan-filter sweep): the inferred
    # size(grams)>0 filters were re-evaluating the full tokenize+
    # 3-gram build inside BOTH parquet scans' DataFilters; gram
    # arrays are never empty (word_kgrams pads to ≥1) and never hold
    # NULL elements, so outer+filter is row-identical
    from duckdb_hdfs_spark.operators.genutil import explode_nonnull_elems

    bench = (
        explode_nonnull_elems(
            base.filter(F.col("source") == "src0"), F.col("grams"), "gram"
        )
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = explode_nonnull_elems(
        base.filter(F.col("source") != "src0"),
        F.col("grams"),
        "gram",
        "doc_id",
        F.size("grams").alias("n_grams"),
    )
    return (
        cand.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id", "n_grams")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"))
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_grams"), 4
            ).alias("contamination"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "dedup_prefix_groups",
    oracle=f"""
WITH t AS (
    SELECT doc_id, source,
           md5(array_to_string(list_slice({_TOKS}, 1, 8), ' ')) AS prefix_hash
    FROM documents WHERE text IS NOT NULL
)
SELECT prefix_hash, count(*) AS n_docs,
       count(DISTINCT source) AS n_sources, min(doc_id) AS min_doc_id
FROM t GROUP BY prefix_hash HAVING count(*) > 1
""",
)
def dedup_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dedup: documents sharing the same first-8-
    token prefix (md5-keyed) — the cheap head-dedup pass that catches
    boilerplate headers and mirrored articles before the expensive
    MinHash stage.

    Scale: one md5 per document map-side, one hash-partitioned
    group-by on the 16-byte key with map-side partial aggregation —
    the same single-shuffle shape as dedup_exact."""
    # NULL text excluded symmetrically (NULL-injection audit r9):
    # Spark concat_ws coerces a NULL token array to '' (md5('')
    # group) while the oracle's array_to_string yields NULL
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    prefix = F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8))
    return (
        docs.select(
            F.md5(prefix).alias("prefix_hash"), "source", "doc_id"
        )
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
@query(
    "sim_ann_filtered",
    oracle=f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
           WHERE vec_id % 100 = 0),
scored AS (
    SELECT p.probe_id, c.vec_id,
           {cosine_sql('p.pe', 'c.embedding')} AS cos_raw
    FROM (SELECT * FROM embeddings WHERE label < 3) c, p
    WHERE c.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, round(cos_raw, 6) AS cos_sim, rk
FROM (
    SELECT probe_id, vec_id, cos_raw,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos_raw DESC, vec_id) AS rk
    FROM scored
) t WHERE rk <= 3
""",
)
def sim_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered similarity search: exact top-3 neighbors restricted
    to a metadata predicate (label < 3) — the "search within a
    namespace/filter" query every vector store serves.

    Scale: the predicate is applied BEFORE scoring, so it pushes to
    the parquet scan (PushedFilters) and shrinks the scored corpus ~
    3/10; then the standard broadcast-probes + per-partition partial
    top-k shape (operators/similarity.py:_topk_merge) — no full
    score-set shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0).select("vec_id", "embedding")
    corpus = emb.filter(F.col("label") < 3)
    return brute_topk(probes, corpus, k=3, exclude_self=True)


# --------------------------------------------------------------------------
_Q_SQL = quality_score_sql("text", _TOKS)
_DUPF_SQL = f"1.0 - CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})"


@query(
    "pipeline_quality_filter",
    oracle=f"""
WITH m AS (
    SELECT doc_id, len({_TOKS}) AS n_tokens,
           {_DUPF_SQL} AS dupf, {_Q_SQL} AS q
    FROM documents
)
SELECT doc_id,
       CASE WHEN n_tokens < 16 THEN 'too_short'
            WHEN dupf > 0.65 THEN 'repetitive'
            WHEN q < 0.7 THEN 'low_quality'
            ELSE 'ok' END AS reason,
       CASE WHEN n_tokens >= 16 AND dupf <= 0.65 AND q >= 0.7
            THEN TRUE ELSE FALSE END AS keep
FROM m
""",
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation decision: compose the cheap per-document
    signals (token count, duplicate-word fraction, composite quality)
    into a keep/drop verdict with a reason code — the materialized
    filter pass a corpus pipeline writes before training, and the
    audit trail reviewers read ("why was this dropped?").

    Scale: single map-only pass — every signal derives from one token
    split, zero shuffles; at 100 TB this is scan-bound."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    m = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "dupf"
        ),
        quality_score(F.col("text"), toks).alias("q"),
    )
    reason = (
        F.when(F.col("n_tokens") < 16, "too_short")
        .when(F.col("dupf") > 0.65, "repetitive")
        .when(F.col("q") < 0.7, "low_quality")
        .otherwise("ok")
    )
    return m.select(
        "doc_id",
        reason.alias("reason"),
        (
            (F.col("n_tokens") >= 16) & (F.col("dupf") <= 0.65) & (F.col("q") >= 0.7)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
@query(
    "emb_kmeans_update",
    oracle=f"""
WITH cents AS (
    -- NULL embeddings excluded symmetrically from seed and corpus
    -- (all-NULL audit, round 10)
    SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
    WHERE embedding IS NOT NULL
    ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
),
assign AS (
    SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cent')} DESC,
                            c.cent_id) AS crk
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e,
             cents c
    ) WHERE crk = 1
)
SELECT cent_id, CAST(i AS BIGINT) AS dim, count(*) AS n_members,
       round(CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                          AS DECIMAL(12,6))) AS DOUBLE) / count(*), 6)
           AS mean_val
FROM assign, generate_series(1, 8) t(i)
GROUP BY cent_id, i
""",
)
def emb_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means (k=8, cosine assignment), the
    building block of embedding clustering / IVF index training:
    deterministic md5-ordered centroid seed, argmax-cosine assignment,
    distributed per-dimension mean update (first 8 dims emitted in
    long form to keep the audit result compact).

    Scale: the broadcast-codebook argmax (operators/similarity.py
    ``assign_nearest``) scores all k centroids per vector inside a
    map-side transform — NO corpus-keyed Exchange for the assignment
    (the previous join + max-struct groupBy shuffled one row per
    vector just to take the argmax); the mean update shuffles
    (k × dims) partial sums.  No partition-less window, no corpus
    self-join; iterating = re-running with the output means as the
    next seed."""
    from duckdb_hdfs_spark.functions.vectors import norm
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy
    from duckdb_hdfs_spark.operators.similarity import (
        assign_nearest,
        centroid_codebook,
    )

    emb = _t(spark, sf_dir, "embeddings").filter(
        # NULL vectors excluded symmetrically with the oracle
        # (all-NULL audit, round 10)
        F.col("embedding").isNotNull()
    )
    v = rebalance_cpu_heavy(emb.select("vec_id", "embedding")).withColumn(
        "_n", norm(F.col("embedding"))
    )
    assigned = assign_nearest(
        v, centroid_codebook(emb, 8), "embedding", "_n", top=1
    )
    sliced = assigned.select(
        "cent_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val")
    )
    # decimal-mean recipe (emb_dim_variance): round each element to
    # 6dp, sum EXACTLY in decimal, divide in double — a raw
    # avg(double) partial-aggregates in engine-dependent order and can
    # flip the rounded hash at a .5e-6 boundary (round-7 review)
    dec = F.round(F.col("val").cast("double"), 6).cast("decimal(12,6)")
    n = F.count(F.lit(1))
    return (
        sliced.groupBy("cent_id", (F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(
            n.alias("n_members"),
            F.round(F.sum(dec).cast("double") / n, 6).alias("mean_val"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "skew_salted_event_stats",
    oracle="""
SELECT event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(28,6))), 4) AS DOUBLE)
           AS sum_value,
       round(max(value), 4) AS max_value
FROM events GROUP BY event_type
""",
)
def skew_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation through the driver contract: per-type
    event stats via the salted two-stage aggregate
    (operators/skew.py:salted_agg, 16 salt shards).  event_type has
    only 5 values — exactly the degenerate-key shape where a plain
    groupBy funnels ~20% of a 100 TB stream through one reducer; the
    salt spreads each key over 16 reducers and a second aggregate over
    5x16 tiny rows merges the partials.  The decimal value sum makes
    the two-stage result bit-equal to the one-stage oracle."""
    from duckdb_hdfs_spark.operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs=[
            ("n_events", F.count(F.lit(1)), "sum"),
            ("sum_dec", F.sum(F.col("value").cast("decimal(28,6)")), "sum"),
            ("max_value", F.max("value"), "max"),
        ],
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_dec"), 4).cast("double").alias("sum_value"),
        F.round(F.col("max_value"), 4).alias("max_value"),
    )


# --------------------------------------------------------------------------
@query(
    "text_tfidf_topk",
    headline=True,
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM tok WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, term, tf, df,
           round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS score
    FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
    ) AS rank
    FROM scored
)
WHERE rank <= 3
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic distributed
    keyword-extraction pass (smoothed idf = ln((N+1)/(df+1)) + 1).

    Scale shape: explode is map-side; the (doc_id, term) and term
    group-bys both partial-aggregate before their shuffles, so the
    hot stopword keys arrive at reducers as one partial row per map
    task, not one row per occurrence.  The tf⋈df join shuffles on
    term (AQE splits the heavy-tail vocab keys); document count N is
    a broadcast 1-row aggregate inside the plan (row-group-metadata
    count — no separate driver action or per-row work).  The
    final top-k window partitions by doc_id — bounded by per-document
    vocabulary, never by corpus size.  Ranking orders on the ROUNDED
    score with a term tie-break so Spark and the oracle rank
    identically despite last-ulp ln() differences.

    Considered and REJECTED (round 7): computing df as
    ``count(*) over (partition by term)`` instead of the groupBy+join
    measures ~20% faster at sf0.1 (0.65s vs 0.82s, fewer exchanges)
    but funnels every tf row of a stopword term through ONE window
    task — WindowExec cannot split a partition, so a term appearing
    in most of a 10¹¹-document corpus serializes ~N_docs rows in one
    task.  The join shape keeps df map-side partial-aggregated (one
    row per hot term per map task) and lets AQE split the skewed
    join key — slower by a constant at toy scale, correct at 100 TB.

    Rebalance history: round 11 measured the DEFAULT-grade rebalance
    (24 KiB/slot) slower at sf0.1 (1.13 → 1.32s interleaved — 10
    slots of sub-100ms tokenize work lose to scheduling + shuffling
    the raw text); the round-12 sf1.0 stage profile then showed the
    flip side: at 10× volume the tokenize runs ~2s on the scan's 2
    splits, twice (both branches — see the df note below).  The
    resolution is a COARSER per-site grade (256 KiB/slot): still a
    no-op at sf0.1 and below (preserving the round-11 result), ~10
    slots at sf1.0 (5.2 → 3.7s measured; the residual is a
    CPU-dense 17 MB shuffle AQE coalesces by BYTES — an
    advisoryPartitionSizeInBytes=1m A/B measured no set-level win
    under the tuned session, so the coalesce stays), and at 100 TB
    a no-op like every rebalance (splits >> cores)."""
    from pyspark.sql import Window

    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy

    docs = _t(spark, sf_dir, "documents")
    docs_rb = rebalance_cpu_heavy(
        docs.select("doc_id", "text"), bytes_per_slot=256 << 10
    )
    # document count folded into the plan as a broadcast 1-row
    # aggregate (row-group-metadata count) — not a separate driver
    # count() action/job
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs_rb.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # NOTE (round 12, sf1.0 stage profile): the df branch RE-SCANS the
    # corpus — Catalyst rewrites its inner aggregate to a keys-only
    # distinct (functions=[]), so its (doc_id, term) exchange is
    # canonically different from the tf branch's and ReusedExchange
    # can never fire; count("tf") instead of count(*) was tried and
    # gets the same distinct rewrite.  Forcing reuse would mean
    # materializing tf (a doc×term-grain checkpoint — comparable bytes
    # to the corpus itself; worse than the second scan it saves).  The
    # second scan is accepted and made cheap the same way as the
    # first: the graded rebalance above spreads BOTH branches'
    # tokenize off the scan's split count.
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# --------------------------------------------------------------------------
_ABS_D = "list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))"
_QERR = (
    "list_max(list_transform(generate_series(1, len(embedding)), i -> "
    "abs(CAST(embedding[i] AS DOUBLE) "
    "- floor(CAST(embedding[i] AS DOUBLE) * 127.0 / scale + 0.5) "
    "* scale / 127.0)))"
)


@query(
    "emb_int8_quantize",
    oracle=f"""
WITH s AS (
    SELECT label, list_max({_ABS_D}) AS scale, embedding FROM embeddings
),
e AS (SELECT label, scale, {_QERR} AS max_err FROM s)
SELECT label, count(*) AS n_vecs,
       round(CAST(sum(CAST(round(scale, 6) AS DECIMAL(12,6)))
                  AS DOUBLE) / count(*), 6) AS mean_scale,
       round(CAST(sum(CAST(round(max_err, 6) AS DECIMAL(12,6)))
                  AS DOUBLE) / count(*), 6) AS mean_max_err,
       round(max(max_err), 6) AS worst_err
FROM e GROUP BY label
""",
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization error audit: per-vector max-abs
    scale, q = round(x·127/scale), reconstruction error = |x −
    q·scale/127|; per-label mean/worst error — the accuracy gate
    before shipping a quantized ANN index (4× smaller, 4× faster
    dot products).

    Scale: map-only per-vector array math (scale computed once per
    row in a prior projection, NOT inside the lambda — an outer
    aggregate referenced inside a higher-order-function lambda is
    re-evaluated per element), then one partial-aggregated group-by
    on the 10-value label key."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    scale = F.array_max(F.transform(e, lambda x: F.abs(x.cast("double"))))
    s = emb.select("label", e, scale.alias("scale"))
    sc = F.col("scale")
    max_err = F.array_max(
        F.zip_with(
            e,
            F.transform(e, lambda x: F.floor(x.cast("double") * 127.0 / sc + 0.5)),
            lambda x, q: F.abs(x.cast("double") - q * sc / 127.0),
        )
    )
    # decimal-mean recipe — see emb_kmeans_update / emb_dim_variance
    # (a raw avg(double) is order-dependent and can flip the rounded
    # hash at a .5e-6 boundary; round-7 review)
    dec = lambda c: F.round(F.col(c), 6).cast("decimal(12,6)")
    n = F.count(F.lit(1))
    return (
        s.select("label", "scale", max_err.alias("max_err"))
        .groupBy("label")
        .agg(
            n.alias("n_vecs"),
            F.round(F.sum(dec("scale")).cast("double") / n, 6).alias(
                "mean_scale"
            ),
            F.round(F.sum(dec("max_err")).cast("double") / n, 6).alias(
                "mean_max_err"
            ),
            F.round(F.max("max_err"), 6).alias("worst_err"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "text_span_dedup",
    oracle=f"""
WITH tk AS (
    SELECT doc_id, {tokens_sql("text")} AS tk FROM documents
), sh AS (
    SELECT doc_id, {word_shingles_sql("tk", 3)} AS gs FROM tk
), ex AS (
    SELECT doc_id, {md5_int60_sql("g")} AS h
    FROM (SELECT doc_id, unnest(gs) AS g FROM sh)
), counts AS (
    SELECT h, count(*) AS ndocs FROM ex GROUP BY h
)
SELECT doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       round(CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dup_frac
FROM ex JOIN counts USING (h)
GROUP BY doc_id
""",
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span profile: for each document, the
    fraction of its distinct word 3-gram spans that occur in at least
    one OTHER place in the corpus — the exact-substring duplication
    signal behind span-level train-set dedup (cf. "Deduplicating
    Training Data Makes Language Models Better": repeated spans get
    memorized disproportionately).

    Scale shape: spans explode map-side and hash to 60-bit ints
    (bounded width, no string shuffle); the span-frequency group-by
    partial-aggregates before its shuffle, so a span repeated a
    million times arrives at its reducer as one partial count per map
    task.  The frequency join back to the exploded spans shuffles on
    the same hash key (AQE splits heavy boilerplate spans); the final
    per-document rollup is bounded by per-doc vocabulary.  No
    self-join, no all-pairs — linear in corpus size."""
    from duckdb_hdfs_spark.operators.genutil import explode_nonnull_elems

    docs = _t(spark, sf_dir, "documents")
    # explode WITHOUT the inferred size()>0 filter re-evaluating the
    # whole tokenize+shingle build a second time in the scan stage
    # (round 11, operators/genutil.py; shingle elements never NULL)
    ex = explode_nonnull_elems(
        docs, word_shingles(tokens(F.col("text")), 3), "g", "doc_id"
    ).select("doc_id", md5_int60(F.col("g")).alias("h"))
    counts = ex.groupBy("h").agg(F.count(F.lit(1)).alias("ndocs"))
    return (
        ex.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("ndocs") >= 2).cast("long")).alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.round(
                F.col("n_dup_spans").cast("double") / F.col("n_spans"), 4
            ).alias("dup_frac"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "emb_gram_matrix",
    oracle="""
WITH u AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       CAST(round(sum(CAST(a.x * b.x AS DECIMAL(27,12))), 4) AS DOUBLE) AS g
FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
""",
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix Σ x·xᵀ over the embedding corpus — the
    accumulation step behind PCA / whitening of embedding spaces
    (d=64 → 2080 upper-triangle cells).  1-based (i, j) indices.

    Scale shape: the d(d+1)/2 per-row products are built MAP-SIDE by
    one nested-transform expression over the array column (no join,
    no second scan — DuckDB's oracle self-join is the semantic spec,
    not the plan); hash partial aggregation collapses each map task's
    contribution to one 2080-row partial BEFORE the only shuffle, so
    the exchange moves d²·n_partitions rows regardless of corpus
    size.  Decimal(27,12) accumulation keeps the sum order-
    independent — the IEEE per-element products are bit-identical
    across engines, the decimal add is associative-exact."""
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy

    # d(d+1)/2 products per row is the CPU-dense map phase; spread the
    # single-row-group scan before it (guide §2.5; no-op at 100 TB
    # where splits >> cores).  Partial agg still collapses each task
    # to ≤2080 cells before the one exchange.
    e = rebalance_cpu_heavy(
        _t(spark, sf_dir, "embeddings").select("embedding")
    )
    cells = e.select(
        F.explode(
            F.expr(
                """
                flatten(transform(embedding, (x, i) ->
                    transform(slice(embedding, i + 1, size(embedding) - i),
                              (y, j) ->
                        struct(i + 1 AS i, i + 1 + j AS j,
                               CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))
                """
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.p")
    return cells.groupBy("i", "j").agg(
        F.round(F.sum(F.col("p").cast("decimal(27,12)")), 4)
        .cast("double")
        .alias("g")
    )


# --------------------------------------------------------------------------
@query(
    "bpe_pair_counts",
    oracle=f"""
WITH t AS (SELECT {_TOKS} AS tk FROM documents),
g AS (
    SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i + 1])) AS pair
    FROM t WHERE len(tk) >= 2
)
SELECT pair, count(*) AS cnt
FROM g GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 20
""",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration's statistics pass: corpus-wide
    adjacent-token-pair frequencies, top-20 by (count desc, pair asc)
    — the merge-candidate ranking a distributed tokenizer trainer
    computes each round (Sennrich et al. 2016, alg. 1 inner loop).

    Scale shape: pairs are built map-side by the zip-with k-gram
    construction (word_kgrams, k=2 — exactly len-1 adjacent pairs,
    no tail sentinel for len≥2), partial-aggregated before the one
    count shuffle, and the global top-20 runs as
    TakeOrderedAndProject (per-partition heap + driver merge of 20-
    row heaps — never a global sort of the pair vocabulary)."""
    docs = _t(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    pairs = docs.select(tk.alias("tk")).filter(F.size("tk") >= 2).select(
        F.explode(word_kgrams(F.col("tk"), 2)).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


# --------------------------------------------------------------------------
@query(
    "time_decay_engagement",
    oracle="""
WITH m AS (SELECT CAST(max(ts) AS DATE) AS ref FROM events)
SELECT user_id,
       count(*) AS n_events,
       CAST(round(sum(CAST(
           value / (1 + date_diff('day', CAST(ts AS DATE), ref))
           AS DECIMAL(28,6))), 4) AS DOUBLE) AS decay_score
FROM events, m
GROUP BY user_id
""",
)
def time_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hyperbolically time-decayed engagement score:
    Σ value / (1 + age_days) relative to the corpus's latest event
    day — the recency-weighted activity feature ranking pipelines
    derive (hyperbolic instead of exp(-λt): pure integer+IEEE
    arithmetic, bit-identical across engines — libm exp() is not).

    Scale shape: the reference day is a 1-row aggregate broadcast
    into the scan (literal cross of a scalar — no shuffle of the
    fact side); the decayed value is a map-side expression; one
    partial-aggregated group-by on user_id.  Two scans of events
    (max + agg) — at 100 TB the max(ts) pass is a metadata-cheap
    column-statistics read under parquet min/max."""
    ev = _t(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.col("ts")).cast("date").alias("ref"))
    return (
        ev.crossJoin(F.broadcast(ref))
        .withColumn(
            "decayed",
            F.col("value")
            / (1 + F.datediff(F.col("ref"), F.col("ts").cast("date"))),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("decayed").cast("decimal(28,6)")), 4)
            .cast("double")
            .alias("decay_score"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "sample_stratified_topk",
    oracle="""
SELECT event_type, event_id, user_id, rk
FROM (
    SELECT event_type, event_id, user_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
               AS rk
    FROM events
)
WHERE rk <= 50
""",
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly 50 rows per
    event_type stratum, ranked by md5(event_id) — a seeded uniform
    draw that is reproducible across engines and runs (train/eval
    splits must be; RNG sampling is not).

    Scale shape: two-phase rank so no reducer ever sees a full
    stratum — phase 1 ranks within (stratum, 32-way md5 salt) and
    keeps ≤50 per salted group, so each of the 5·32 window tasks
    handles 1/32nd of a stratum; phase 2 re-ranks the ≤50·32
    survivors per stratum — bounded input regardless of corpus size.
    The single-window oracle is the semantic spec: both phases
    preserve the global md5 order, so survivors are identical."""
    ev = _t(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        "event_id",
        "user_id",
        F.md5(F.col("event_id").cast("string")).alias("hk"),
        (md5_int60(F.col("event_id").cast("string")) % 32).alias("salt"),
    )
    w1 = Window.partitionBy("event_type", "salt").orderBy("hk", "event_id")
    pruned = hashed.withColumn("rk1", F.row_number().over(w1)).filter(
        F.col("rk1") <= 50
    )
    w2 = Window.partitionBy("event_type").orderBy("hk", "event_id")
    return (
        pruned.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 50)
        .select("event_type", "event_id", "user_id", "rk")
    )


# --------------------------------------------------------------------------
def _gram_eigh(spark: SparkSession, sf_dir: str):
    """Distributed Gram accumulation over the embeddings table (the
    emb_gram_matrix map-side shape, unrounded) + driver-side
    eigendecomposition of the tiny d×d result.  Returns
    ``(embeddings_df, eigvals_ascending, eigvecs, d)``.  The collect
    is a d²-bounded reduced aggregate (2080 cells at d=64), not a
    data collect."""
    import numpy as np

    # NULL embeddings excluded symmetrically with the oracles
    # (all-NULL audit, round 10): a NULL vector contributes no Gram
    # cells and gets no projection on either engine
    e = _t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    cells = (
        e.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(embedding, (x, i) ->
                        transform(slice(embedding, i + 1, size(embedding) - i),
                                  (y, j) ->
                            struct(i AS i, i + j AS j,
                                   CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))
                    """
                )
            ).alias("c")
        )
        .groupBy("c.i", "c.j")
        .agg(F.sum("c.p").alias("g"))
        .collect()
    )
    # EMPTY corpus (zero-row audit, round 10): no Gram cells — every
    # consumer projects over the same empty frame, so the eigvectors'
    # VALUES are unreachable; any d wide enough for the callers'
    # component counts works.  64 is the corpus contract dim
    # (TESTDATA.md); eigh of the zero matrix gives the identity
    # basis, keeping _canonical_eigvec well-defined.
    d = (max(r["j"] for r in cells) + 1) if cells else 64
    gram = np.zeros((d, d))
    for r in cells:
        gram[r["i"], r["j"]] = r["g"]
        gram[r["j"], r["i"]] = r["g"]
    vals, vecs = np.linalg.eigh(gram)  # ascending
    return e, vals, vecs, d


def _canonical_eigvec(vecs, k: int):
    """k-th largest eigenvector with canonical sign (largest-|entry|
    component positive) — deterministic across runs/platforms."""
    import numpy as np

    v = vecs[:, -k]
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return v


def pca_projection(spark: SparkSession, sf_dir: str):
    """Top-2 PCA projection over the embeddings table: returns
    ``(proj_df, comps)`` where ``proj_df`` has columns (vec_id, label,
    pc1, pc2, norm2) and ``comps`` are the two unit eigenvectors.

    Scale split, mirroring distributed PCA practice (e.g. the
    tree-aggregated Gramian behind Spark MLlib's RowMatrix PCA):
    the d×d Gram matrix is a DISTRIBUTED single-scan partial-agg
    rollup (2080 cells at d=64 — size independent of corpus);
    eigendecomposition of that tiny symmetric matrix is driver-side
    numpy (O(d³), microseconds — collecting it is a bounded reduced
    aggregate, not a data collect); the projection back over the
    corpus is a map-only broadcast of 2 × 64 literal coefficients.
    Eigenvector signs are canonicalized (largest-|component| entry
    positive) so the output is deterministic across runs/platforms."""
    e, vals, vecs, _d = _gram_eigh(spark, sf_dir)
    comps = [_canonical_eigvec(vecs, k) for k in (1, 2)]
    proj = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.array(*[F.lit(float(c)) for c in comp]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias(f"pc{k}")
        for k, comp in ((1, comps[0]), (2, comps[1]))
    ]
    from duckdb_hdfs_spark.functions.vectors import dot

    norm2 = dot(F.col("embedding"), F.col("embedding")).alias("norm2")
    return e.select("vec_id", "label", *proj, norm2), comps


@query(
    "emb_pca_project",
    # DuckDB has no eigensolver, so the pc VALUES cannot be re-derived
    # in SQL; the driver-checkable contract is the set of algebraic
    # invariants any valid top-2 PCA must satisfy, emitted as booleans
    # computed in-plan (the `TRUE AS ok` pattern, like
    # sketch_hll_distinct).  The Gram input itself IS value-checked as
    # emb_gram_matrix; the projection's full variance contract is
    # additionally pinned in tests/test_functions_properties.py.
    oracle="""
SELECT vec_id, label, TRUE AS bessel_ok, TRUE AS var_ok, TRUE AS orth_ok
FROM embeddings WHERE embedding IS NOT NULL
""",
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection onto the top-2 principal components, emitting a
    per-row + global invariant contract the oracle can assert:

    - ``bessel_ok`` (per row): pc1² + pc2² ≤ ‖v‖² — Bessel's
      inequality for projections onto orthonormal vectors;
    - ``var_ok`` (global, broadcast 1-row aggregate): captured
      variance Σ(pc1²+pc2²) / Σ‖v‖² lies in [2/d · (1−ε), 1+ε] —
      the top-2 eigenvalues capture at least the average 2/d share
      of the Gram trace and never exceed it;
    - ``orth_ok``: the two eigenvectors are orthonormal
      (|v1·v2| ≤ 1e-9, |‖vi‖−1| ≤ 1e-9; driver-side on the 64-dim
      literals).

    The projection math (distributed Gram → driver eigh → broadcast
    map-only projection) lives in :func:`pca_projection`."""
    import numpy as np

    proj_df, comps = pca_projection(spark, sf_dir)
    # the cap aggregate AND the final per-row select both consume
    # proj_df — materialize once or the full scan + 64-element fold
    # pipeline executes twice (DataFrame reuse is plan reuse;
    # round-7 review)
    proj_df = proj_df.localCheckpoint(eager=True)
    orth_ok = bool(
        abs(float(np.dot(comps[0], comps[1]))) <= 1e-9
        and max(abs(float(np.linalg.norm(c)) - 1.0) for c in comps) <= 1e-9
    )
    energy = F.col("pc1") * F.col("pc1") + F.col("pc2") * F.col("pc2")
    cap = proj_df.agg(
        F.sum(energy).alias("cap"),
        F.sum("norm2").alias("tot"),
        F.count(F.lit(1)).alias("cnt"),
    )
    d = len(comps[0])
    # Quantization slack for the GLOBAL bound (constant-data audit,
    # round 10): each pc is round(·, 6), so a row's energy error is
    # ≤ 2·|pc|·5e-7 + O(1e-13) ≤ 1e-6·(1 + norm2) (|pc| ≤ ‖v‖ and
    # √x ≤ (1+x)/2); summed: 1e-6·(cnt + tot).  A rank-1 corpus
    # (every vector identical) drives cap/tot to exactly 1, where the
    # bare 1+1e-9 relative bound flipped var_ok on rounding alone.
    # Slack form also removes the division: an all-zero corpus
    # (tot = 0) is vacuously TRUE instead of an ANSI 0/0 raise.
    slack = F.lit(1e-6) * (F.col("cnt") + F.col("tot"))
    return (
        proj_df.join(F.broadcast(cap))
        .select(
            "vec_id",
            "label",
            # 1e-6 absolute slack absorbs the round(pc, 6) quantization
            (energy <= F.col("norm2") * (1 + 1e-9) + 1e-6).alias("bessel_ok"),
            (
                (F.col("cap") >= F.lit((2.0 / d) * (1 - 1e-9)) * F.col("tot") - slack)
                & (F.col("cap") <= F.col("tot") * (1 + 1e-9) + slack)
            ).alias("var_ok"),
            F.lit(orth_ok).alias("orth_ok"),
        )
    )


# --------------------------------------------------------------------------
WHITEN_K = 8


@query(
    "emb_whitening_check",
    # Whitening is eigen-derived like PCA, so values cannot be
    # re-derived in SQL; the contract is the DEFINING property of a
    # whitening transform, checked in-plan: the Gram matrix of the
    # whitened coordinates equals the identity.  The oracle asserts
    # the K x K upper triangle of booleans is all TRUE.
    oracle=f"""
SELECT a.i, b.j, TRUE AS cov_ok
FROM generate_series(0, {WHITEN_K - 1}) a(i)
JOIN generate_series(0, {WHITEN_K - 1}) b(j) ON b.j >= a.i
-- an EMPTY corpus has no whitening identity to assert: the Spark
-- side's verification Gram has zero cells, so the constant triangle
-- must vanish with it (zero-row audit, round 10)
WHERE EXISTS (SELECT 1 FROM embeddings WHERE embedding IS NOT NULL)
""",
)
def emb_whitening_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening onto the top-8 components, verified by its
    defining identity: the whitened coordinates w_k = <v, u_k>/√λ_k
    must satisfy  Σ_rows w_i·w_j = δ_ij  (their Gram matrix is the
    identity) — decorrelation plus unit variance, the normalization
    embedding pipelines apply before cosine retrieval or clustering.

    Scale split (same as emb_pca_project): distributed d²-bounded
    Gram → driver eigh → the whitening matrix returns as 8×64 literal
    coefficients in a map-only projection; the verification Gram of
    the whitened coords is again a single-scan partial-agg rollup
    (K(K+1)/2 = 36 cells), so the whole check is one corpus scan +
    one bounded shuffle."""
    e, vals, vecs, _d = _gram_eigh(spark, sf_dir)
    # Pseudo-inverse whitening (constant-data audit, round 10): a
    # rank-deficient corpus (e.g. every vector identical → rank 1)
    # has zero eigenvalues inside the top-K; the old 1e-300 clamp
    # produced ~1e-10 coordinates whose Gram diagonal is 0, failing
    # the δ_ij identity.  Λ⁺-whitening DROPS directions below the
    # relative cutoff (coefficient 0 → coordinate exactly 0) and the
    # expected matrix becomes diag(1 on retained, 0 on dropped) —
    # the defining identity restated for any rank, so the oracle's
    # constant TRUE triangle holds from rank 0 through full rank.
    lam_max = float(vals[-1])
    tol = max(lam_max, 0.0) * 1e-9
    comps, diag_expected = [], []
    for k in range(1, WHITEN_K + 1):
        v = _canonical_eigvec(vecs, k)
        lam = float(vals[-k])
        retained = lam > tol and tol > 0.0
        comps.append(v / lam**0.5 if retained else v * 0.0)
        diag_expected.append(1.0 if retained else 0.0)
    w = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.array(*[F.lit(float(c)) for c in comp]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for comp in comps
        ]
    )
    cells = (
        e.select(w.alias("w"))
        .select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(w, (x, i) ->
                        transform(slice(w, i + 1, size(w) - i), (y, j) ->
                            struct(i AS i, i + j AS j, x * y AS p))))
                    """
                )
            ).alias("c")
        )
        .groupBy("c.i", "c.j")
        .agg(F.sum("c.p").alias("g"))
    )
    expected = F.when(
        F.col("i") == F.col("j"),
        F.element_at(
            F.array(*[F.lit(x) for x in diag_expected]),
            F.col("i").cast("int") + 1,
        ),
    ).otherwise(F.lit(0.0))
    return cells.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        (F.abs(F.col("g") - expected) <= 1e-6).alias("cov_ok"),
    )


# --------------------------------------------------------------------------
JL_K = 16   # projected dims
JL_D = 64   # embedding dims


def _jl_signs() -> list[list[float]]:
    """±1 Johnson-Lindenstrauss sign matrix seeded from md5("jl-j-i")
    — data-independent constants computed once and inlined as
    LITERALS in both the Spark plan and the oracle SQL (the
    MINHASH_A/B pattern: any fixed matrix works; hardcoding the same
    one makes the engines agree bit-for-bit)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"jl-{j}-{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(JL_D)
        ]
        for j in range(JL_K)
    ]


def _jl_oracle() -> str:
    from duckdb_hdfs_spark.functions.vectors import dot_sql

    signs = _jl_signs()
    projs = ",\n           ".join(
        f"{dot_sql('embedding', '[' + ', '.join(str(s) for s in row) + ']')} AS p{j}"
        for j, row in enumerate(signs)
    )
    norm2 = " + ".join(f"p{j} * p{j}" for j in range(JL_K))
    return f"""
WITH p AS (
    SELECT label, {dot_sql('embedding', 'embedding')} AS n2,
           {projs}
    FROM embeddings
),
r AS (
    SELECT label, round((({norm2}) / {JL_K}.0) / n2, 6) AS ratio FROM p
)
SELECT label, count(*) AS n_vecs,
       round(CAST(sum(CAST(ratio AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6)
           AS mean_ratio,
       min(ratio) AS min_ratio,
       max(ratio) AS max_ratio
FROM r GROUP BY label
"""


@query("emb_jl_project", oracle=_jl_oracle())
def emb_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 → 16 dims with a
    ±1 sign matrix (round 5) — the cheap dimensionality cut before
    LSH/clustering when PQ is too lossy: a ±1 projection needs no
    floats in the matrix, is branch-free, and preserves norms within
    1/√k distortion.  The audit output is per-label norm-distortion
    statistics: ratio = (‖proj‖²/k) / ‖x‖², whose expectation is 1
    for any JL family — a drifting mean flags a broken matrix.

    Scale shape: the sign matrix is 16×64 LITERALS compiled into the
    projection expressions — fully map-side, zero shuffles before
    the bounded per-label aggregate; every fold is sequential
    double-precision, so ratios hash-match the oracle exactly."""
    import functools

    from duckdb_hdfs_spark.functions.vectors import dot

    e = _t(spark, sf_dir, "embeddings")
    signs = _jl_signs()
    projs = [
        dot(F.col("embedding"), F.array(*[F.lit(s) for s in row])).alias(f"p{j}")
        for j, row in enumerate(signs)
    ]
    base = e.select(
        "label", dot(F.col("embedding"), F.col("embedding")).alias("n2"), *projs
    )
    # left-to-right j = 0..15, matching the oracle's + chain
    norm2 = functools.reduce(
        lambda acc, j: acc + F.col(f"p{j}") * F.col(f"p{j}"),
        range(1, JL_K),
        F.col("p0") * F.col("p0"),
    )
    ratio = F.round((norm2 / float(JL_K)) / F.col("n2"), 6)
    return (
        base.select("label", ratio.alias("ratio"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ratio"),
            F.min("ratio").alias("min_ratio"),
            F.max("ratio").alias("max_ratio"),
        )
    )


# --------------------------------------------------------------------------
# shared decimal-exact per-label centroid build — the Spark function
# and oracle CTE pair used by BOTH halves of the cluster audit
# (cohesion + separation), extracted so the two always agree on what
# "the centroid" is (round-7 review: previously two verbatim copies
# of each side).  DECIMAL accumulation makes the per-dimension mean
# order-independent, so centroids are bit-identical across engines.
_CENTROID_CTES = """dims AS (
    SELECT label, gs.i AS i,
           CAST(sum(CAST(CAST(embedding[gs.i] AS DOUBLE) AS DECIMAL(20,10)))
                AS DOUBLE) / count(*) AS c
    FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) gs
    -- NULL embeddings excluded symmetrically: Spark's posexplode
    -- drops them, the theta-join would keep NULL cells (all-NULL
    -- audit, round 10)
    WHERE embedding IS NOT NULL
    GROUP BY label, gs.i
),
cent AS (SELECT label, list(c ORDER BY i) AS cent FROM dims GROUP BY label)"""


def _label_centroids(e: DataFrame) -> DataFrame:
    """(label, cent: array<double>) — per-label per-dimension decimal
    mean via one posexplode shuffle; output is (labels × 64) cells,
    corpus-size-independent, safe to broadcast."""
    dims = (
        e.select("label", F.posexplode(F.col("embedding")).alias("i", "x"))
        .groupBy("label", "i")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(20,10)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
    )
    return dims.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).alias("cent")
    )


def _cohesion_oracle() -> str:
    sq = (
        "(CAST(e.embedding[i] AS DOUBLE) - cent.cent[i])"
        " * (CAST(e.embedding[i] AS DOUBLE) - cent.cent[i])"
    )
    return f"""
WITH {_CENTROID_CTES},
d AS (
    SELECT e.label,
           round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 64), i -> {sq})),
               (acc, x) -> acc + x)), 6) AS dist
    FROM embeddings e JOIN cent ON e.label = cent.label
)
SELECT label, count(*) AS n_vecs,
       round(CAST(sum(CAST(dist AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6)
           AS mean_dist,
       min(dist) AS min_dist,
       max(dist) AS max_dist
FROM d GROUP BY label
"""


@query("emb_label_centroid_cohesion", oracle=_cohesion_oracle())
def emb_label_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cluster cohesion (round 5): each label's centroid
    (per-dimension mean) and the distribution of member distances to
    it — the compactness half of a silhouette/Davies-Bouldin audit,
    the index-health panel before trusting label-filtered ANN.

    Determinism: centroid means accumulate in DECIMAL (exact,
    order-independent) from double-cast floats, so centroids are
    bit-identical across engines; distances are sequential folds,
    rounded before the (again decimal) mean.

    Scale shape: one posexplode shuffle builds the (labels × 64)
    centroid matrix — output size independent of corpus — which then
    BROADCASTS back onto the corpus for a map-side distance fold;
    the final per-label rollup is a second bounded aggregate."""
    e = _t(spark, sf_dir, "embeddings")
    cent = _label_centroids(e)
    diff2 = F.zip_with(
        F.col("embedding"),
        F.col("cent"),
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    dist = F.round(
        F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)), 6
    )
    return (
        e.join(F.broadcast(cent), "label")
        .select("label", dist.alias("dist"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("dist").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_dist"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
        )
    )


# --------------------------------------------------------------------------
def _separation_oracle() -> str:
    from duckdb_hdfs_spark.functions.vectors import cosine_sql

    return f"""
WITH {_CENTROID_CTES}
SELECT a.label AS label_a, b.label AS label_b,
       round({cosine_sql('a.cent', 'b.cent')}, 6) AS centroid_cos
FROM cent a JOIN cent b ON a.label < b.label
"""


@query("emb_centroid_separation", oracle=_separation_oracle())
def emb_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-label centroid separation matrix (round 5): pairwise
    cosine between label centroids — the separation half of the
    cluster audit (emb_label_centroid_cohesion is the compactness
    half); two labels whose centroids cosine ≈ 1 are
    indistinguishable to a label-routed ANN.

    Scale shape: the centroid build is the same decimal-exact
    posexplode rollup (labels × 64 cells, corpus-size-independent);
    the pair matrix is a broadcast self-join of a 10-row frame —
    k²/2 rows of driver-free output."""
    from duckdb_hdfs_spark.functions.vectors import cosine

    e = _t(spark, sf_dir, "embeddings")
    cent = _label_centroids(e)
    a = cent.select(F.col("label").alias("label_a"), F.col("cent").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cent").alias("cb"))
    return a.join(
        F.broadcast(b), F.col("label_a") < F.col("label_b")
    ).select(
        "label_a",
        "label_b",
        F.round(cosine(F.col("ca"), F.col("cb")), 6).alias("centroid_cos"),
    )


# --------------------------------------------------------------------------
@query(
    "emb_dim_variance",
    oracle="""
WITH r AS (
    SELECT gs.i AS dim,
           CAST(round(CAST(embedding[gs.i] AS DOUBLE), 6)
                AS DECIMAL(12,6)) AS v
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) gs
    -- NULL embeddings excluded symmetrically with Spark's posexplode
    -- (all-NULL audit, round 10)
    WHERE embedding IS NOT NULL
)
SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
       round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_val,
       round((CAST(sum(v * v) AS DOUBLE)
              - CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE) / count(*))
             / nullif(count(*) - 1, 0), 6) AS var_val
FROM r GROUP BY dim
""",
)
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking input — the pre-PCA diagnostic
    (dead dimensions carry no variance and cost scan/shuffle bytes;
    a handful of dominant dims suggests truncation — see
    emb_matryoshka_recall for pricing that cut).

    Determinism: per-element values round to 6 decimals then sum in
    DECIMAL (the sim_norm_outliers moment recipe), so Σx and Σx² are
    exact and order-independent; the variance assembles in double
    with the identical association order on both engines.

    Scale shape: posexplode → (dim, value) → ONE partial-aggregated
    shuffle at dimension grain (64 groups, constant state)."""
    emb = _t(spark, sf_dir, "embeddings")
    r = emb.select(F.posexplode("embedding").alias("pos", "x")).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("x").cast("double"), 6)
        .cast("decimal(12,6)")
        .alias("v"),
    )
    s1 = F.sum("v").cast("double")
    s2 = F.sum(F.col("v") * F.col("v")).cast("double")
    n = F.count(F.lit(1))
    return r.groupBy("dim").agg(
        n.alias("n"),
        F.round(s1 / n, 6).alias("mean_val"),
        # 1-vector corpus (one-row audit r10): sample variance is
        # undefined at n = 1 — NULL on both engines, not an ANSI raise
        F.round(
            (s2 - s1 * s1 / n) / F.nullif(n - 1, F.lit(0)), 6
        ).alias("var_val"),
    )


# --------------------------------------------------------------------------
@query(
    "emb_cluster_purity",
    oracle=f"""
WITH assign AS (
    SELECT vec_id, label, cent_id FROM (
        SELECT e.vec_id, e.label, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cent')} DESC,
                            c.cent_id) AS crk
        FROM embeddings e, (
            SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
        ) c
    ) WHERE crk = 1
),
votes AS (
    SELECT cent_id, label, count(*) AS v FROM assign GROUP BY 1, 2
),
top AS (
    SELECT cent_id, label AS top_label, v AS top_v FROM (
        SELECT cent_id, label, v,
               row_number() OVER (PARTITION BY cent_id
                                  ORDER BY v DESC, label) AS rk
        FROM votes) t WHERE rk = 1
),
sizes AS (SELECT cent_id, count(*) AS n FROM assign GROUP BY cent_id)
SELECT sizes.cent_id, CAST(n AS BIGINT) AS n_vectors,
       CAST(top_label AS BIGINT) AS top_label,
       round(CAST(top_v AS DOUBLE) / n, 6) AS purity
FROM sizes JOIN top USING (cent_id)
""",
)
def emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster PURITY against ground-truth labels: assign every
    vector to its nearest of 8 md5-sampled centroids (the
    emb_kmeans_update codebook), then report each cell's majority
    label and majority share — the external-validity eval that says
    whether unsupervised cells recover the label structure (purity
    near 1/n_labels = the clustering is noise; cohesion/separation
    audits are internal, this one is supervised).

    Scale shape: the map-side broadcast-codebook argmax (no
    corpus-keyed Exchange), then cell-grain vote and size aggregates
    with a cell-partitioned argmax window — 8-row output."""
    from duckdb_hdfs_spark.functions.vectors import norm
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy
    from duckdb_hdfs_spark.operators.similarity import (
        assign_nearest,
        centroid_codebook,
    )
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    corpus = rebalance_cpu_heavy(
        emb.select("vec_id", "label", F.col("embedding").alias("ce"))
    ).select("vec_id", "label", "ce", norm(F.col("ce")).alias("cn"))
    assign = (
        assign_nearest(corpus, centroid_codebook(emb, 8), "ce", "cn", top=1)
        .select("vec_id", "label", "cent_id")
        # three-column assignment materialized once: the vote branch
        # and the size branch would otherwise each re-run the scoring
        # scan (DataFrame reuse is plan reuse, not result reuse)
        .localCheckpoint(eager=True)
    )
    votes = assign.groupBy("cent_id", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("cent_id").orderBy(F.desc("v"), F.asc("label"))
    top = (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select(
            "cent_id",
            F.col("label").cast("bigint").alias("top_label"),
            F.col("v").alias("top_v"),
        )
    )
    sizes = assign.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
    return sizes.join(top, "cent_id").select(
        "cent_id",
        F.col("n").cast("bigint").alias("n_vectors"),
        "top_label",
        F.round(F.col("top_v").cast("double") / F.col("n"), 6).alias(
            "purity"
        ),
    )
