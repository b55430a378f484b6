"""Corpus-curation statistics (SURVEY.md §2.12): unigram-LM
log-probability scoring, asymmetric containment over LSH candidates,
per-document token entropy, quality-weighted deterministic
resampling, the per-(source, lang) dataset-card rollup, the log2
length histogram, greedy token-budget selection (round 4), plus the
round-5 provenance/mixing panels — cross-source prefix overlap and
temperature-flattened source mixing — the statistical-filtering and
release-reporting passes a training-data pipeline runs after the
structural dedup/quality passes.

All are oracle-checked.

Determinism notes (the driver compare is a value hash):
- log-probabilities round to 6 decimals BEFORE the per-document sum,
  and the sum runs in DECIMAL — decimal addition is exact and
  order-independent, so reducer ordering cannot flip the hash (the
  repo-wide ``_dsum`` discipline, applied to log-space values);
- sampling uses the md5-uniform draw (md5_int60 / 2^60), never RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.functions.hashing import (
    md5_int60,
    md5_int60_sql,
    tokens,
    tokens_sql,
)
from duckdb_hdfs_spark.functions.text import (
    QUALITY_MEAN_LEN_MAX,
    QUALITY_MEAN_LEN_MIN,
    QUALITY_STOP_RATIO_MIN,
    QUALITY_TOKENS_MAX,
    QUALITY_TOKENS_MIN,
    quality_score,
    quality_score_sql,
)
from duckdb_hdfs_spark.operators.dedup import NORM_SQL
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t

_TOKS = tokens_sql("text")

#: shared token-frequency CTE: one row per (doc_id, distinct token)
#: with multiplicity — the working set for both LM scoring and
#: entropy (corpus rows collapse to per-doc vocab size immediately).
_TF_SQL = f"""
tok AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, count(*) AS n_t
    FROM tok WHERE tok <> '' GROUP BY doc_id, tok
)
"""


# --------------------------------------------------------------------------
@query(
    "text_unigram_logprob",
    oracle=f"""
WITH {_TF_SQL},
vocab AS (SELECT tok, sum(n_t) AS c FROM tf GROUP BY tok),
tot AS (SELECT sum(c) AS tot FROM vocab)
SELECT doc_id,
       CAST(sum(n_t) AS BIGINT) AS n_tokens,
       round(CAST(sum(
           CAST(n_t AS DECIMAL(20, 8))
           * CAST(round(ln(CAST(c AS DOUBLE)) - ln(CAST(tot AS DOUBLE)), 6)
                  AS DECIMAL(20, 8))
       ) AS DOUBLE) / sum(n_t), 4) AS mean_logprob
FROM tf JOIN vocab USING (tok) CROSS JOIN tot
GROUP BY doc_id
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own unigram LM — the perplexity-proxy quality signal (CCNet-style
    filtering ranks documents by LM score; a full KenLM is the
    production upgrade, the unigram LM is the engine-native floor).

    Scale shape: the unigram LM (vocab counts) is built in ONE corpus
    pass and materialized with an eager localCheckpoint — it is
    VOCABULARY-sized (Heaps-law sublinear in corpus size), so both
    its reuse as the join side and the 1-row corpus total derive
    from the materialized copy without re-tokenizing the corpus
    (Spark re-executes shared lineage otherwise; measured 3 corpus
    scans for the naive 3-branch plan).  The (doc, token) group-by
    partial-aggregates before its shuffle; the vocab join shuffles
    on token (AQE splits hot stopword keys; AQE broadcasts the vocab
    side outright while it fits).  Per-term log-probs round to 6
    decimals then sum in DECIMAL per document, so the result is
    order-independent and engine-exact."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n_t"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = vocab.agg(F.sum("c").alias("tot"))
    term = F.col("n_t").cast("decimal(20,8)") * F.round(
        F.log(F.col("c").cast("double")) - F.log(F.col("tot").cast("double")), 6
    ).cast("decimal(20,8)")
    return (
        tf.join(vocab, "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("n_t").alias("n_tokens"),
            F.round(
                F.sum(term).cast("double") / F.sum("n_t"), 4
            ).alias("mean_logprob"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "text_token_entropy",
    oracle=f"""
WITH {_TF_SQL}
SELECT doc_id,
       CAST(sum(n_t) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       round(ln(CAST(sum(n_t) AS DOUBLE))
             - CAST(sum(
                   CAST(n_t AS DECIMAL(20, 8))
                   * CAST(round(ln(CAST(n_t AS DOUBLE)), 6) AS DECIMAL(20, 8))
               ) AS DOUBLE) / sum(n_t), 4) AS entropy
FROM tf
GROUP BY doc_id
""",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution,
    H = ln(n) − (Σ c·ln c)/n — low entropy flags keyword-stuffed /
    template / repeated-token documents that length and stopword
    heuristics miss (complements text_repetition's n-gram dup
    fraction with a distributional signal).

    Scale shape: single (doc_id, token) partial-aggregated shuffle,
    then a per-document aggregate — no joins, no corpus-global state.
    Same decimal log-sum discipline as text_unigram_logprob."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    clogc = F.col("n_t").cast("decimal(20,8)") * F.round(
        F.log(F.col("n_t").cast("double")), 6
    ).cast("decimal(20,8)")
    return tf.groupBy("doc_id").agg(
        F.sum("n_t").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(F.sum("n_t").cast("double"))
            - F.sum(clogc).cast("double") / F.sum("n_t"),
            4,
        ).alias("entropy"),
    )


# --------------------------------------------------------------------------
def _containment_oracle() -> str:
    from duckdb_hdfs_spark.queries.dedup import _BANDED_SQL

    return f"""
WITH {_BANDED_SQL},
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
ws AS (
    SELECT doc_id, list_distinct({_TOKS}) AS words FROM documents
)
SELECT p.doc_a, p.doc_b,
       round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
             / len(a.words), 4) AS contain_a_in_b,
       round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
             / len(b.words), 4) AS contain_b_in_a,
       (CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
            / least(len(a.words), len(b.words))) >= 0.9 AS near_superset
FROM pairs p
JOIN ws a ON p.doc_a = a.doc_id
JOIN ws b ON p.doc_b = b.doc_id
WHERE len(list_intersect(a.words, b.words)) > 0
"""


@query("dedup_containment", oracle=_containment_oracle())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set containment |A∩B| / |A| per candidate pair —
    catches near-SUPERSET duplicates (a document embedded inside a
    longer one) that symmetric Jaccard under-scores: a 50-word doc
    fully contained in a 500-word doc has Jaccard ≤ 0.1 but
    containment 1.0.  Candidate pairs come from the MinHash-LSH band
    buckets (operators.dedup.minhash_candidate_pairs), the same
    bounded pair source dedup_minhash_pairs / dedup_ngram_jaccard
    score — earlier rounds blocked on (lang, source) metadata, which
    is O(block²) with blocks growing linearly in corpus size.

    Scale shape: one banded pass emits pairs bounded by bucket size;
    two hash joins attach each side's distinct token set;
    intersection sizes are array expressions on the joined rows."""
    from duckdb_hdfs_spark.operators.dedup import minhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("words")
    )
    wa = ws.select(F.col("doc_id").alias("doc_a"), F.col("words").alias("words_a"))
    wb = ws.select(F.col("doc_id").alias("doc_b"), F.col("words").alias("words_b"))
    inter = F.size(F.array_intersect("words_a", "words_b")).cast("double")
    return (
        minhash_candidate_pairs(docs)
        .join(wa, "doc_a")
        .join(wb, "doc_b")
        .filter(F.size(F.array_intersect("words_a", "words_b")) > 0)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.size("words_a"), 4).alias("contain_a_in_b"),
            F.round(inter / F.size("words_b"), 4).alias("contain_b_in_a"),
            (
                inter / F.least(F.size("words_a"), F.size("words_b")) >= 0.9
            ).alias("near_superset"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "sample_quality_resample",
    oracle=f"""
SELECT doc_id, lang, source,
       round({quality_score_sql('text', _TOKS)}, 4) AS keep_w
FROM documents
WHERE CAST({md5_int60_sql('CAST(doc_id AS VARCHAR)')} AS DOUBLE)
      / 1152921504606846976.0 < {quality_score_sql('text', _TOKS)}
""",
)
def sample_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance resampling: keep each document
    with probability equal to its quality score (the data-mixing
    move that up-weights clean text without hard thresholds), using
    the md5-uniform draw u = md5_int60(doc_id)/2^60 so the kept set
    is deterministic, reproducible across engines/runs, and stable
    under corpus repartitioning — properties RNG sampling lacks and
    train/eval hygiene requires.

    Scale shape: pure map-side filter (zero shuffle, zero state);
    the quality score and the draw are per-row expressions."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    q = quality_score(F.col("text"), toks)
    u = md5_int60(F.col("doc_id").cast("string")).cast("double") / F.lit(
        float(1 << 60)
    )
    return (
        docs.filter(u < q)
        .select(
            "doc_id",
            "lang",
            "source",
            F.round(q, 4).alias("keep_w"),
        )
    )


# --------------------------------------------------------------------------
_NTOK_SQL = f"len(list_filter({_TOKS}, t -> t <> ''))"


@query(
    "corpus_dataset_card",
    oracle=f"""
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum({_NTOK_SQL}) AS BIGINT) AS n_tokens,
       round(1.0 - CAST(count(DISTINCT {NORM_SQL}) AS DOUBLE) / count(*), 4)
           AS dup_rate,
       round(CAST(sum(CAST(round({quality_score_sql('text', _TOKS)}, 4)
                           AS DECIMAL(10, 4))) AS DOUBLE) / count(*), 4)
           AS mean_quality,
       round(quantile_cont(n_chars, 0.50), 2) AS p50_chars
FROM documents
GROUP BY source, lang
""",
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) dataset-card rollup — the summary table a
    corpus release ships: document and token counts, exact-duplicate
    rate (1 − distinct normalized texts / docs), mean quality score,
    and median length.  One scan, one shuffle on the card key.

    Determinism: quality scores round to 4 decimals then sum in
    DECIMAL (order-independent); the median is the exact interpolated
    percentile (Spark ``percentile`` == DuckDB ``quantile_cont``
    bit-for-bit, the stats_quantiles precedent).  The distinct-count
    shuffles one md5-normalized string per doc inside its group —
    at 100 TB swap the string for its md5 (same cardinality,
    16 bytes); kept as the raw norm here to match the oracle."""
    from duckdb_hdfs_spark.operators.dedup import norm_text

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    ntok = F.size(F.filter(toks, lambda t: t != F.lit("")))
    q4 = F.round(quality_score(F.col("text"), toks), 4).cast("decimal(10,4)")
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            norm_text(F.col("text")).alias("norm"),
            ntok.alias("ntok"),
            q4.alias("q4"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
            F.round(
                1.0 - F.count_distinct(F.col("norm")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
            F.round(F.sum("q4").cast("double") / F.count(F.lit(1)), 4).alias(
                "mean_quality"
            ),
            F.round(F.expr("percentile(n_chars, 0.50)"), 2).alias("p50_chars"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "text_length_histogram",
    oracle="""
SELECT source, length(bin(n_chars)) AS log2_bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
GROUP BY source, length(bin(n_chars))
""",
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram per source — the
    length-distribution panel of a dataset card (truncation and
    packing decisions read off it).  The bucket is the binary-string
    length of n_chars (= ⌊log2⌋+1), computed with integer/string ops
    only — ``bin()`` exists identically in both engines, so bucket
    edges are engine-exact with no floating log.

    Scale shape: map-side bucket expression + one partial-aggregated
    group-by; cardinality is sources × ~40 buckets regardless of
    corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.length(F.expr("bin(n_chars)")).cast("bigint").alias("log2_bucket"),
            "n_chars",
        )
        .groupBy("source", "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------------
#: per-source token budget for the greedy selection op (small enough
#: that every SF exercises both kept and dropped documents)
TOKEN_BUDGET = 1000


@query(
    "corpus_token_budget",
    oracle=f"""
WITH scored AS (
    SELECT source, doc_id,
           {_NTOK_SQL} AS ntok,
           round({quality_score_sql('text', _TOKS)}, 4) AS q
    FROM documents
),
ranked AS (
    SELECT source, doc_id, ntok, q,
           sum(ntok) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM scored
)
SELECT source, doc_id, CAST(ntok AS BIGINT) AS ntok, q,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked WHERE cum_tokens <= {TOKEN_BUDGET}
""",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source token-budget selection: order each source's
    documents by quality (descending, doc_id tiebreak) and keep the
    prefix whose cumulative token count fits the budget — the
    data-mixing planner's allocation step (fill each source's quota
    with its best documents first).

    Determinism: the ordering key is the ROUNDED quality score, so
    both engines sort identically; token counts are integers, so the
    running sum is exact.  Scale shape: the per-source cumulative
    window of earlier rounds serialized each source's ENTIRE document
    set through one task (source cardinality ~5, so ~1/5 of a 100 TB
    corpus per task); now the cumsum runs two-phase
    (operators.ranks.grouped_cumsum) — quality-range buckets, per-
    (source, bucket) partial sums, broadcast prefix offsets, bucket-
    local window — and buckets whose offset already exceeds the
    budget are pruned BEFORE the window, so window work is bounded by
    the budget, not the corpus."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "source",
        "doc_id",
        F.size(F.filter(toks, lambda t: t != F.lit(""))).alias("ntok"),
        F.round(quality_score(F.col("text"), toks), 4).alias("q"),
    )
    return (
        grouped_cumsum(
            scored,
            ["source"],
            [("q", "desc"), ("doc_id", "asc")],
            "ntok",
            "cum_tokens",
            prune_above=TOKEN_BUDGET,
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select(
            "source",
            "doc_id",
            F.col("ntok").cast("bigint").alias("ntok"),
            "q",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "corpus_source_overlap",
    oracle=f"""
WITH hs AS (
    SELECT DISTINCT
           md5(array_to_string(list_slice({_TOKS}, 1, 8), ' ')) AS h,
           source
    FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_heads
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY source_a, source_b
""",
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (round 5): for every source
    pair, how many distinct document HEADS (first-8-token prefix
    hash, the dedup_prefix_groups fingerprint) appear in BOTH — the
    provenance panel that catches one crawl re-packaging another or
    shared boilerplate spanning feeds (cross-source dups silently
    inflate dataset-mixing weights).

    Scale shape: distinct (hash, source) pairs collapse the corpus
    to its fingerprint inventory first (partial-aggregated); the
    pair join is keyed on the 16-byte hash, bounded per hash by
    source multiplicity (≤ n_sources), never by corpus size."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.array_join(F.slice(tokens(F.col("text")), 1, 8), " "))
    hs = docs.select(h.alias("h"), "source").distinct()
    a = hs.select("h", F.col("source").alias("source_a"))
    b = hs.select(F.col("h").alias("h2"), F.col("source").alias("source_b"))
    return (
        a.join(b, (F.col("h") == F.col("h2")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_heads"))
    )


# --------------------------------------------------------------------------
@query(
    "corpus_temperature_mix",
    oracle=f"""
WITH counts AS (
    SELECT source, count(*) AS n_s,
           CAST(round(sqrt(count(*)), 6) AS DECIMAL(20,6)) AS sq
    FROM documents GROUP BY source
),
z AS (
    SELECT CAST(sum(sq) AS DOUBLE) AS z, CAST(sum(n_s) AS DOUBLE) AS n
    FROM counts
),
rates AS (
    SELECT source, n_s,
           least(1.0, round(0.5 * n * (CAST(sq AS DOUBLE) / z) / n_s, 6))
               AS keep_rate
    FROM counts, z
)
SELECT d.source, any_value(r.n_s) AS n_total,
       any_value(r.keep_rate) AS keep_rate,
       CAST(count(*) FILTER (
           WHERE CAST({md5_int60_sql("CAST(d.doc_id AS VARCHAR)")} AS DOUBLE)
                 / 1152921504606846976.0 < r.keep_rate
       ) AS BIGINT) AS n_kept
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY d.source
""",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing (round 5): per-source keep
    rates ∝ n_s^0.5 / n_s (the Gopher/PaLM mixture move — a τ < 1
    power flattens the source distribution so giant crawls stop
    drowning small high-quality feeds), normalized to keep ~50% of
    the corpus, each document kept by the md5-uniform draw.
    τ = 0.5 deliberately: √ is IEEE-correctly-rounded on both engines
    (a general pow() rides libm and can differ in the last ulp); the
    √n_s terms round to 6 decimals and normalize through a DECIMAL
    sum, so rates are bit-identical cross-engine.

    Scale shape: one partial-aggregated source rollup (tiny), rate
    table broadcast back onto the corpus, map-side keep decision, and
    a final bounded per-source audit rollup."""
    docs = _t(spark, sf_dir, "documents")
    # source-cardinality-sized (~20 rows); checkpointed so the
    # normalizer branch reads it instead of re-scanning the corpus
    counts = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.round(F.sqrt(F.count(F.lit(1))), 6)
            .cast("decimal(20,6)")
            .alias("sq"),
        )
        .localCheckpoint(eager=True)
    )
    z = counts.agg(
        F.sum("sq").cast("double").alias("z"),
        F.sum("n_s").cast("double").alias("n"),
    )
    rates = counts.join(F.broadcast(z)).select(
        "source",
        "n_s",
        F.least(
            F.lit(1.0),
            F.round(
                F.lit(0.5)
                * F.col("n")
                * (F.col("sq").cast("double") / F.col("z"))
                / F.col("n_s"),
                6,
            ),
        ).alias("keep_rate"),
    )
    draw = md5_int60(F.col("doc_id").cast("string")).cast("double") / float(1 << 60)
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.first("n_s").alias("n_total"),
            F.first("keep_rate").alias("keep_rate"),
            F.count(F.when(draw < F.col("keep_rate"), 1))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
_BIGRAMS_SQL = f"""
bt AS (
    SELECT doc_id, toks FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
),
bg AS (
    SELECT doc_id, unnest(list_transform(
        generate_series(1, greatest(len(toks) - 1, 0)),
        i -> toks[i] || ' ' || toks[i + 1])) AS bigram,
        1 AS one
    FROM bt
),
bgf AS (
    SELECT doc_id, bigram, count(*) AS n_b FROM bg
    WHERE bigram NOT LIKE ' %' AND bigram NOT LIKE '% ' GROUP BY doc_id, bigram
),
bvocab AS (SELECT bigram, sum(n_b) AS cb FROM bgf GROUP BY bigram),
uvocab AS (
    SELECT split_part(bigram, ' ', 1) AS w1, sum(n_b) AS cu
    FROM bgf GROUP BY w1
)
"""


@query(
    "text_bigram_logprob",
    oracle=f"""
WITH {_BIGRAMS_SQL}
SELECT doc_id,
       CAST(sum(n_b) AS BIGINT) AS n_bigrams,
       round(CAST(sum(
           CAST(n_b AS DECIMAL(20, 8))
           * CAST(round(ln(CAST(cb AS DOUBLE)) - ln(CAST(cu AS DOUBLE)), 6)
                  AS DECIMAL(20, 8))
       ) AS DOUBLE) / sum(n_b), 4) AS mean_logprob
FROM bgf
JOIN bvocab USING (bigram)
JOIN uvocab ON split_part(bigram, ' ', 1) = uvocab.w1
GROUP BY doc_id
""",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean BIGRAM log-probability under the corpus's
    own bigram LM — mean ln P(wᵢ | wᵢ₋₁) with P = c(w₁w₂)/c(w₁·) —
    one Markov order above text_unigram_logprob: fluency-sensitive
    where the unigram score only sees vocabulary (word salad with
    common words scores high on unigrams, low here).

    Scale shape: bigrams build map-side (zip-shifted token slices,
    the shingle recipe); per-(doc, bigram) counts partial-aggregate;
    the bigram vocab is checkpointed once (Heaps-sublinear) and both
    LM joins run against it — prefix counts derive FROM the bigram
    vocab (sum over first words), never a second corpus pass.  Same
    decimal log-sum discipline as the unigram op."""
    return _doc_bigram_logprob(_t(spark, sf_dir, "documents"))


def _doc_bigram_logprob(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *carry, n_bigrams, mean_logprob) under the corpus's
    own bigram LM — the text_bigram_logprob body, shared with the
    perplexity bucketing (corpus_perplexity_buckets).  ``carry``:
    per-document-constant columns (e.g. lang) threaded through the
    (doc, bigram) group-bys so callers need no second documents scan
    to re-attach them."""
    from duckdb_hdfs_spark.functions.hashing import word_kgrams

    from duckdb_hdfs_spark.operators.genutil import explode_nonnull_elems

    toks = tokens(F.col("text"))
    # word_kgrams pads short docs with '' tails; drop any bigram
    # touching an empty token (mirrors the oracle's LIKE filters).
    # explode WITHOUT the inferred size()>0 filter re-evaluating the
    # tokenize+kgram build twice in the scan stage (round 11,
    # operators/genutil.py; kgram elements are non-NULL strings)
    bg = explode_nonnull_elems(
        docs, word_kgrams(toks, 2), "bigram", "doc_id", *carry
    ).filter(
        ~F.col("bigram").startswith(" ") & ~F.col("bigram").endswith(" ")
    )
    bgf = bg.groupBy("doc_id", *carry, "bigram").agg(
        F.count(F.lit(1)).alias("n_b")
    )
    bvocab = (
        bgf.groupBy("bigram")
        .agg(F.sum("n_b").alias("cb"))
        .localCheckpoint(eager=True)
    )
    uvocab = bvocab.groupBy(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("cb").alias("cu"))
    term = F.col("n_b").cast("decimal(20,8)") * F.round(
        F.log(F.col("cb").cast("double")) - F.log(F.col("cu").cast("double")), 6
    ).cast("decimal(20,8)")
    return (
        bgf.join(bvocab, "bigram")
        .join(
            uvocab,
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .groupBy("doc_id", *carry)
        .agg(
            F.sum("n_b").alias("n_bigrams"),
            F.round(F.sum(term).cast("double") / F.sum("n_b"), 4).alias(
                "mean_logprob"
            ),
        )
    )


# --------------------------------------------------------------------------
def _release_oracle() -> str:
    from duckdb_hdfs_spark.queries.dedup import banded_sql

    qscore = quality_score_sql("text", _TOKS)
    # parameterized builder (round-7 review) — bands the survivor set
    # structurally instead of string-replacing the rendered SQL
    banded_sv = banded_sql("sv")
    return f"""
WITH RECURSIVE sv AS MATERIALIZED (
    SELECT doc_id, text, n_chars, q, len({_TOKS}) AS n_toks
    FROM (
        SELECT doc_id, text, n_chars, {qscore} AS q,
               row_number() OVER (PARTITION BY md5({NORM_SQL})
                                  ORDER BY doc_id) AS rn
        FROM documents
        WHERE {qscore} >= 0.5
    ) WHERE rn = 1
),
{banded_sv},
pairs AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
edges AS MATERIALIZED (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, label) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
clusters AS MATERIALIZED (
    SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
),
ranked AS (
    SELECT c.node,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY s.n_chars DESC, s.doc_id) AS krn
    FROM clusters c JOIN sv s ON c.node = s.doc_id
),
final AS (
    SELECT s.* FROM sv s
    LEFT JOIN ranked r ON s.doc_id = r.node
    WHERE r.node IS NULL OR r.krn = 1
)
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
           AS split,
       count(*) AS n_docs,
       round(CAST(sum(CAST(q AS DECIMAL(10,4))) AS DOUBLE) / count(*), 4)
           AS mean_quality,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens
FROM (SELECT *, {md5_int60_sql("CAST(doc_id AS VARCHAR)")} % 100 AS b
      FROM final)
GROUP BY split
"""


@query("pipeline_corpus_release", oracle=_release_oracle())
def pipeline_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus release pipeline in one plan (round 5) —
    the composition every individual operator exists for: quality
    gate (score ≥ 0.5) → exact dedup (keep first per content hash) →
    MinHash-LSH near-dup clustering over the SURVIVORS with keep-best
    (longest doc per cluster) → deterministic 80/10/10 hash split →
    per-split release statistics.  One registry key proves the
    operators compose without re-scanning: the survivor set is
    checkpointed once and every later stage (banding, clustering,
    keeper ranking, split rollup) reads the materialized copy.

    Scale shape: each stage keeps its own operator's shape (map-side
    scoring, hash-aggregate dedup, bucket-bounded pairs, pointer-
    jumping CC, map-side split) — the pipeline inherits linearity
    end to end."""
    from pyspark.sql import Window

    from duckdb_hdfs_spark.operators.dedup import (
        connected_clusters,
        minhash_candidate_pairs,
        norm_text,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "text",
        "n_chars",
        quality_score(F.col("text"), toks).alias("q"),
        F.size(toks).alias("n_toks"),
    ).filter(F.col("q") >= 0.5)
    w = Window.partitionBy(F.md5(norm_text(F.col("text")))).orderBy("doc_id")
    sv = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    clusters = connected_clusters(minhash_candidate_pairs(sv))
    kw = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    non_keepers = (
        clusters.join(sv, clusters.node == sv.doc_id)
        .withColumn("krn", F.row_number().over(kw))
        .filter(F.col("krn") > 1)
        .select("node")
    )
    final = sv.join(non_keepers, sv.doc_id == non_keepers.node, "left_anti")
    b = md5_int60(F.col("doc_id").cast("string")) % 100
    return (
        final.withColumn(
            "split",
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("q").cast("decimal(10,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_quality"),
            F.sum("n_toks").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "corpus_length_drift_by_source",
    oracle="""
WITH panel AS (
    SELECT source, length(bin(n_chars)) AS bucket, count(*) AS n
    FROM documents GROUP BY 1, 2
),
s AS (SELECT source, sum(n) AS s_tot FROM panel GROUP BY source),
g AS (SELECT bucket, sum(n) AS gn FROM panel GROUP BY bucket),
t AS (SELECT sum(n) AS tot FROM panel),
d AS (
    SELECT panel.source, s.s_tot, panel.bucket,
           round(abs(CAST(panel.n AS DOUBLE) / s.s_tot
                     - CAST(g.gn AS DOUBLE) / t.tot), 6) AS delta
    FROM panel JOIN s USING (source) JOIN g USING (bucket) CROSS JOIN t
),
agg AS (
    SELECT source, CAST(s_tot AS BIGINT) AS n_docs,
           CAST(sum(CAST(delta AS DECIMAL(18,6))) AS DOUBLE)
               AS l1_distance,
           max(delta) AS max_abs_delta
    FROM d GROUP BY source, s_tot
),
top AS (
    SELECT source, CAST(bucket AS BIGINT) AS top_bucket FROM (
        SELECT source, bucket,
               row_number() OVER (PARTITION BY source
                                  ORDER BY delta DESC, bucket DESC) AS rk
        FROM d) t WHERE rk = 1
)
SELECT agg.source, n_docs, l1_distance, max_abs_delta, top_bucket
FROM agg JOIN top USING (source)
""",
)
def corpus_length_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-distribution drift: L1 distance (= 2x total
    variation) between each source's power-of-two length histogram
    and the corpus-wide histogram, plus the most-divergent bucket — the
    provenance QC that catches a source whose scrape changed shape
    (truncated pages, boilerplate inflation) before it poisons the
    mix weights.  Shares the text_length_histogram bucket expression
    (``bin()`` string length — no floating log) and the
    orders_priority_drift L1 recipe (per-cell deltas rounded to 6
    decimals, then a DECIMAL sum — order-independent).

    Scale shape: ONE documents scan → (source × ~40 buckets) panel,
    localCheckpoint-ed; marginals re-attach as broadcast joins."""
    docs = _t(spark, sf_dir, "documents")
    panel = (
        docs.groupBy(
            "source",
            F.length(F.expr("bin(n_chars)")).cast("bigint").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    s = panel.groupBy("source").agg(F.sum("n").alias("s_tot"))
    g = panel.groupBy("bucket").agg(F.sum("n").alias("gn"))
    t = panel.agg(F.sum("n").alias("tot"))
    d = (
        panel.join(s, "source")
        .join(F.broadcast(g), "bucket")
        .join(F.broadcast(t))
        .withColumn(
            "delta",
            F.round(
                F.abs(
                    F.col("n").cast("double") / F.col("s_tot")
                    - F.col("gn").cast("double") / F.col("tot")
                ),
                6,
            ),
        )
    )
    return (
        d.groupBy("source", "s_tot")
        .agg(
            F.sum(F.col("delta").cast("decimal(18,6)"))
            .cast("double")
            .alias("l1_distance"),
            F.max("delta").alias("max_abs_delta"),
            F.max_by(
                "bucket", F.struct(F.col("delta"), F.col("bucket"))
            ).alias("top_bucket"),
        )
        .select(
            "source",
            F.col("s_tot").alias("n_docs"),
            "l1_distance",
            "max_abs_delta",
            "top_bucket",
        )
    )


# --------------------------------------------------------------------------
@query(
    "corpus_quality_dup_calibration",
    oracle=rf"""
WITH scored AS (
    SELECT doc_id, {quality_score_sql('text', _TOKS)} AS q,
           md5({NORM_SQL}) AS h
    FROM documents
),
flagged AS (
    SELECT doc_id, q,
           CASE WHEN count(*) OVER (PARTITION BY h) > 1
                THEN 1 ELSE 0 END AS is_dup
    FROM scored
),
tiled AS (
    SELECT q, is_dup,
           ntile(4) OVER (ORDER BY q DESC, doc_id) AS q_tile
    FROM flagged
)
SELECT q_tile, count(*) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_dups,
       round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_rate,
       round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS mean_quality
FROM tiled GROUP BY q_tile
""",
)
def corpus_quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-quartile × exact-duplicate calibration: does the cheap
    quality score actually separate duplicated boilerplate?  Each
    quartile reports its duplicate rate and mean quality — if dup
    rate doesn't fall with quality, the filter threshold is mis-set
    (this cross-check is how curation teams catch a quality heuristic
    that accidentally REWARDS templates).

    Scale shape: one documents scan computes score + content hash
    map-side; the dup flag is a hash-PARTITIONED window count; the
    quartile comes from operators/ranks.distributed_ntile — range
    buckets on broadcast quantile bounds, per-bucket rank, broadcast
    offsets — so there is NO partition-less window anywhere despite
    the global quartile semantics (hash-matches DuckDB's global
    ntile)."""
    from duckdb_hdfs_spark.operators.dedup import norm_text
    from duckdb_hdfs_spark.operators.ranks import distributed_ntile
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        quality_score(F.col("text"), toks).alias("q"),
        F.md5(norm_text(F.col("text"))).alias("h"),
    )
    wc = Window.partitionBy("h")
    flagged = scored.withColumn(
        "is_dup",
        F.when(F.count(F.lit(1)).over(wc) > 1, 1).otherwise(0),
    ).drop("h")
    tiled = distributed_ntile(
        flagged, [("q", "desc"), ("doc_id", "asc")], out="q_tile", n_buckets=4
    )
    return tiled.groupBy("q_tile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").alias("n_dups"),
        F.round(
            F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(
            F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )


# --------------------------------------------------------------------------
_SHARD_TOKENS = 5_000


@query(
    "corpus_shard_planner",
    oracle=f"""
WITH costed AS (
    SELECT doc_id, len({_TOKS}) AS cost FROM documents
),
cum AS (
    SELECT doc_id, cost,
           sum(cost) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
    FROM costed
)
SELECT CAST((c - 1) // {_SHARD_TOKENS} AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(cost) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM cum
GROUP BY 1
""",
)
def corpus_shard_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output-shard planner: assign documents (in
    stable doc_id order) to ~5,000-token shards by
    cumulative token count — the write-side layout step of a corpus
    release (training readers want shards of near-equal TOKEN mass,
    not file count; a size-skewed shard becomes the straggler of
    every epoch).

    Scale shape: the global running total uses
    operators/ranks.grouped_cumsum (range-bucket on broadcast
    quantile bounds → per-bucket partials → broadcast prefix
    offsets → bucket-local window) under a constant group — NO
    partition-less window even though the semantics are a global
    ORDER BY cumsum; the shard rollup is one partial-aggregated
    group-by."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    docs = _t(spark, sf_dir, "documents")
    costed = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("cost")
    ).withColumn("__g", F.lit(1))
    cum = grouped_cumsum(
        costed, ["__g"], [("doc_id", "asc")], val="cost", out="c"
    )
    return (
        cum.withColumn(
            "shard_id", F.expr(f"CAST((c - 1) div {_SHARD_TOKENS} AS BIGINT)")
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("cost").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "corpus_vocab_growth",
    oracle=f"""
WITH tok AS (
    -- the empty-token filter MUST match the Spark side's
    -- F.col("tok") != "": edge/duplicated whitespace tokenizes to ''
    -- and the two sides would otherwise disagree on n_tok and on ''
    -- as a vocabulary term (round-7 review; reproduced as a FAIL on
    -- crafted whitespace-edge input)
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tokf AS (SELECT * FROM tok WHERE tok <> ''),
per_doc AS (
    SELECT doc_id, count(*) AS n_tok FROM tokf GROUP BY doc_id
),
firsts AS (
    SELECT doc_id AS first_doc, count(*) AS n_new
    FROM (SELECT tok, min(doc_id) AS doc_id FROM tokf GROUP BY tok) t
    GROUP BY doc_id
),
j AS (
    SELECT p.doc_id, p.n_tok, coalesce(f.n_new, 0) AS n_new
    FROM per_doc p LEFT JOIN firsts f ON p.doc_id = f.first_doc
)
SELECT doc_id,
       CAST(sum(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens,
       CAST(sum(n_new) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_vocab
FROM j
""",
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct tokens
    vs cumulative token count in ingest (doc_id) order — the panel
    that says whether a corpus is still contributing NEW vocabulary
    or re-treading (flattening curve ⇒ diminishing data value; the
    empirical basis for dataset-mixing decisions).

    Spark-first shape: 'cumulative distinct' is NOT computed by
    rescanning prefixes — each token contributes at its FIRST doc
    only (min(doc_id) per token, one shuffle), so the curve is two
    running sums over per-doc increments, both via the two-phase
    distributed cumsum under a constant group (no partition-less
    window).  Linear at any corpus size."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    firsts = (
        tok.groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_new"))
        .withColumnRenamed("first_doc", "doc_id")
    )
    j = (
        per_doc.join(firsts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("__g", F.lit(1))
    )
    # BOTH running sums ride one bucketing pass (grouped_cumsum takes
    # value lists since round 7 — two chained calls paid the
    # percentile probe, checkpoint, and offsets join twice)
    c2 = grouped_cumsum(
        j,
        ["__g"],
        [("doc_id", "asc")],
        val=["n_tok", "n_new"],
        out=["cum_tokens", "cum_vocab"],
    )
    return c2.select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    )


# --------------------------------------------------------------------------
@query(
    "corpus_quality_rule_ablation",
    # rule thresholds come from functions/text.py's exported constants
    # so the ablation always explains the rules quality_score actually
    # applies (round-7 review: hardcoded copies drifted silently)
    oracle=rf"""
WITH scored AS (
    SELECT source,
           CASE WHEN len({_TOKS}) >= {QUALITY_TOKENS_MIN}
                 AND len({_TOKS}) <= {QUALITY_TOKENS_MAX}
                THEN 1 ELSE 0 END AS pass_len,
           CASE WHEN CAST(list_reduce(list_transform({_TOKS},
                         t -> length(t)), (a, b) -> a + b) AS DOUBLE)
                     / len({_TOKS}) >= {QUALITY_MEAN_LEN_MIN}
                 AND CAST(list_reduce(list_transform({_TOKS},
                         t -> length(t)), (a, b) -> a + b) AS DOUBLE)
                     / len({_TOKS}) <= {QUALITY_MEAN_LEN_MAX}
                THEN 1 ELSE 0 END AS pass_word,
           CASE WHEN CAST(len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'for', 'on'))) AS DOUBLE) / len({_TOKS}) >= {QUALITY_STOP_RATIO_MIN}
                THEN 1 ELSE 0 END AS pass_stop
    FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(pass_len) AS BIGINT) AS pass_len,
       CAST(sum(pass_word) AS BIGINT) AS pass_word,
       CAST(sum(pass_stop) AS BIGINT) AS pass_stop,
       CAST(sum(pass_len * pass_word * pass_stop) AS BIGINT) AS pass_all,
       round(CAST(sum(pass_len * pass_word * pass_stop) AS DOUBLE)
             / count(*), 6) AS keep_rate
FROM scored GROUP BY source
""",
)
def corpus_quality_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter RULE ABLATION per source: how many documents
    pass each sub-rule of the composite quality score (token-count
    band, mean-token-length band, stopword density) independently,
    and how many pass all three — which tells you WHICH rule is doing
    the cutting in each source before you ship a threshold change
    (pipeline_quality_filter gives the verdict; this explains it, the
    dq_rule_violations pattern applied to the curation filter).

    Scale shape: all rule flags are map-side expressions over one
    tokenization, collapsed in ONE partial-aggregated group-by at
    source grain — adding a rule adds an expression, never a pass."""
    from duckdb_hdfs_spark.functions.text import stopword_hits

    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast(
            "double"
        )
        / n
    )
    stop_ratio = stopword_hits(toks, "en").cast("double") / n
    scored = docs.select(
        "source",
        F.when(
            (n >= QUALITY_TOKENS_MIN) & (n <= QUALITY_TOKENS_MAX), 1
        ).otherwise(0).alias("pass_len"),
        F.when(
            (mean_len >= QUALITY_MEAN_LEN_MIN)
            & (mean_len <= QUALITY_MEAN_LEN_MAX),
            1,
        )
        .otherwise(0)
        .alias("pass_word"),
        F.when(stop_ratio >= QUALITY_STOP_RATIO_MIN, 1)
        .otherwise(0)
        .alias("pass_stop"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pass_len").cast("long").alias("pass_len"),
        F.sum("pass_word").cast("long").alias("pass_word"),
        F.sum("pass_stop").cast("long").alias("pass_stop"),
        F.sum(
            F.col("pass_len") * F.col("pass_word") * F.col("pass_stop")
        )
        .cast("long")
        .alias("pass_all"),
        F.round(
            F.sum(
                F.col("pass_len") * F.col("pass_word") * F.col("pass_stop")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
@query(
    "text_dsir_weights",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, lang, {md5_int60_sql('t.tok')} % 128 AS bkt
    FROM (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents) t
    WHERE t.tok <> ''
),
bstats AS (
    SELECT bkt, count(*) AS raw_c,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_c
    FROM tok GROUP BY bkt
),
tot AS (
    SELECT sum(raw_c) AS n_raw, sum(tgt_c) AS n_tgt FROM bstats
),
lr AS (
    SELECT bkt,
           CAST(round(
               ln((CAST(tgt_c AS DOUBLE) + 1) / (CAST(n_tgt AS DOUBLE) + 128))
               - ln((CAST(raw_c AS DOUBLE) + 1)
                    / (CAST(n_raw AS DOUBLE) + 128)), 6)
           AS DECIMAL(20,8)) AS w
    FROM bstats CROSS JOIN tot
),
db AS (
    SELECT doc_id, bkt, count(*) AS n_b FROM tok GROUP BY doc_id, bkt
)
SELECT doc_id,
       CAST(sum(n_b) AS BIGINT) AS n_tokens,
       CAST(round(sum(CAST(n_b AS DECIMAL(20,8)) * w), 4) AS DOUBLE)
           AS dsir_logratio
FROM db JOIN lr USING (bkt)
GROUP BY doc_id
""",
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169) —
    data selection by importance resampling (round 8): each document
    scores the log importance ratio of a TARGET domain (here the
    English sub-corpus standing in for the high-quality target) over
    the RAW corpus, under hashed-unigram bag-of-words LMs with
    Laplace smoothing over 128 hash buckets.  High scores mark
    documents the target distribution up-weights; downstream
    selection samples proportionally (sample_quality_resample is the
    md5-deterministic sampler these weights feed).

    Determinism: the 128 per-bucket log-ratios round to 6 decimals
    then enter DECIMAL products/sums (the unigram-logprob recipe), so
    per-doc totals are order-independent and engine-exact; md5-hashed
    bucketing is the engines' shared portable hash.

    Scale shape: hashed features make the "vocabulary" CONSTANT-size
    (128 buckets, not Heaps-law) — the bucket-LM build is one
    partial-aggregated pass to bucket grain, totals are a broadcast
    1-row fold, and the per-doc score joins the 128-row weight table
    BROADCAST onto (doc, bucket) counts: no vocabulary-sized shuffle
    anywhere, unlike the exact-unigram LM keys."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).filter(F.col("tok") != "")
    tokb = tok.select(
        "doc_id", "lang", (md5_int60(F.col("tok")) % 128).alias("bkt")
    )
    bstats = (
        tokb.groupBy("bkt")
        .agg(
            F.count(F.lit(1)).alias("raw_c"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
                "tgt_c"
            ),
        )
        # the totals fold and the weight table both read the bucket
        # stats; 128 rows — materialize once
        .localCheckpoint(eager=True)
    )
    tot = bstats.agg(
        F.sum("raw_c").alias("n_raw"), F.sum("tgt_c").alias("n_tgt")
    )
    lr = bstats.join(F.broadcast(tot)).select(
        "bkt",
        F.round(
            F.log(
                (F.col("tgt_c").cast("double") + 1)
                / (F.col("n_tgt").cast("double") + 128)
            )
            - F.log(
                (F.col("raw_c").cast("double") + 1)
                / (F.col("n_raw").cast("double") + 128)
            ),
            6,
        )
        .cast("decimal(20,8)")
        .alias("w"),
    )
    db = tokb.groupBy("doc_id", "bkt").agg(F.count(F.lit(1)).alias("n_b"))
    return (
        db.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.sum("n_b").cast("bigint").alias("n_tokens"),
            # round the DECIMAL sum, not its double cast: n_b * w sums
            # are exact 6-dp decimals, so ~1/100 docs land exactly on a
            # 4-dp half boundary, where double-path rounding depends on
            # which side of .5 the nearest binary double falls (the
            # round-12 NULL-sweep holdout: doc sum -0.77765 → Spark's
            # BigDecimal shortest-repr HALF_UP said -0.7777, DuckDB's
            # binary round said -0.7776).  Decimal HALF_UP is exact and
            # engine-portable on both sides; cast to double afterwards.
            F.round(
                F.sum(F.col("n_b").cast("decimal(20,8)") * F.col("w")), 4
            )
            .cast("double")
            .alias("dsir_logratio"),
        )
    )


# --------------------------------------------------------------------------
#: CCNet-style perplexity bucket labels, ordered best-fluency first.
PPL_BUCKETS = ("head", "middle", "tail")


def _ppl_buckets_oracle() -> str:
    return f"""
WITH {_BIGRAMS_SQL},
lp AS (
    SELECT doc_id,
           round(CAST(sum(
               CAST(n_b AS DECIMAL(20, 8))
               * CAST(round(ln(CAST(cb AS DOUBLE)) - ln(CAST(cu AS DOUBLE)), 6)
                      AS DECIMAL(20, 8))
           ) AS DOUBLE) / sum(n_b), 4) AS mean_logprob
    FROM bgf
    JOIN bvocab USING (bigram)
    JOIN uvocab ON split_part(bigram, ' ', 1) = uvocab.w1
    GROUP BY doc_id
),
panel AS (
    SELECT d.lang, lp.mean_logprob,
           row_number() OVER (PARTITION BY d.lang
                              ORDER BY lp.mean_logprob DESC, lp.doc_id) AS rk,
           count(*) OVER (PARTITION BY d.lang) AS n
    -- doc-grain lang lookup: lp already collapses a replayed doc's
    -- twins (GROUP BY doc_id), so the lang join must not fan the
    -- panel back out (duplicated-rows audit, round 10)
    FROM lp JOIN (SELECT DISTINCT doc_id, lang FROM documents) d
        USING (doc_id)
)
SELECT lang,
       CASE least(2, (3 * (rk - 1)) // n)
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       round(CAST(sum(CAST(mean_logprob AS DECIMAL(20,4))) AS DOUBLE)
             / count(*), 4) AS avg_logprob,
       min(mean_logprob) AS min_logprob,
       max(mean_logprob) AS max_logprob
FROM panel GROUP BY lang, bucket
"""


@query("corpus_perplexity_buckets", oracle=_ppl_buckets_oracle())
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail fluency bucketing (Wenzek et al.
    2020): rank every document by its bigram-LM mean log-probability
    WITHIN ITS LANGUAGE (per-language terciles — the step that keeps
    low-resource languages from being judged by the high-resource
    model's scale) and summarize each bucket.  Corpus pipelines keep
    head+middle and drop or down-weight tail.

    Determinism: the per-doc score is text_bigram_logprob's exact
    recipe (shared helper); ranks order by (score DESC, doc_id); the
    tercile index least(2, 3·(rk−1) div n) is pure integer math; the
    bucket average sums 4dp scores in DECIMAL.

    Scale shape: the LM panel inherits the bigram op's shape (bounded
    vocab checkpoint, partial-agged shuffles); the per-language rank
    runs through operators/ranks.grouped_cumsum (range-bucketed —
    never one task per language, even with 5 languages over 10⁹
    docs); output is ≤ 3·|langs| rows."""
    from duckdb_hdfs_spark.operators.ranks import grouped_cumsum

    docs = _t(spark, sf_dir, "documents")
    # lang rides the helper's group-bys (free: constant per doc) —
    # no second documents scan to re-attach it
    panel = (
        _doc_bigram_logprob(docs, carry=("lang",))
        .select("doc_id", "lang", "mean_logprob")
        .withColumn("one", F.lit(1))
    )
    ranked = grouped_cumsum(
        panel,
        ["lang"],
        [("mean_logprob", "desc"), ("doc_id", "asc")],
        val="one",
        out="rk",
    )
    n = panel.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    bucket_ix = F.least(
        F.lit(2), F.expr("(3 * (rk - 1)) div n")
    )
    bucket = (
        F.when(bucket_ix == 0, PPL_BUCKETS[0])
        .when(bucket_ix == 1, PPL_BUCKETS[1])
        .otherwise(PPL_BUCKETS[2])
    )
    return (
        ranked.join(F.broadcast(n), "lang")
        .select("lang", bucket.alias("bucket"), "mean_logprob")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("mean_logprob").cast("decimal(20,4)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("avg_logprob"),
            F.min("mean_logprob").alias("min_logprob"),
            F.max("mean_logprob").alias("max_logprob"),
        )
    )


# --------------------------------------------------------------------------
#: Total evaluation/annotation budget the Neyman allocator divides.
NEYMAN_BUDGET = 1000


def _neyman_oracle() -> str:
    return f"""
WITH s AS (
    SELECT source, count(*) AS n_h,
           sum(CAST(n_chars AS DECIMAL(20,0))) AS s1,
           sum(CAST(n_chars AS DECIMAL(20,0)) * n_chars) AS s2
    FROM documents GROUP BY source
),
v AS (
    SELECT source, n_h,
           sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / n_h) / nullif(n_h - 1, 0)) AS s_h
    FROM s
),
w AS (
    SELECT source, n_h, s_h,
           CAST(round(n_h * s_h, 6) AS DECIMAL(28,6)) AS w_h
    FROM v
),
t AS (SELECT CAST(sum(w_h) AS DOUBLE) AS w_tot, sum(n_h) AS n_tot FROM w)
SELECT w.source,
       CAST(w.n_h AS BIGINT) AS stratum_size,
       round(w.s_h, 4) AS stratum_std,
       CAST(round({NEYMAN_BUDGET} * CAST(w.w_h AS DOUBLE) / t.w_tot, 0)
            AS BIGINT) AS neyman_n,
       CAST(round({NEYMAN_BUDGET} * CAST(w.n_h AS DOUBLE) / t.n_tot, 0)
            AS BIGINT) AS proportional_n,
       round({NEYMAN_BUDGET} * CAST(w.w_h AS DOUBLE) / t.w_tot / w.n_h, 6)
           AS sampling_fraction
FROM w CROSS JOIN t
"""


@query("sample_neyman_allocation", oracle=_neyman_oracle())
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation per source
    (round 9; Neyman 1934): split a fixed annotation/eval budget of
    1000 across source strata proportional to N_h·S_h —
    high-variance strata earn more than their share of rows, which
    minimizes the estimator variance at fixed cost.  The DESIGN
    layer the sampling family was missing: sample_hash_split draws,
    sample_stratified_topk ranks within strata, this op says how
    MANY to draw from each; the proportional column quantifies what
    Neyman buys over naive allocation.

    Determinism: per-stratum power sums are exact DECIMAL; S_h is
    one IEEE sqrt of a fixed-order expression (mirrored n=1 guard);
    the weights round to 6 dp into DECIMAL before the total, so the
    allocation divisions see identical inputs.

    Scale shape: ONE partial-aggregated scan of documents to the
    per-source panel; everything after is panel-sized with a 1-row
    broadcast total."""
    docs = _t(spark, sf_dir, "documents")
    cd = F.col("n_chars").cast("decimal(20,0)")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(cd).alias("s1"),
        F.sum(cd * F.col("n_chars")).alias("s2"),
    )
    s_h = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n_h")
        )
        / F.nullif(F.col("n_h") - 1, F.lit(0))
    )
    w = s.select(
        "source",
        "n_h",
        s_h.alias("s_h"),
        F.round(F.col("n_h") * s_h, 6).cast("decimal(28,6)").alias("w_h"),
    ).localCheckpoint(eager=True)
    t = w.agg(
        F.sum("w_h").cast("double").alias("w_tot"),
        F.sum("n_h").alias("n_tot"),
    )
    return w.join(F.broadcast(t)).select(
        "source",
        F.col("n_h").cast("bigint").alias("stratum_size"),
        F.round("s_h", 4).alias("stratum_std"),
        F.round(
            NEYMAN_BUDGET * F.col("w_h").cast("double") / F.col("w_tot"), 0
        )
        .cast("bigint")
        .alias("neyman_n"),
        F.round(
            NEYMAN_BUDGET * F.col("n_h").cast("double") / F.col("n_tot"), 0
        )
        .cast("bigint")
        .alias("proportional_n"),
        F.round(
            NEYMAN_BUDGET
            * F.col("w_h").cast("double")
            / F.col("w_tot")
            / F.col("n_h"),
            6,
        ).alias("sampling_fraction"),
    )
