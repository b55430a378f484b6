"""Text-analysis registry entries (SURVEY.md §2.7) over the
``documents`` table, built on functions/text.py expression pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_hdfs_spark.functions.hashing import (
    md5_int60,
    md5_int60_sql,
    tokens,
    tokens_sql,
    word_kgrams,
    ws_fold,
    ws_fold_sql,
)
from duckdb_hdfs_spark.functions.text import (
    lang_id,
    lang_id_sql,
    punct_count,
    punct_count_sql,
    quality_score,
    quality_score_sql,
    stopword_hits,
    stopword_hits_sql,
)
from duckdb_hdfs_spark.operators.dedup import NORM_SQL
from duckdb_hdfs_spark.queries import query
from duckdb_hdfs_spark.queries._helpers import _t

_TOKS = tokens_sql("text")
# portable case fold — THE normalization contract, imported rather
# than re-spelled so the casefold pair table has a single source of
# truth (round-9 advisor; unicode audit r9)
_NORM = NORM_SQL
_NORM_INT60 = md5_int60_sql(_NORM)


# --------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(list_distinct({_TOKS})) AS n_unique,
       CAST(list_reduce(list_transform({_TOKS}, t -> length(t)),
            (a, b) -> a + b) AS DOUBLE) / len({_TOKS}) AS mean_tok_len,
       length(text) AS n_chars,
       {punct_count_sql('text')} AS n_punct
FROM documents
""",
    headline=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — the base feature pass every
    corpus pipeline runs first.  Pure map work; the only exchange is
    the graded scan-parallelism rebalance (round 12: the sf1.0 scale
    run's stage profile showed the whole tokenize+stats projection
    pinned to the scan's 2 splits — 2.3s of task time, serial; the
    same single-file trap the MinHash pipeline hit in round 7, fixed
    by the same proportional grade, which is a no-op on well-split
    production data where splits >> cores)."""
    from duckdb_hdfs_spark.operators.rebalance import rebalance_cpu_heavy

    docs = rebalance_cpu_heavy(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        (
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
            / F.size(toks)
        ).alias("mean_tok_len"),
        F.length("text").alias("n_chars"),
        punct_count(F.col("text")).alias("n_punct"),
    )


# --------------------------------------------------------------------------
@query(
    "text_langid",
    oracle=f"""
SELECT pred_lang, lang AS actual_lang, count(*) AS n_docs
FROM (SELECT {lang_id_sql(_TOKS)} AS pred_lang, lang FROM documents WHERE text IS NOT NULL)
GROUP BY pred_lang, lang
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the labelled lang column
    (confusion counts)."""
    # NULL text is unclassifiable — excluded on both engines
    # (NULL-injection audit r9)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return (
        docs.select(
            lang_id(tokens(F.col("text"))).alias("pred_lang"),
            F.col("lang").alias("actual_lang"),
        )
        .groupBy("pred_lang", "actual_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       round({quality_score_sql('text', _TOKS)}, 4) AS quality,
       {stopword_hits_sql(_TOKS, 'en')} AS en_stop_hits
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score per document (length band + mean token
    length band + stopword density)."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(quality_score(F.col("text"), toks), 4).alias("quality"),
        stopword_hits(toks, "en").alias("en_stop_hits"),
    )


# --------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5({_NORM}) AS doc_hash,
       list_min(list_transform(
           generate_series(1, greatest(len({_TOKS}) - 4, 1)),
           i -> md5({_TOKS}[i] || ' ' || coalesce({_TOKS}[i+1], '') || ' '
                    || coalesce({_TOKS}[i+2], '') || ' '
                    || coalesce({_TOKS}[i+3], '') || ' '
                    || coalesce({_TOKS}[i+4], ''))
       )) AS win_fingerprint,
       {_NORM_INT60} AS fp_bucket
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-doc content hash + winnowing-style
    minimum over word-5-gram hashes (stable under small edits) + a
    60-bit integer bucket for partitioned storage."""
    docs = _t(spark, sf_dir, "documents")
    from duckdb_hdfs_spark.operators.dedup import norm_text

    norm = norm_text(F.col("text"))
    # gram build is lambda-safe (see hashing.word_kgrams); md5 maps the
    # materialized gram array, touching only the lambda variable.
    gram5 = word_kgrams(tokens(F.col("text")), 5)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("doc_hash"),
        F.array_min(F.transform(gram5, lambda s: F.md5(s))).alias("win_fingerprint"),
        md5_int60(norm).alias("fp_bucket"),
    )


# --------------------------------------------------------------------------
#: BPE-ish pre-tokenizer: alnum runs OR single non-alnum-non-space
#: chars (every CJK char is its own token).  Explicit ASCII classes —
#: Java and RE2 agree on these, unlike \w / POSIX classes.
_BPE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


@query(
    "text_bpe_tokens",
    oracle=rf"""
SELECT doc_id,
       len(regexp_extract_all({ws_fold_sql('text')}, '{_BPE_RE}')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word_tokens,
       len(regexp_extract_all({ws_fold_sql('text')}, '{_BPE_RE}'))
           - len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_symbol_tokens
FROM documents
""",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-style pre-tokenizer regex (alnum
    runs + individual symbols) — the context-budget estimate training
    pipelines need before the real tokenizer runs.  Pure map work."""
    docs = _t(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(ws_fold(F.col("text")), F.lit(_BPE_RE), F.lit(0)))
    words = F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+', 0)"))
    return docs.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        words.alias("n_word_tokens"),
        (bpe - words).alias("n_symbol_tokens"),
    )


# --------------------------------------------------------------------------
@query(
    "text_ngram_freq",
    oracle=f"""
SELECT ngram, n
FROM (
    SELECT g AS ngram, count(*) AS n
    FROM (
        SELECT unnest(list_transform(
            generate_series(1, greatest(len({_TOKS}) - 1, 1)),
            i -> {_TOKS}[i] || ' ' || coalesce({_TOKS}[i+1], ''))) AS g
        -- NULL text excluded symmetrically with Spark's explode of a
        -- NULL bigram array (all-NULL audit, round 10): greatest(NULL, 1)
        -- ignores the NULL on DuckDB and smuggled a NULL gram through
        FROM documents WHERE text IS NOT NULL
    )
    GROUP BY g
)
ORDER BY n DESC, ngram
LIMIT 20
""",
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequency top-20 (explode → count → top-N
    with deterministic tiebreak).  Scale: partial aggregation absorbs
    the explosion before the shuffle; top-N is TakeOrdered."""
    docs = _t(spark, sf_dir, "documents")
    bigrams = word_kgrams(tokens(F.col("text")), 2)
    return (
        docs.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "ngram")
        .limit(20)
    )


# --------------------------------------------------------------------------
CHUNK_LEN = 64   # tokens per chunk
CHUNK_STRIDE = 48  # overlap = CHUNK_LEN - CHUNK_STRIDE


@query(
    "text_chunk_windows",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
idx AS (
    SELECT doc_id, toks,
           unnest(generate_series(0,
               greatest(len(toks) - 1, 0) // {CHUNK_STRIDE})) AS chunk_idx
    FROM t
)
SELECT doc_id, chunk_idx,
       len(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                      chunk_idx * {CHUNK_STRIDE} + {CHUNK_LEN})) AS n_tokens,
       md5(array_to_string(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                      chunk_idx * {CHUNK_STRIDE} + {CHUNK_LEN}), ' ')) AS chunk_md5
FROM idx
WHERE len(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                     chunk_idx * {CHUNK_STRIDE} + {CHUNK_LEN})) > 0
""",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking ({CHUNK_LEN}-token chunks,
    {CHUNK_STRIDE}-token stride): explode chunk INDICES first, then
    slice per (doc, chunk) row — the generator runs per row, so the
    token split is evaluated once per chunk row, never per array
    element (see the HOF rule in functions/hashing.py).  Pure map
    work; chunk count per doc is ceil(len/stride)."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_chunks = F.greatest(F.size(toks) - 1, F.lit(0)) / CHUNK_STRIDE
    idx = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0), n_chunks.cast("bigint"))
        ).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("toks"),
        (F.col("chunk_idx") * CHUNK_STRIDE + 1).cast("int"),
        CHUNK_LEN,
    )
    return (
        idx.select(
            "doc_id",
            "chunk_idx",
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
        .filter(F.col("n_tokens") > 0)
    )


# --------------------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM_RE = r"[0-9][0-9 \-]{6,}[0-9]"


@query(
    "text_scrub_pii",
    oracle=rf"""
SELECT doc_id,
       length(text) - length(regexp_replace(text, '{_EMAIL_RE}', '', 'g'))
           AS email_chars,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g')) AS scrubbed_md5,
       length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                             '{_LONGNUM_RE}', '<NUM>', 'g')) AS scrubbed_len
FROM documents
""",
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: redact email addresses and long digit
    runs (ASCII regex classes — Java and RE2 agree), returning the
    scrubbed digest + removed-char accounting.  Pure map work; the
    production pass would stack more patterns the same way."""
    docs = _t(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _LONGNUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), _EMAIL_RE, ""))
        ).alias("email_chars"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


# --------------------------------------------------------------------------
@query(
    "text_code_detection",
    oracle=r"""
SELECT doc_id,
       CAST(length(text) - length(replace(replace(replace(replace(
                text, '{', ''), '}', ''), ';', ''), '=', '')) AS BIGINT)
           AS n_code_chars,
       CAST(len(regexp_extract_all(
                text, '(def |class |import |return |void |public )'))
            AS BIGINT) AS n_keywords,
       round(CAST(length(text) - length(replace(replace(replace(replace(
                text, '{', ''), '}', ''), ';', ''), '=', '')) AS DOUBLE)
             / nullif(length(text), 0), 5) AS symbol_ratio,
       (CAST(length(text) - length(replace(replace(replace(replace(
                text, '{', ''), '}', ''), ';', ''), '=', '')) AS DOUBLE)
            / nullif(length(text), 0) > 0.02
        OR len(regexp_extract_all(
               text, '(def |class |import |return |void |public )')) >= 3)
           AS looks_like_code
FROM documents
""",
)
def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection heuristic (round 5): the curation
    signal that routes documents to a code-specific pipeline (or out
    of a prose corpus) — symbol density ({} ; =) plus programming
    keyword hits, the cheap precursor to a fasttext classifier.
    Counting via length-difference-after-replace is exact and
    engine-identical; the flag compares the UNROUNDED ratio.
    Map-only, zero shuffles.

    An EMPTY document NULLs the ratio via mirrored nullif guards
    instead of crashing the scan (Spark ANSI throws on /0 while
    DuckDB's behavior is version-dependent — extreme-values audit,
    round 10); the code flag then propagates NULL identically on
    both engines (NULL > 0.02 OR false = NULL)."""
    docs = _t(spark, sf_dir, "documents")
    stripped = F.col("text")
    for ch in ("{", "}", ";", "="):
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    n_code = (F.length("text") - F.length(stripped)).cast("bigint")
    n_kw = F.size(
        F.expr(
            r"regexp_extract_all(text,"
            r" '(def |class |import |return |void |public )', 0)"
        )
    ).cast("bigint")
    ratio = n_code.cast("double") / F.nullif(F.length("text"), F.lit(0))
    return docs.select(
        "doc_id",
        n_code.alias("n_code_chars"),
        n_kw.alias("n_keywords"),
        F.round(ratio, 5).alias("symbol_ratio"),
        ((ratio > 0.02) | (n_kw >= 3)).alias("looks_like_code"),
    )


# --------------------------------------------------------------------------
@query(
    "text_tokenizer_fertility",
    oracle=rf"""
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all({ws_fold_sql('text')}, '{_BPE_RE}'))) AS BIGINT)
           AS total_bpe_tokens,
       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
           AS total_word_tokens,
       round(CAST(sum(len(regexp_extract_all({ws_fold_sql('text')}, '{_BPE_RE}'))) AS DOUBLE)
             / sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))), 6)
           AS fertility,
       round(CAST(sum(n_chars) AS DOUBLE)
             / sum(len(regexp_extract_all({ws_fold_sql('text')}, '{_BPE_RE}'))), 6)
           AS chars_per_token
FROM documents
GROUP BY source, lang
""",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility panel per (source, lang): BPE-ish tokens
    per whitespace word (fertility — the classic cross-lingual
    tokenizer-cost metric) and characters per token — what a training
    team reads to price each slice's context-window cost before
    committing mix weights (a high-fertility slice buys fewer
    effective documents per token budget).

    Scale shape: pure map work (two regexp token counts per doc)
    into ONE partial-aggregated group-by at (source × lang) grain;
    integer token sums are exact, the two ratios are single
    long/long IEEE divisions rounded identically on both engines."""
    docs = _t(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(ws_fold(F.col("text")), F.lit(_BPE_RE), F.lit(0))
    )
    words = F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+', 0)"))
    return (
        docs.select("source", "lang", "n_chars", bpe.alias("b"), words.alias("w"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("b").alias("total_bpe_tokens"),
            F.sum("w").alias("total_word_tokens"),
            F.round(
                F.sum("b").cast("double") / F.sum("w"), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("b"), 6
            ).alias("chars_per_token"),
        )
    )


# --------------------------------------------------------------------------
@query(
    "text_pii_prevalence",
    oracle=rf"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{_EMAIL_RE}'))) AS BIGINT)
           AS n_emails,
       CAST(sum(len(regexp_extract_all(text, '{_LONGNUM_RE}'))) AS BIGINT)
           AS n_longnums,
       CAST(sum(CASE WHEN len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
                       OR len(regexp_extract_all(text, '{_LONGNUM_RE}')) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       round(CAST(sum(CASE WHEN
                     len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
                       OR len(regexp_extract_all(text, '{_LONGNUM_RE}')) > 0
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
           AS pii_doc_rate
FROM documents GROUP BY source
""",
)
def text_pii_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII PREVALENCE panel per source: occurrence counts per PII
    class (emails, long digit runs) and the share of documents
    carrying any — the measurement that decides whether a source
    needs the scrub pass at all and audits it afterwards
    (text_scrub_pii redacts; this reports — run it before AND after,
    the after-rate should be zero).

    Scale shape: two regexp_extract_all counts per doc, map-side,
    into one source-grain partial-aggregated rollup."""
    docs = _t(spark, sf_dir, "documents")
    # Python API, NOT F.expr: SQL string-literal unescaping turns the
    # pattern's '\.' into a bare '.' wildcard, so the expr form
    # counted dot-less emails (user@localhost) the oracle rejects —
    # verified divergence (round-7 review finding)
    n_em = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0))
    )
    n_num = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_LONGNUM_RE), F.lit(0))
    )
    flagged = docs.select(
        "source",
        n_em.alias("ne"),
        n_num.alias("nn"),
        F.when((n_em > 0) | (n_num > 0), 1).otherwise(0).alias("has_pii"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ne").cast("bigint").alias("n_emails"),
        F.sum("nn").cast("bigint").alias("n_longnums"),
        F.sum("has_pii").cast("bigint").alias("n_docs_with_pii"),
        F.round(
            F.sum("has_pii").cast("double") / F.count(F.lit(1)), 6
        ).alias("pii_doc_rate"),
    )


# --------------------------------------------------------------------------
#: Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
#: Models: ... Gopher", Table A1 — the published heuristic filter set).
GOPHER_WORDS_MIN = 50
GOPHER_WORDS_MAX = 100_000
GOPHER_MEAN_WLEN_MIN = 3.0
GOPHER_MEAN_WLEN_MAX = 10.0
GOPHER_SYMBOL_RATIO_MAX = 0.1
GOPHER_BULLET_FRAC_MAX = 0.9
GOPHER_ELLIPSIS_FRAC_MAX = 0.3
GOPHER_ALPHA_FRAC_MIN = 0.8
GOPHER_STOPWORDS_MIN = 2
#: the paper's required-stopword set
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_oracle() -> str:
    n = f"len({_TOKS})"
    mean_wlen = (
        f"CAST(list_reduce(list_transform({_TOKS}, t -> length(t)), "
        f"(a, b) -> a + b) AS DOUBLE) / {n}"
    )
    n_hash = "length(text) - length(replace(text, '#', ''))"
    n_ell = "(length(text) - length(replace(text, '...', ''))) / 3"
    lines = "string_split(text, chr(10))"
    bullet_frac = (
        f"CAST(len(list_filter({lines}, l ->"
        f" substr(ltrim(l), 1, 1) IN ('-', '*'))) AS DOUBLE) / len({lines})"
    )
    ell_frac = (
        f"CAST(len(list_filter({lines}, l ->"
        f" substr(rtrim(l), length(rtrim(l)) - 2, 3) = '...')) AS DOUBLE)"
        f" / len({lines})"
    )
    alpha_frac = (
        f"CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]')))"
        f" AS DOUBLE) / {n}"
    )
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPS)
    n_stops = f"len(list_filter([{stops}], w -> list_contains({_TOKS}, w)))"
    rules = {
        "f_words": f"({n} < {GOPHER_WORDS_MIN} OR {n} > {GOPHER_WORDS_MAX})",
        "f_wlen": f"({mean_wlen} < {GOPHER_MEAN_WLEN_MIN}"
        f" OR {mean_wlen} > {GOPHER_MEAN_WLEN_MAX})",
        "f_symbol": f"(CAST({n_hash} + {n_ell} AS DOUBLE) / {n}"
        f" > {GOPHER_SYMBOL_RATIO_MAX})",
        "f_bullet": f"({bullet_frac} > {GOPHER_BULLET_FRAC_MAX})",
        "f_ellipsis": f"({ell_frac} > {GOPHER_ELLIPSIS_FRAC_MAX})",
        "f_alpha": f"({alpha_frac} < {GOPHER_ALPHA_FRAC_MIN})",
        "f_stop": f"({n_stops} < {GOPHER_STOPWORDS_MIN})",
    }
    flags = ", ".join(
        f"CASE WHEN {expr} THEN 1 ELSE 0 END AS {name}"
        for name, expr in rules.items()
    )
    sums = ", ".join(
        f"CAST(sum({name}) AS BIGINT) AS n_{name}" for name in rules
    )
    any_fail = " + ".join(rules.keys())
    return f"""
WITH flagged AS (SELECT source, {flags} FROM documents)
SELECT source, count(*) AS n_docs, {sums},
       CAST(sum(CASE WHEN {any_fail} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_all,
       round(CAST(sum(CASE WHEN {any_fail} = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS pass_rate
FROM flagged GROUP BY source
"""


@query("text_gopher_rules", oracle=_gopher_oracle())
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule Gopher quality-filter panel (Rae et al. 2021 Table A1)
    aggregated by source: word-count band, mean-word-length band,
    symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    alphabetic-word fraction, and the required-stopword floor — the
    RULE-LEVEL breakdown a curation run reads to see WHICH filter is
    biting a source (text_quality scores a composite; the keep/drop
    verdict is pipeline_quality_filter; this is the per-rule audit
    between them).

    Determinism: every signal is integer counting plus one final
    division (single IEEE op) — bit-identical cross-engine.

    Scale shape: pure map work over the documents scan (one token
    split feeds every rule; lines split only for the two line rules)
    followed by one partial-aggregated group-by on the low-cardinality
    source key — scan-bound at 100 TB, zero joins, zero windows."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    mean_wlen = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast(
            "double"
        )
        / n
    )
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ell = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / 3
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*"),
            )
        ).cast("double")
        / n_lines
    )
    ell_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(
                    F.rtrim(l), -3, 3
                ) == "...",
            )
        ).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    n_stops = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPS]),
            lambda w: F.array_contains(toks, w),
        )
    )
    rules = {
        "f_words": (n < GOPHER_WORDS_MIN) | (n > GOPHER_WORDS_MAX),
        "f_wlen": (mean_wlen < GOPHER_MEAN_WLEN_MIN)
        | (mean_wlen > GOPHER_MEAN_WLEN_MAX),
        "f_symbol": (n_hash + n_ell).cast("double") / n
        > GOPHER_SYMBOL_RATIO_MAX,
        "f_bullet": bullet_frac > GOPHER_BULLET_FRAC_MAX,
        "f_ellipsis": ell_frac > GOPHER_ELLIPSIS_FRAC_MAX,
        "f_alpha": alpha_frac < GOPHER_ALPHA_FRAC_MIN,
        "f_stop": n_stops < GOPHER_STOPWORDS_MIN,
    }
    flagged = docs.select(
        "source",
        *[
            F.when(expr, 1).otherwise(0).alias(name)
            for name, expr in rules.items()
        ],
    )
    any_fail = sum(F.col(name) for name in rules)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(name).cast("bigint").alias(f"n_{name}")
            for name in rules
        ],
        F.sum(F.when(any_fail == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_all"),
        F.round(
            F.sum(F.when(any_fail == 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("pass_rate"),
    )


# --------------------------------------------------------------------------
#: Zipf fit: number of head ranks the log-log OLS line is fit over.
#: 200 is deep enough that the slope is stable, shallow enough that
#: the head is genuinely Zipfian (the tail flattens on any corpus).
ZIPF_TOP_N = 200


def _zipf_oracle() -> str:
    return f"""
WITH tok AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
),
freq AS (
    SELECT tok, count(*) AS c FROM tok WHERE tok != '' GROUP BY tok
),
head AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rnk
    FROM freq
    ORDER BY c DESC, tok ASC LIMIT {ZIPF_TOP_N}
),
pts AS (
    SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(20,8)) AS lx,
           CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(20,8)) AS ly
    FROM head
),
s AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(lx) AS DOUBLE) AS sx,
           CAST(sum(ly) AS DOUBLE) AS sy,
           CAST(sum(lx * ly) AS DOUBLE) AS sxy,
           CAST(sum(lx * lx) AS DOUBLE) AS sxx,
           CAST(sum(ly * ly) AS DOUBLE) AS syy
    FROM pts
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
           AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx)
             / n, 6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6)
           AS r_squared
FROM s
"""


@query("text_zipf_slope", oracle=_zipf_oracle())
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: OLS slope
    of ln(freq) on ln(rank) across the top ZIPF_TOP_N token ranks.
    A natural-language corpus fits slope ~ -1 with high R^2; a slope
    far from -1 or a poor fit flags template spam, log dumps, or
    tokenizer damage — the corpus-level LANGUAGE-SHAPE audit that
    complements per-document signals (text_quality, text_repetition).

    Determinism: per-point logs round to 6 decimals THEN sum in
    DECIMAL(20,8) (the text_unigram_logprob discipline — rounding
    before accumulation makes the sums order-independent and
    engine-exact); slope/intercept/R^2 assemble in fixed-order double
    arithmetic with mirrored nullif guards.

    Scale shape: one corpus tokenize -> partial-aggregated frequency
    shuffle; the head selection is orderBy(...).limit(N) =
    TakeOrderedAndProject, a bounded N-element heap per partition
    merged once — never a global sort or a partition-less
    row_number window (rank via operators/ranks.panel_rank); the
    OLS fold is over N rows."""
    from duckdb_hdfs_spark.operators.ranks import panel_rank

    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    head = freq.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(
        ZIPF_TOP_N
    )
    # rank within the N-row head: a window here would be
    # partition-less, so use the shared broadcast theta-join rank
    # (operators/ranks.panel_rank checkpoints the head, pinning ONE
    # evaluation of the corpus tokenize+freq scan)
    ranked = panel_rank(head, [("c", "desc"), ("tok", "asc")], "rnk")
    lx = F.round(F.log(F.col("rnk").cast("double")), 6).cast("decimal(20,8)")
    ly = F.round(F.log(F.col("c").cast("double")), 6).cast("decimal(20,8)")
    pts = ranked.select(lx.alias("lx"), ly.alias("ly"))
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("double").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("double").alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        n.cast("bigint").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / F.nullif(
                (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
            ),
            6,
        ).alias("r_squared"),
    )


# --------------------------------------------------------------------------
def _readability_oracle() -> str:
    return f"""
WITH d AS (
    SELECT source,
           len(list_filter({_TOKS}, t -> t != '')) AS w,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS v
    FROM documents
),
agg AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(w) AS BIGINT) AS words,
           CAST(sum(s) AS BIGINT) AS sentences,
           CAST(sum(v) AS BIGINT) AS syllables_est
    FROM d GROUP BY source
)
SELECT source, n_docs, words, sentences, syllables_est,
       round(CAST(words AS DOUBLE) / sentences, 6) AS words_per_sentence,
       round(CAST(syllables_est AS DOUBLE) / nullif(words, 0), 6)
           AS syllables_per_word,
       round(206.835
             - 1.015 * (CAST(words AS DOUBLE) / sentences)
             - 84.6 * (CAST(syllables_est AS DOUBLE) / nullif(words, 0)), 6)
           AS flesch_score
FROM agg
"""


@query("text_readability", oracle=_readability_oracle())
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease panel per source: words/sentence and
    vowel-group syllable estimate per word, assembled into the
    classic 206.835 - 1.015*(W/S) - 84.6*(Syll/W) score.  The
    audience-difficulty signal curation mixes want next to
    text_quality's spam score: a kids-encyclopedia source and a
    legal-contracts source separate by ~40 Flesch points.

    Syllables use the standard vowel-GROUP heuristic ([aeiouy]+ runs,
    the same first-order approximation CMUdict fallbacks use);
    sentences are [.!?]+ runs floored at 1 per document so headline
    fragments don't divide by zero.  All three signals are exact
    integer counts summed per source (order-independent, bigint),
    the score is one fixed-order double expression — bit-identical
    cross-engine, no transcendentals.

    Scale shape: map-only regex counting (JVM regexp_count — no
    Python), one partial-aggregated shuffle at source grain."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    d = docs.select(
        "source",
        F.size(F.filter(toks, lambda t: t != "")).alias("w"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).alias(
            "v"
        ),
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("s").alias("sentences"),
        F.sum("v").alias("syllables_est"),
    )
    wps = F.col("words").cast("double") / F.col("sentences")
    spw = F.col("syllables_est").cast("double") / F.nullif(
        F.col("words"), F.lit(0)
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables_est",
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(spw, 6).alias("syllables_per_word"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6).alias("flesch_score"),
    )


# --------------------------------------------------------------------------
BURST_MIN_DF = 5
BURST_TOP_K = 20


def _burstiness_oracle() -> str:
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({tokens_sql("text")}) AS term FROM documents
),
td AS (
    SELECT term, doc_id, count(*) AS c FROM tok
    WHERE term <> '' GROUP BY term, doc_id
),
nd AS (SELECT count(*) AS n_docs FROM documents),
st AS (
    SELECT term, count(*) AS df,
           sum(CAST(c AS DECIMAL(20,0))) AS s1,
           sum(CAST(c AS DECIMAL(20,0)) * c) AS s2
    FROM td GROUP BY term HAVING count(*) >= {BURST_MIN_DF}
),
f AS (
    SELECT term, df,
           CAST(s1 AS BIGINT) AS total_tf,
           round((CAST(s2 AS DOUBLE) / n_docs
                  - (CAST(s1 AS DOUBLE) / n_docs)
                    * (CAST(s1 AS DOUBLE) / n_docs))
                 / nullif(CAST(s1 AS DOUBLE) / n_docs, 0), 6) AS fano
    FROM st CROSS JOIN nd
)
SELECT term, CAST(df AS BIGINT) AS df, total_tf, fano
FROM f
ORDER BY fano DESC, term
LIMIT {BURST_TOP_K}
"""


@query("text_term_burstiness", oracle=_burstiness_oracle())
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: top-20 terms by Fano factor (round 9;
    Church & Gale's burstiness, index-of-dispersion form): over ALL
    docs (zeros included), Fano = Var[c]/E[c] — ≈1 for Poisson
    'background' words, ≫1 for terms that cluster into few documents
    (topical/boilerplate markers).  The dispersion complement to
    TF-IDF's rarity and token-entropy's within-doc diversity: two
    terms with identical document frequency can differ 100× in
    burstiness, and bursty high-df terms are the template phrases
    dedup cares about.

    Determinism: per-(term, doc) counts are integers; zeros enter
    through the algebra (Σc, Σc² over present docs + the N_docs
    1-row broadcast), never materialized; the Fano assembles in one
    fixed-order double expression rounded to 6 dp with a mirrored
    zero-mean guard; the top-k orders on (fano DESC, term) — a total
    order, so the cut is engine-stable.

    Scale shape: one explode → partial-agged (term, doc) count →
    partial-agged term rollup (two shuffles, both key-spread); the
    df≥{5} filter prunes the hapax tail before ranking; top-k is
    TakeOrderedAndProject (bounded per-partition heap, never a
    global sort)."""
    docs = _t(spark, sf_dir, "documents")
    td = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    cd = F.col("c").cast("decimal(20,0)")
    st = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(cd).alias("s1"),
        F.sum(cd * F.col("c")).alias("s2"),
    ).filter(F.col("df") >= BURST_MIN_DF)
    mean = F.col("s1").cast("double") / F.col("n_docs")
    fano = F.round(
        (F.col("s2").cast("double") / F.col("n_docs") - mean * mean)
        / F.nullif(mean, F.lit(0.0)),
        6,
    )
    return (
        st.join(F.broadcast(nd))
        .select(
            "term",
            F.col("df").cast("bigint").alias("df"),
            F.col("s1").cast("bigint").alias("total_tf"),
            fano.alias("fano"),
        )
        .orderBy(F.col("fano").desc(), "term")
        .limit(BURST_TOP_K)
    )


# --------------------------------------------------------------------------
def _langid_metrics_oracle() -> str:
    return f"""
WITH conf AS (
    SELECT {lang_id_sql(_TOKS)} AS pred_lang, lang AS actual_lang,
           count(*) AS n
    FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
),
langs AS (SELECT DISTINCT actual_lang AS lang FROM conf),
per AS (
    SELECT l.lang,
           coalesce((SELECT sum(n) FROM conf
                     WHERE actual_lang = l.lang), 0) AS support,
           coalesce((SELECT sum(n) FROM conf
                     WHERE pred_lang = l.lang
                       AND actual_lang = l.lang), 0) AS tp,
           coalesce((SELECT sum(n) FROM conf
                     WHERE pred_lang = l.lang), 0) AS pred_n
    FROM langs l
),
acc AS (
    SELECT CAST(sum(CASE WHEN pred_lang = actual_lang THEN n ELSE 0 END)
                AS DOUBLE) / sum(n) AS accuracy
    FROM conf
)
SELECT per.lang,
       CAST(per.support AS BIGINT) AS support,
       CAST(per.tp AS BIGINT) AS tp,
       round(CAST(per.tp AS DOUBLE) / nullif(per.pred_n, 0), 6)
           AS precision_,
       round(CAST(per.tp AS DOUBLE) / nullif(per.support, 0), 6)
           AS recall_,
       round(2.0 * per.tp / nullif(per.pred_n + per.support, 0), 6)
           AS f1,
       round(acc.accuracy, 6) AS overall_accuracy
FROM per CROSS JOIN acc
"""


@query("text_langid_metrics", oracle=_langid_metrics_oracle())
def text_langid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision / recall / F1 for the stopword
    language-ID heuristic against the labelled lang column (round 9)
    — the classifier-evaluation layer over text_langid's raw
    confusion counts: a corpus router needs to know WHICH languages
    the heuristic under-recalls (those documents leak into the wrong
    pipeline) before trusting per-language stats downstream.  F1 is
    computed in its tp-only form 2·tp/(pred+support) — identical to
    2PR/(P+R) but with one fewer division to keep rounding exact.

    Determinism: all counts are exact integers from one confusion
    group-by (checkpointed); every ratio is a single rounded double
    division with mirrored zero-support/zero-prediction nullif
    guards.

    Scale shape: one partial-aggregated shuffle of documents to the
    ≤|langs|² confusion panel; marginals and the accuracy fold are
    panel-sized broadcasts."""
    # same NULL-text exclusion as text_langid (the two panels must
    # stay mutually consistent — pinned by the cross-op test)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    conf = (
        docs.select(
            lang_id(tokens(F.col("text"))).alias("pred_lang"),
            F.col("lang").alias("actual_lang"),
        )
        .groupBy("pred_lang", "actual_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    sup = conf.groupBy(F.col("actual_lang").alias("lang")).agg(
        F.sum("n").alias("support")
    )
    pred = conf.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n").alias("pred_n")
    )
    tp = (
        conf.filter(F.col("pred_lang") == F.col("actual_lang"))
        .groupBy(F.col("actual_lang").alias("lang"))
        .agg(F.sum("n").alias("tp"))
    )
    acc = conf.agg(
        (
            F.sum(
                F.when(F.col("pred_lang") == F.col("actual_lang"), F.col("n"))
                .otherwise(0)
            ).cast("double")
            / F.sum("n")
        ).alias("accuracy")
    )
    per = (
        sup.join(F.broadcast(pred), "lang", "left")
        .join(F.broadcast(tp), "lang", "left")
        .select(
            "lang",
            "support",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("pred_n"), F.lit(0)).alias("pred_n"),
        )
    )
    return per.join(F.broadcast(acc)).select(
        "lang",
        F.col("support").cast("bigint").alias("support"),
        F.col("tp").cast("bigint").alias("tp"),
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("pred_n"), F.lit(0)),
            6,
        ).alias("precision_"),
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("support"), F.lit(0)),
            6,
        ).alias("recall_"),
        F.round(
            2.0
            * F.col("tp")
            / F.nullif(F.col("pred_n") + F.col("support"), F.lit(0)),
            6,
        ).alias("f1"),
        F.round("accuracy", 6).alias("overall_accuracy"),
    )
