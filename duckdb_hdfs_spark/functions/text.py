"""Text-analysis column expressions (SURVEY.md §2.7) — all JVM-side
``pyspark.sql.functions`` compositions with 1:1 DuckDB-SQL mirrors.

Language ID is a stopword-hit heuristic over a fixed per-language
function-word list; quality scoring combines length / punctuation /
stopword-density signals.  Both are deterministic integer/ratio
arithmetic so Spark and DuckDB agree bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: minimal function-word lists; order fixes the argmax tiebreak.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "zu", "den", "mit", "von", "ein"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"),
    "es": ("el", "la", "los", "las", "y", "es", "de", "un", "una", "para"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "也"),
}

LANG_ORDER = ("en", "de", "fr", "es", "zh")


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens (with multiplicity) that are stopwords of
    ``lang`` (oracle: ``len(list_filter(toks, t -> t IN (...)))``)."""
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def stopword_hits_sql(toks_expr: str, lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> t IN ({inlist})))"


def lang_id(toks: Column) -> Column:
    """argmax over per-language stopword hits; ties resolve in
    LANG_ORDER; zero hits everywhere → 'und' (undetermined)."""
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate reversed so earlier languages win ties
    for lang in reversed(LANG_ORDER):
        score = stopword_hits(toks, lang)
        best = F.when(score >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(score, best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def lang_id_sql(toks_expr: str) -> str:
    hits = {lang: stopword_hits_sql(toks_expr, lang) for lang in LANG_ORDER}
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    cases = " ".join(
        f"WHEN {hits[lang]} = {greatest} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und' {cases} END"


def punct_count(text: Column) -> Column:
    """Count of .,;:!? characters (oracle:
    ``length(l) - length(regexp_replace(l, '[.,;:!?]', '', 'g'))``)."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def punct_count_sql(expr: str) -> str:
    return f"length({expr}) - length(regexp_replace({expr}, '[.,;:!?]', '', 'g'))"


#: quality_score rule thresholds, exported so the ablation panel
#: (queries/curation.corpus_quality_rule_ablation) explains the SAME
#: rules this function applies — a hardcoded copy there kept reporting
#: stale bands after a tuning change (round-7 review)
QUALITY_TOKENS_MIN = 20
QUALITY_TOKENS_MAX = 1000
QUALITY_MEAN_LEN_MIN = 2.0
QUALITY_MEAN_LEN_MAX = 12.0
QUALITY_STOP_RATIO_MIN = 0.05


def quality_score(text: Column, toks: Column) -> Column:
    """Composite quality in [0, ~1]: token-count band + mean token
    length band + stopword density — the standard cheap pre-filter
    for LLM training corpora.  Pure integer/double arithmetic in a
    fixed operation order (bit-stable across engines)."""
    n = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n
    )
    stop_ratio = stopword_hits(toks, "en").cast("double") / n
    len_ok = F.when(
        (n >= QUALITY_TOKENS_MIN) & (n <= QUALITY_TOKENS_MAX), F.lit(0.4)
    ).otherwise(F.lit(0.0))
    word_ok = F.when(
        (mean_len >= QUALITY_MEAN_LEN_MIN) & (mean_len <= QUALITY_MEAN_LEN_MAX),
        F.lit(0.3),
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(
        stop_ratio >= QUALITY_STOP_RATIO_MIN, F.lit(0.3)
    ).otherwise(F.lit(0.0))
    return len_ok + word_ok + stop_ok


def quality_score_sql(expr: str, toks_expr: str) -> str:
    n = f"len({toks_expr})"
    mean_len = (
        f"CAST(list_reduce(list_transform({toks_expr}, t -> length(t)), "
        f"(a, b) -> a + b) AS DOUBLE) / {n}"
    )
    stop_ratio = f"CAST({stopword_hits_sql(toks_expr, 'en')} AS DOUBLE) / {n}"
    return (
        f"(CASE WHEN {n} >= {QUALITY_TOKENS_MIN} AND {n} <= {QUALITY_TOKENS_MAX}"
        f" THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN {mean_len} >= {QUALITY_MEAN_LEN_MIN}"
        f" AND {mean_len} <= {QUALITY_MEAN_LEN_MAX} THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN {stop_ratio} >= {QUALITY_STOP_RATIO_MIN}"
        f" THEN 0.3 ELSE 0.0 END)"
    )
