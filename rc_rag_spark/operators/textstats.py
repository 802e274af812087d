"""Text-analysis operators for training-data pipelines (north-star
extension, SURVEY §2.2 'Text analysis'): language ID, quality scoring,
token counting, fingerprinting. All native Catalyst expressions —
these run in the 100 TB hot path, so no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rc_rag_spark.functions.text import simple_tokenize

# Tiny high-frequency marker sets per language (n-gram-heuristic
# language ID; deterministic, vocabulary-based).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "ich"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}

STOPWORDS = LANG_MARKERS["en"]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: str | Column) -> Column:
    return F.size(simple_tokenize(col)).cast("int")


def word_count(col: str | Column) -> Column:
    """Whitespace word count."""
    s = F.trim(_c(col))
    return F.when(s == "", F.lit(0)).otherwise(
        F.size(F.split(s, r"\s+"))
    ).cast("int")


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish subword proxy: alnum runs + punctuation marks, where an
    alnum run of length L counts as ceil(L/4) pieces (≈ GPT-style
    4-chars-per-token heuristic). Native, deterministic."""
    runs = F.regexp_extract_all(F.lower(_c(col)), F.lit(r"[a-z0-9]+"), 0)
    alnum_pieces = F.aggregate(
        runs, F.lit(0), lambda acc, r: acc + F.ceil(F.length(r) / 4).cast("int")
    )
    punct = F.size(F.regexp_extract_all(_c(col), F.lit(r"[^\sa-zA-Z0-9]"), 0))
    return (alnum_pieces + punct).cast("int")


def _marker_hits(tokens: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def language_scores_from_tokens(toks: Column) -> Column:
    """Struct of per-language marker-hit ratios over a STAGED token
    array column. The struct references `toks` ~6× (one filter per
    language) and filter lambdas are interpreted with no
    common-subexpression elimination — if `toks` is an inline tokenize
    expression it re-runs per language per row. Stage it as a real
    column first (see q95/q70)."""
    n = F.greatest(F.size(toks), F.lit(1))
    return F.struct(
        *[
            (_marker_hits(toks, m).cast("double") / n).alias(lang)
            for lang, m in LANG_MARKERS.items()
        ]
    )


def language_scores(col: str | Column) -> Column:
    """Struct of per-language marker-hit ratios (tokenizes inline —
    prefer staging tokens + language_scores_from_tokens on hot paths)."""
    return language_scores_from_tokens(simple_tokenize(col))


def language_id_from_scores(scores: Column) -> Column:
    """Argmax language over a precomputed `language_scores` struct;
    'und' when all zero. Deterministic tie-break: language-code order.

    Take the struct as a NAMED column (not an inline expression) in
    multi-use contexts: the argmax references the struct ~10×, and each
    reference textually duplicates an inline subtree — a ~10× blowup in
    analysis/codegen work that Catalyst only avoids when the struct is
    an alias used more than once (CollapseProject then keeps the
    projections staged)."""
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores.getField(lg) for lg in langs])
    out = F.lit("und")
    for lg in reversed(langs):
        out = F.when(
            (scores.getField(lg) == best) & (best > 0), F.lit(lg)
        ).otherwise(out)
    return out


def language_id(col: str | Column) -> Column:
    """Argmax language over marker ratios; 'und' when all zero."""
    return language_id_from_scores(language_scores(col))


def quality_features(col: str | Column) -> Column:
    """Struct of quality signals (tokenizes inline — prefer staging
    tokens + quality_features_from_tokens on hot paths)."""
    s = _c(col)
    return quality_features_from_tokens(s, simple_tokenize(s))


def quality_features_from_tokens(col: str | Column, toks: Column) -> Column:
    """Struct of quality signals: n_chars, n_tokens, mean token len,
    punct ratio, stopword ratio, digit ratio, uppercase ratio —
    `toks` should be a STAGED token array column (referenced 4× below,
    through interpreted HOF lambdas)."""
    s = _c(col)
    n_chars = F.length(s)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    n_tok = F.size(toks)
    safe_tok = F.greatest(n_tok, F.lit(1)).cast("double")
    alnum = F.filter(toks, lambda t: t.rlike("^[\\p{L}\\p{N}]"))
    mean_len = (
        F.aggregate(alnum, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
        / F.greatest(F.size(alnum), F.lit(1))
    )
    # Count single-char class matches as length(s) - length(s with the
    # class deleted): same value as counting regexp matches, but no
    # per-character array materialization (these run per-row in the
    # 100 TB hot path; the array variant allocates one single-char
    # string per matching character).
    count_re = lambda pat: (  # noqa: E731
        n_chars - F.length(F.regexp_replace(s, pat, ""))
    )
    return F.struct(
        n_chars.cast("int").alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(count_re(r"[\p{Punct}]").cast("double") / safe_chars, 6).alias("punct_ratio"),
        F.round(
            _marker_hits(toks, STOPWORDS).cast("double") / safe_tok, 6
        ).alias("stopword_ratio"),
        F.round(count_re(r"[0-9]").cast("double") / safe_chars, 6).alias("digit_ratio"),
        F.round(count_re(r"[A-Z]").cast("double") / safe_chars, 6).alias("upper_ratio"),
    )


def quality_score_from_features(q: Column) -> Column:
    """Composite [0,1] quality score from a precomputed
    `quality_features` struct (same staging rationale as
    `language_id_from_scores`: the score references the struct 4×)."""
    length_score = F.least(q.getField("n_tokens").cast("double") / 100.0, F.lit(1.0))
    noise = q.getField("punct_ratio") + q.getField("digit_ratio")
    noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - 4.0 * noise)
    len_ok = (
        (q.getField("mean_token_len") >= 2.5)
        & (q.getField("mean_token_len") <= 9.0)
    ).cast("double")
    return F.round(
        0.4 * length_score + 0.4 * noise_score + 0.2 * len_ok, 6
    )


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs with low
    punct/digit noise and a sane mean token length."""
    return quality_score_from_features(quality_features(col))


def _rolling_grams(col: str | Column, window: int) -> Column:
    """Character windows of the normalized text (shared by both
    fingerprint variants; whole text as single gram when shorter than
    one window)."""
    from rc_rag_spark.functions.text import normalize_answer

    s = normalize_answer(col)
    n = F.length(s) - (window - 1)
    return F.when(n <= 0, F.array(s)).otherwise(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.substring(s, i, window)
        )
    )


def rolling_md5_fingerprint(col: str | Column, window: int = 16) -> Column:
    """Portable winnowing fingerprint: lexicographic min of md5 hex
    over character windows (engine-agnostic — md5 strings compare
    identically everywhere)."""
    return F.array_min(
        F.transform(_rolling_grams(col, window), lambda g: F.md5(g))
    )


def rolling_hash_fingerprint(col: str | Column, window: int = 16) -> Column:
    """Winnowing-style document fingerprint: min xxhash64 over
    character windows (native i64 — the cheap scale path)."""
    return F.array_min(
        F.transform(_rolling_grams(col, window), lambda g: F.xxhash64(g))
    )
