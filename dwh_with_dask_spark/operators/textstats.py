"""Text-analysis operators for training-data pipelines.

North-star additions (ABSENT-IN-REFERENCE, SURVEY.md §2B): token
counting, quality scoring, language-ID heuristic, document
fingerprinting. All built-in Column expressions — these run inside
whole-stage codegen over the scan, so a 100 TB corpus pays exactly one
pass with no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.dedup import normalize_text, word_ngrams

# Tiny high-frequency marker lists per language; enough for a coarse
# n-gram/stopword language-ID heuristic (public fastText/langid approach,
# shrunk to builtins). Deterministic tie-break: alphabetical language id.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht", "das", "ein", "zu"],
    "en": ["the", "a", "and", "is", "of", "to", "in", "that"],
    "es": ["el", "la", "que", "los", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: split on word/number/punct boundaries.

    A BPE-flavored upper bound on tokenizer counts (regex classes, not a
    learned vocab): runs of letters, runs of digits, and single
    punctuation marks each count once.
    """
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(
        F.coalesce(c, F.lit("")), F.lit(r"([A-Za-z]+|[0-9]+|[^\sA-Za-z0-9])"), 1
    )
    return F.size(pieces)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither word chars nor whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    n_punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, n_punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, n_sw.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit count per language (token intersection size)."""
    toks = F.array_distinct(tokens(col))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.array_intersect(toks, arr))
    return out


def lang_id(col: Column | str) -> Column:
    """Predicted language = argmax marker hits; 'und' when all zero.

    Ties break to the alphabetically-first language id (deterministic).
    """
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores, reverse=True):  # later WHEN wins ties -> alphabetical min
        s = scores[lang]
        cond = s >= F.greatest(best_score, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + sane mean token length + low punctuation noise. Weights are the
    usual public-pipeline (C4/Gopher-style) rule-of-thumb filters reduced
    to four binary signals averaged."""
    n_tok = token_count(col)
    len_ok = (n_tok >= 10) & (n_tok <= 100000)
    sw_ok = stopword_ratio(col) >= 0.01
    mtl = mean_token_len(col)
    mtl_ok = (mtl >= 2.0) & (mtl <= 12.0)
    punct_ok = punct_ratio(col) <= 0.3
    return (
        len_ok.cast("int") + sw_ok.cast("int") + mtl_ok.cast("int") + punct_ok.cast("int")
    ).cast("double") / F.lit(4.0)


def doc_fingerprint(col: Column | str, n: int = 5) -> Column:
    """Deterministic content fingerprint: min md5 over word n-grams.

    A 1-hash MinHash — robust to reordering of distant content and cheap
    to compare across corpora (equality ⇒ near-certain shared n-gram).
    Falls back to md5 of the whole normalized text for short docs.
    """
    grams = word_ngrams(col, n)
    min_gram_hash = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return F.coalesce(min_gram_hash, F.md5(normalize_text(col)))


def text_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per doc with the full stats bundle (single scan)."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_subword_tokens"),
        F.length(text_col).alias("n_chars"),
        mean_token_len(text_col).alias("mean_token_len"),
        punct_ratio(text_col).alias("punct_ratio"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
