"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference extensions (SURVEY §7 Phase 5; the reference's type system
has text/long-text columns, utils.py:22, but no text analytics). Everything
here is built from ``pyspark.sql.functions`` only — JVM-side, whole-stage
codegen, no Python in the hot path — so the same pipeline that runs on the
driver's 500-row documents table runs unchanged on 100 TB of shards.

Each operator has an exact ANSI-SQL twin in ``workload_ext`` for the DuckDB
oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: minimal per-language stopword marker sets for the lang-id heuristic.
#: Scoring = |distinct doc words ∩ marker set| per language (set semantics,
#: so both engines agree); ties resolve in LANGS declaration order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人"],
}
LANGS = list(LANG_MARKERS)

#: ASCII-alnum complement — kept ASCII (not \p{L}\p{N}) so the DuckDB
#: oracle's regex engine agrees byte-for-byte; swap for the unicode class
#: in production corpora.
PUNCT_RE = r"[^a-zA-Z0-9\s]"
#: BPE-ish token splitter: words, numbers, or single non-space symbols
TOKEN_RE = r"\s+"


def words(col: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column, toks: Column | None = None) -> Column:
    """Whitespace token count (empty text → 0). Pass a pre-staged
    ``toks`` (= ``words(col)`` materialized in an earlier projection) to
    share one tokenization across many metrics — the regex split is the
    expensive part, and Catalyst will not inline a staged non-cheap
    alias back into its consumers."""
    toks = words(col) if toks is None else toks
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )


#: BPE-ish pre-tokenizer classes: letter runs, digit runs, or single
#: non-alnum symbols — the split a byte-pair tokenizer applies before
#: merges, so counts track real LLM token counts far better than
#: whitespace (contractions, punctuation, numbers each count).
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_tokens(col: Column) -> Column:
    """array<string> of BPE-style pre-tokens of the lowercased text."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex (empty text → 0) — the
    training-data budgeting metric; whitespace counting undercounts
    punctuation-heavy and code-like text badly."""
    return F.size(bpe_tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    stripped = F.regexp_replace(col, PUNCT_RE, "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - F.length(stripped)) / F.length(col)
    )


def stopword_ratio(col: Column, stopwords: list[str] | None = None,
                   toks: Column | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords.
    ``toks`` = optional pre-staged ``words(col)`` (see token_count)."""
    sw = stopwords or LANG_MARKERS["en"]
    ws = words(col) if toks is None else toks
    hits = F.size(F.filter(ws, lambda w: w.isin(sw)))
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(hits / F.size(ws))


def round_half_up(col: Column, k: int) -> Column:
    """floor(x·10^k + 0.5)/10^k — bit-deterministic rounding.

    Engine ROUND()s disagree at representation boundaries (Spark rounds
    the binary value, DuckDB the shortest decimal repr); this form gives
    identical results in any IEEE-754 engine, which the oracle needs."""
    m = 10**k
    return F.floor(col * m + F.lit(0.5)) / m


def quality_score(col: Column, pr: Column | None = None,
                  sw: Column | None = None) -> Column:
    """Composite quality heuristic in [0,1]: long enough, not punctuation
    soup, some-but-not-all stopwords. Weights are arbitrary but fixed;
    rounded to 4 decimals for oracle stability. ``pr``/``sw`` = optional
    pre-staged UNROUNDED punct_ratio / stopword_ratio columns."""
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_term = 1.0 - (punct_ratio(col) if pr is None else pr)
    sw = stopword_ratio(col) if sw is None else sw
    sw_term = 1.0 - F.abs(sw - F.lit(0.3)) / F.lit(0.7)
    return round_half_up(
        0.4 * length_term + 0.3 * punct_term + 0.3 * sw_term, 4
    )


def lang_scores(ws: Column) -> dict[str, Column]:
    """Per-language marker-intersection sizes over distinct doc words —
    stage these as columns before ``lang_id(scores=...)`` when the
    projection is wide: the argmax CASE references every score ~3×, and
    staging collapses 15 array_intersect trees to 5."""
    return {
        lang: F.size(F.array_intersect(ws, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in LANG_MARKERS.items()
    }


def lang_id(col: Column, ws: Column | None = None,
            scores: dict[str, Column] | None = None) -> Column:
    """n-gram/stopword language-ID heuristic: argmax over marker-set
    intersection sizes; 'und' (undetermined) when no marker hits.
    ``ws`` = optional pre-staged ``array_distinct(words(col))``;
    ``scores`` = optional pre-staged ``lang_scores(ws)`` columns."""
    if scores is None:
        ws = F.array_distinct(words(col)) if ws is None else ws
        scores = lang_scores(ws)
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    # first language in declaration order wins ties → build CASE backwards
    for lang in reversed(LANGS):
        result = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(result)
    return result


def fingerprint(col: Column, toks: Column | None = None) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the exact-dedup key; a content-defined rolling hash reduces to this
    under whitespace normalization). ``toks`` = optional pre-staged
    ``words(col)``."""
    return F.md5(F.concat_ws(" ", words(col) if toks is None else toks))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text metrics as one projection (single scan, codegen'd)."""
    c = F.col(text_col)
    return df.select(
        "*",
        char_count(c).alias("n_chars_computed"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_tokens_bpe"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )
