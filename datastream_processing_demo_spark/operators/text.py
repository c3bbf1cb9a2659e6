"""Text analysis operators: tokenization, language-ID heuristic, quality
scoring, document fingerprinting (SURVEY.md §2.2 LLM-ext text row).

All pure Column expressions (whole-stage codegen, no Python in the data
path) — at 100 TB these run inside the parquet scan projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token classes: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# marker stopwords per candidate language for the n-gram/stopword
# language-ID heuristic (ordered: ties resolve to the earlier entry)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "los", "de"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "des"),
    "zh": ("的", "是", "了", "在"),
}

_FP_MOD = 1_000_000_007


def words_col(text: Column | str = "text") -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def token_counts(text: Column | str = "text") -> dict[str, Column]:
    """Whitespace token count + BPE-ish regex token count + char count."""
    return {
        "n_ws_tokens": F.size(words_col(text)).cast("long"),
        "n_bpe_tokens": F.size(F.regexp_extract_all(
            F.col(text) if isinstance(text, str) else text,
            F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long"),
        "n_chars_measured": F.length(text).cast("long"),
    }


def marker_count(words: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*markers))).cast("long")


# Stopword-evidence set for the Gopher rule battery (text_gopher_rules
# and the example pipeline's gate); the oracle SQL derives its IN-list
# from this same tuple so the two can't drift.
GOPHER_STOPWORDS = ("the", "and", "of", "a", "in", "to")


def exploded_ngrams(df, n: int, id_col: str = "doc_id",
                    text_col: str = "text"):
    """(id, gram) rows of each doc's DISTINCT word n-grams. The dedup is
    array_distinct BEFORE the explode — within-row, zero shuffle (a
    post-explode .distinct() would shuffle the entire gram stream; the
    measured 2x win recorded in BASELINE.md round 3). Shared by the
    decontamination family and the duplicated-span query so the
    load-bearing placement can't silently diverge between call sites."""
    w = df.select(id_col, F.split(text_col, " ").alias("ws"))
    return w.select(
        id_col, F.explode(F.array_distinct(word_ngrams("ws", n))).alias("gram"))


def word_ngrams(words_col_name: str, n: int) -> Column:
    """Space-joined word n-grams of a pre-split array column, as an
    array column (empty when the doc has fewer than n words). Pure
    per-row expression — no explode, no shuffle; callers explode only
    when they need corpus-level gram statistics. The column must be a
    materialized projection (not an inline split) so the tokenization
    isn't re-evaluated per gram (see text_repetition_filter's note)."""
    return F.expr(
        f"CASE WHEN size({words_col_name}) >= {n} THEN "
        f"transform(sequence(0, size({words_col_name}) - {n}), "
        f"i -> array_join(slice({words_col_name}, i + 1, {n}), ' ')) "
        f"ELSE array() END")


def lang_id_col(text: Column | str = "text") -> Column:
    """Stopword-marker language ID: argmax of per-language marker counts
    (fixed priority order breaks ties; 'und' when no marker hits)."""
    words = words_col(text)
    counts = {lang: marker_count(words, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    # single chained CASE evaluated in declaration order => earlier
    # languages win ties deterministically
    chained = None
    for lang in LANG_MARKERS:
        cond = (counts[lang] > 0) & (counts[lang] == best)
        chained = F.when(cond, lang) if chained is None else chained.when(cond, lang)
    return chained.otherwise("und")


def quality_cols(text: Column | str = "text") -> dict[str, Column]:
    """Heuristic quality features + composite score (deterministic
    arithmetic — identical IEEE ops in the oracle)."""
    words = words_col(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(words).cast("double")
    n_punct = F.size(F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text,
        F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))).cast("double")
    stop_n = marker_count(words, LANG_MARKERS["en"]).cast("double")
    avg_word_len = (n_chars - (n_tokens - 1)) / n_tokens
    punct_ratio = n_punct / n_chars
    stop_ratio = stop_n / n_tokens
    score = (F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
             + (1.0 - punct_ratio) * 0.3
             + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3)
    return {
        "avg_word_len": avg_word_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    }


def fingerprint_col(text: Column | str = "text") -> Column:
    """Order-sensitive rolling document fingerprint: left fold over
    tokens of (acc*131 + ascii(first char)*31 + len) mod 1e9+7.
    Modular at every step so ANSI-mode long arithmetic cannot overflow."""
    words = words_col(text)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 131
                        + F.ascii(F.substring(w, 1, 1)).cast("long") * 31
                        + F.length(w).cast("long")) % _FP_MOD,
    )


def normalized_md5_col(text: Column | str = "text") -> Column:
    """Content hash of normalized text (lowercase, collapsed spaces)."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    return F.md5(norm.cast("binary"))
