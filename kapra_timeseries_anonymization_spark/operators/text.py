"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, BPE-ish token counting, winnowing fingerprints.

All pure JVM-side expressions (no Python UDFs anywhere): array lambdas
(`F.filter`/`F.transform`), `regexp_count`, and the same 60-bit md5 hash
used by the dedup suite — every operator is reproducible in DuckDB SQL for
the driver's correctness gate. At 100 TB each of these is a single
narrow map over the scan (no shuffle at all until the caller aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import hash60, tokenize

#: tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "auf", "fur", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def stopword_ratio(text_col, lang: str) -> Column:
    """Fraction of word occurrences that are stopwords of ``lang``."""
    words = tokenize(text_col)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stops, w)))
    return n_stop / F.greatest(F.size(words), F.lit(1))


def language_id(text_col, min_ratio: float = 0.05) -> Column:
    """Predicted language = argmax stopword ratio over the known lists,
    'und' when no list clears ``min_ratio``. Ties break by list order
    (en, de, fr) via strict > comparisons."""
    ratios = {lang: stopword_ratio(text_col, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_ratio = F.lit(float(min_ratio))
    # iterate in fixed order; strict > keeps the EARLIEST max (stable)
    for lang in STOPWORDS:
        is_better = ratios[lang] > best_ratio
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(is_better, ratios[lang]).otherwise(best_ratio)
    return best_lang


def token_count_bpe(text_col) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.regexp_count(text_col, F.lit(BPE_TOKEN_RE))


def quality_features(text_col) -> dict[str, Column]:
    """Deterministic quality signals. ``score`` is the mean of four
    indicator checks (word length band, stopword presence, low symbol
    ratio, length band) — integer-count based so engines can't diverge."""
    words = tokenize(text_col)
    n_words = F.size(words)
    n_chars = F.length(text_col)
    n_sym = F.regexp_count(text_col, F.lit("[^A-Za-z0-9\\s]"))
    avg_wlen = (
        F.length(F.regexp_replace(text_col, "\\s+", ""))
        / F.greatest(n_words, F.lit(1))
    ).cast("double")
    stop_en = stopword_ratio(text_col, "en")
    sym_ratio = (n_sym / F.greatest(n_chars, F.lit(1))).cast("double")
    score = (
        F.when((avg_wlen >= 2.5) & (avg_wlen <= 10.0), 1).otherwise(0)
        + F.when(stop_en >= 0.02, 1).otherwise(0)
        + F.when(sym_ratio <= 0.1, 1).otherwise(0)
        + F.when((n_words >= 10) & (n_words <= 100000), 1).otherwise(0)
    ) / F.lit(4.0)
    return {
        "n_words": n_words.cast("long"),
        "n_tokens_bpe": token_count_bpe(text_col).cast("long"),
        "avg_word_len": F.round(avg_wlen, 6),
        "stopword_ratio_en": F.round(stop_en, 6),
        "symbol_ratio": F.round(sym_ratio, 6),
        "quality_score": F.round(score, 4),
    }


def winnow_fingerprint(text_col, k: int = 3, m: int = 4) -> Column:
    """Winnowing-style fingerprint: the ``m`` smallest distinct hashes of
    the word-k-gram shingles, ascending — a compact, order-insensitive
    content signature for containment/overlap checks."""
    from .dedup import word_shingles

    hashes = F.array_distinct(
        F.transform(word_shingles(text_col, k), lambda s: hash60(s))
    )
    return F.slice(F.array_sort(hashes), 1, m)
