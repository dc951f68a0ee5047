"""Text analysis operators — all pure Catalyst expressions (JVM-side,
whole-stage codegen), DuckDB-oracle-expressible by design: every regex
used is valid and equivalent in both Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalized, words

# tiny per-language stopword sets — enough for a deterministic n-gram
# heuristic; matches the languages in the driver's documents table
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "los", "que", "es", "y"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": ["de", "shi", "bu", "le", "wo", "zai"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    n = normalized(text)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, or
    single punctuation — a BPE-flavored regex segmentation."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def char_classes(text: Column) -> dict[str, Column]:
    total = F.length(text).cast("double")
    safe_total = F.when(total == 0, F.lit(1.0)).otherwise(total)
    return {
        "n_chars": F.length(text),
        "alpha_ratio": F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / safe_total,
        "digit_ratio": F.length(F.regexp_replace(text, r"[^0-9]", "")) / safe_total,
        "punct_ratio": F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / safe_total,
        "space_ratio": F.length(F.regexp_replace(text, r"[^ ]", "")) / safe_total,
    }


def stopword_count(text: Column, lang: str) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def quality_score(text: Column) -> Column:
    """Deterministic 0..1 quality heuristic: length band, alpha ratio,
    mean word length band, any-language stopword presence."""
    c = char_classes(text)
    tc = token_count(text).cast("double")
    safe_tc = F.when(tc == 0, F.lit(1.0)).otherwise(tc)
    mean_wlen = c["n_chars"].cast("double") / safe_tc
    any_stop = None
    for lang in STOPWORDS:
        s = stopword_count(text, lang)
        any_stop = s if any_stop is None else any_stop + s
    stop_ratio = any_stop.cast("double") / safe_tc
    length_ok = (
        F.when((c["n_chars"] >= 20) & (c["n_chars"] <= 100000), 1.0).otherwise(0.0)
    )
    wlen_ok = F.when((mean_wlen >= 2.5) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    return F.round(
        0.3 * length_ok
        + 0.3 * F.least(c["alpha_ratio"] * 1.25, F.lit(1.0))
        + 0.2 * wlen_ok
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0)),
        6,
    )


def lang_id(text: Column) -> Column:
    """Stopword-vote language guess over the 5 known languages; ties
    break in fixed key order; no hit at all -> 'und'."""
    counts = [(lang, stopword_count(text, lang)) for lang in sorted(STOPWORDS)]
    best = None
    best_lang = F.lit("und")
    for lang, c in counts:
        if best is None:
            best, best_lang = c, F.when(c > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(c > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(c, best)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint (md5 of collapsed lowercase) —
    the exact-dup document key."""
    return F.md5(normalized(text))


def winnowing_fingerprints(
    text: Column, k: int = 5, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer et al.): k-gram hashes
    (xxhash64 over word k-grams), minimum per sliding window, distinct.
    All JVM-side higher-order functions — the rolling-hash fingerprint
    without a Python worker."""
    w = words(text)
    n = F.size(w)
    grams = F.when(n < k, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i + 1, k))),
        )
    )
    m = F.size(grams)
    wins = F.when(m < window, F.array_distinct(grams)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), m - window),
                lambda i: F.array_min(F.slice(grams, i + 1, window)),
            )
        )
    )
    return wins
