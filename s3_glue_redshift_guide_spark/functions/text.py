"""Text-analysis primitives (SURVEY.md §2.9 L4): tokenization, n-gram
shingles, language-ID heuristic, quality features, document fingerprints.

Everything is built-in expression trees (split/transform/aggregate) — no
Python UDFs — so text featurization of a 100 TB corpus runs entirely inside
whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (deterministic, oracle-expressible; a production system would
#: plug in fastText/CLD — same column contract).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "une"],
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased); empty strings dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column) -> Column:
    """Sub-word-ish tokenization: split on whitespace AND punctuation
    boundaries (the regex stand-in for a BPE pre-tokenizer)."""
    return F.filter(
        F.split(F.lower(text), r"[\s\p{Punct}]+"), lambda t: t != ""
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array, via an index-sequence
    transform (no explode — stays one row per document). Documents shorter
    than ``n`` tokens yield an empty array (guarded: Spark's ``sequence``
    would otherwise count DOWN for start > stop)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio(toks: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_ratio(toks, lang) for lang in LANG_STOPWORDS}


def predict_lang(toks: Column) -> Column:
    """Argmax language by stopword ratio, 'und' when nothing matches;
    deterministic tie-break by language-code order."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        out = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(out)
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality signals used by training-data filters."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    total_token_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    avg_token_len = F.when(
        n_tokens > 0, total_token_chars.cast("double") / n_tokens.cast("double")
    )
    n_digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
        "avg_token_len": F.round(avg_token_len, 4),
        "digit_ratio": F.round(n_digits.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio_en": F.round(stopword_ratio(toks, "en"), 6),
    }


def fingerprint(text: Column, prefix_len: int = 64) -> Column:
    """Polynomial rolling hash of the first ``prefix_len`` codepoints —
    a cheap content fingerprint (mod arithmetic keeps every intermediate
    below 2^63, so no ANSI overflow at any input)."""
    prefix = F.substring(text, 1, prefix_len)
    codes = F.when(
        F.length(prefix) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(prefix)),
            lambda i: F.ascii(prefix.substr(i, F.lit(1))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda h, c: (h * FINGERPRINT_BASE + c.cast("bigint")) % FINGERPRINT_MOD,
    )
