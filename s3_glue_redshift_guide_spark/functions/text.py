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


# ---------------------------------------------------------------- Arrow --
# Vectorized (mapInPandas) twin of the expression-tree featurizer.
#
# The expression path above keeps everything JVM-side, but Spark evaluates
# higher-order lambdas (transform/aggregate) INTERPRETED, outside
# whole-stage codegen — measured at sf0.1/local[32], the Arrow batch path
# below is ~2.2x faster for the tokenize+fingerprint workload (0.37 s vs
# 0.83 s steady-state). Both are kept: expressions compose into other
# queries' plans (lang-ID, quality) where a fused single pass wins; the
# Arrow path is the hot-loop featurizer. Tested element-identical.

_WS = "[ \\t\\n\\x0b\\f\\r]+"  # Java regex \s (ASCII-only), pinned so the
# Python twin can't drift to Unicode whitespace semantics


def text_stats_batches(batches):
    """mapInPandas generator: doc_id/text -> token + fingerprint stats.

    Emits SUM of token lengths (not the rounded mean): the caller derives
    the mean with JVM-side F.round (HALF_UP) so rounding semantics stay
    identical to the expression path and the SQL oracle — Python's round()
    is banker's and would diverge on exact ties.
    """
    import re

    import pandas as pd

    ws = re.compile(_WS)
    for pdf in batches:
        n_toks, n_dis, sum_len, fps = [], [], [], []
        for t in pdf["text"]:
            t = t or ""
            toks = [x for x in ws.split(t.lower()) if x]
            n_toks.append(len(toks))
            n_dis.append(len(set(toks)))
            sum_len.append(sum(map(len, toks)))
            h = 0
            for c in t[:64]:
                h = (h * FINGERPRINT_BASE + ord(c)) % FINGERPRINT_MOD
            fps.append(h)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pd.array(n_toks, dtype="int64"),
                "n_distinct_tokens": pd.array(n_dis, dtype="int64"),
                "sum_token_len": pd.array(sum_len, dtype="int64"),
                "fingerprint": pd.array(fps, dtype="int64"),
            }
        )


def text_stats_arrow(df, id_col: str = "doc_id", text_col: str = "text"):
    """Arrow-vectorized token/fingerprint featurization of a corpus frame.
    One linear pass, embarrassingly parallel; batch size is Arrow's
    (spark.sql.execution.arrow.maxRecordsPerBatch).

    ``_spread`` first (r12, guide §2.5 input-skew): a local single-file
    corpus scans as ONE split (the 4 MB open-cost floor packs the whole
    file into one task), so the featurization ran serial however many
    cores the session had — the r11 scaling block read llm_text_stats
    flat between 8 and 32 cores for exactly this reason. Size-capped
    width (dedup._spread_width), per-doc outputs independent of batch
    boundaries, values unchanged; at cluster scale the corpus already
    has thousands of splits and the rebalance is no-op-ish."""
    from ..llm.dedup import _spread

    src = _spread(
        df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    out = src.mapInPandas(
        text_stats_batches,
        "doc_id bigint, n_tokens bigint, n_distinct_tokens bigint, "
        "sum_token_len bigint, fingerprint bigint",
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        F.round(
            F.col("sum_token_len").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        "fingerprint",
    )
