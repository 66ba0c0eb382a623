"""Corpus-curation operators: within-document repetition metrics, cross-
corpus duplicated-n-gram flagging, and overlapping token-window chunking.

These are the standard text-curation passes a training-data pipeline runs
between dedup and packing:

* **Repetition metrics** (the Gopher-style heuristics): fraction of n-gram
  occurrences that are repeats, and the share of tokens taken by the single
  most frequent token. High values mark boilerplate/spam. Pure per-document
  expression trees — embarrassingly parallel, no shuffle.
* **Duplicated-span flagging** (the C4-style corpus pass): a fixed-width
  token window occurring in more than one document marks boilerplate shared
  across pages. Same inverted-index shape as the Jaccard dedup join: spans
  meet in their shuffle bucket, the join-back is linear in span occurrences
  (never pairwise), so the pass stays shuffle-bounded at corpus scale.
* **Chunking**: split each document into fixed-size overlapping token
  windows (the context-window prep step). One generated row per chunk via
  ``posexplode`` of an index sequence — no Python, no driver loop; output
  size is ~``n_tokens/stride`` rows per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import tokens


def _ngram_strings(toks: Column, n: int) -> Column:
    """Space-joined n-gram strings: one entry per window position."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document repetition heuristics (Gopher-style quality signals).

    Returns ``(id, n_tokens, dup_ngram_frac, top_token_frac)`` where
    ``dup_ngram_frac`` is the fraction of n-gram occurrences that repeat an
    earlier occurrence and ``top_token_frac`` is the most frequent token's
    share of all tokens. The top-token scan is O(distinct x tokens) per
    document — fine for natural documents (distinct grows sublinearly);
    pathological million-token single-doc inputs should be length-truncated
    upstream, as every curation pipeline does anyway.
    """
    toks = tokens(F.col(text_col))
    grams = _ngram_strings(toks, n)
    total_g = F.size(grams)
    distinct_g = F.size(F.array_distinct(grams))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda x: x == d)),
        )
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            (total_g - distinct_g).cast("double")
            / F.greatest(total_g, F.lit(1)),
            6,
        ).alias("dup_ngram_frac"),
        F.round(
            F.coalesce(top_count, F.lit(0)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("top_token_frac"),
    )


def duplicated_ngram_flags(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Flag documents sharing any n-token span with another document.

    Returns ``(id, n_shared_ngrams, has_shared_ngram)`` — the count of this
    document's DISTINCT n-grams that occur in >=2 documents, and a 0/1
    flag. Inverted-index shape: explode distinct spans, count document
    frequency per span (one shuffle on the span), then a linear join-back.
    No pairwise blowup: a span shared by f documents costs f join rows, not
    f^2 — this is a flagging pass, not a pair enumeration.
    """
    grams = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(
            F.array_distinct(_ngram_strings(tokens(F.col(text_col)), n))
        ).alias("__g"),
    )
    shared = (
        grams.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("__g")
    )
    per_doc = (
        grams.join(shared, "__g")
        .groupBy("__doc")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__doc"), "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared_ngrams", F.lit(0)).cast("bigint").alias(
                "n_shared_ngrams"
            ),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).cast("int").alias(
                "has_shared_ngram"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping ``size``-token windows every
    ``stride`` tokens (context-window prep). Empty documents produce no
    chunks; the final window may be shorter than ``size``. Output:
    ``(id, chunk_id, n_chunk_tokens, chunk_text)``.
    """
    toks = tokens(F.col(text_col))
    n_chunks = (
        F.ceil(
            F.greatest(F.size(toks) - size, F.lit(0)).cast("double") / stride
        ).cast("int")
        + 1
    )
    chunked = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    ).filter(F.size("__toks") > 0)
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, F.lit(size)
    )
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id").cast("integer").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def scrub_shared_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Remove cross-document duplicated spans and reassemble the text —
    the C4 boilerplate-REMOVAL pass (``duplicated_ngram_flags`` only
    flags; this rewrites).

    A token window of width ``n`` occurring in >= 2 documents marks all
    ``n`` of its token positions for removal; the cleaned document is the
    remaining tokens in original order. Returns
    ``(id, n_tokens, n_removed, clean_text)``.

    Same inverted-index scale shape as the flag pass: one shuffle on the
    span string (document frequency), one linear join-back of span *hits*
    (a span shared by f docs costs f rows), then per-document position
    set-algebra in expression space — no pairwise term, no UDF.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("__doc"), toks.alias("__t"))
    gpos = base.select(
        "__doc",
        F.posexplode(_ngram_strings(F.col("__t"), n)).alias("__i", "__g"),
    )
    shared = (
        gpos.select("__doc", "__g")
        .distinct()
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("__g")
    )
    covered = (
        gpos.join(shared, "__g")
        .select(
            "__doc",
            F.explode(
                F.sequence(F.col("__i"), F.col("__i") + (n - 1))
            ).alias("__p"),
        )
        .groupBy("__doc")
        .agg(F.collect_set("__p").alias("__ps"))
    )
    out = base.join(covered, "__doc", "left").withColumn(
        "__ps", F.coalesce("__ps", F.array().cast("array<int>"))
    )
    clean = F.filter(
        F.col("__t"), lambda t, i: ~F.array_contains(F.col("__ps"), i)
    )
    return out.select(
        F.col("__doc").alias(id_col),
        F.size("__t").cast("bigint").alias("n_tokens"),
        F.size("__ps").cast("bigint").alias("n_removed"),
        F.concat_ws(" ", clean).alias("clean_text"),
    )
