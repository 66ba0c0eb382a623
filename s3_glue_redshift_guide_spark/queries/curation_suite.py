"""Corpus-curation queries (repetition metrics, duplicated-span flags,
context-window chunking) over the documents table, each with a DuckDB
oracle mirroring the token/n-gram arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (kept for suite parity)

from ..catalog import load_table
from ..llm.curation import (
    chunk_documents,
    duplicated_ngram_flags,
    repetition_metrics,
    scrub_shared_spans,
)
from .registry import query

_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"


def _sql_ngrams(n: int) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len(t) - {n - 1}, 0)), "
        f"i -> {parts})"
    )


@query(
    "cur_repetition_metrics",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, t, {_sql_ngrams(2)} AS grams FROM tk)
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           round((len(grams) - len(list_distinct(grams)))::DOUBLE
                 / greatest(len(grams), 1), 6) AS dup_ngram_frac,
           round(coalesce(list_max(list_transform(list_distinct(t),
                     d -> len(list_filter(t, x -> x = d)))), 0)::DOUBLE
                 / greatest(len(t), 1), 6) AS top_token_frac
    FROM g
    """,
)
def cur_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition signals per document: duplicate-bigram
    fraction and top-token share. Pure expression trees (no UDF, no
    shuffle) — the cheapest quality pass in the pipeline."""
    return repetition_metrics(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=2
    )


@query(
    "cur_duplicated_spans",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct({_sql_ngrams(5)})) AS gram
          FROM tk),
    shared AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    per_doc AS (
      SELECT g.doc_id, count(*) AS n_shared_ngrams
      FROM g JOIN shared USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_shared_ngrams, 0) AS BIGINT) AS n_shared_ngrams,
           CAST(coalesce(p.n_shared_ngrams, 0) > 0 AS INTEGER) AS has_shared_ngram
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
)
def cur_duplicated_spans(spark, sf_dir):
    """C4-style cross-corpus duplicated-span flagging: documents sharing a
    5-token window with any other document. Inverted-index shuffle shape
    (linear in span occurrences, never pairwise)."""
    return duplicated_ngram_flags(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=5
    )


@query(
    "cur_chunk_windows",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents
                WHERE len({_SQL_TOKS}) > 0),
    c AS (SELECT doc_id, t,
                 CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS INTEGER) + 1
                   AS nc
          FROM tk),
    e AS (SELECT doc_id, t,
                 unnest(generate_series(0, nc - 1)) AS chunk_id
          FROM c)
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(t[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(t[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
             AS chunk_text
    FROM e
    """,
)
def cur_chunk_windows(spark, sf_dir):
    """Overlapping 32-token windows every 24 tokens (context-window prep):
    one generated row per chunk via an index-sequence explode — row count
    scales with corpus token count / stride, fully distributed."""
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        size=32, stride=24,
    )


@query(
    "cur_span_scrub",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, t,
                 unnest({_sql_ngrams(5)}) AS gram,
                 unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i
          FROM tk),
    shared AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
      GROUP BY gram HAVING count(*) >= 2),
    hits AS (SELECT DISTINCT g.doc_id, g.i FROM g JOIN shared USING (gram)),
    cov AS (SELECT DISTINCT doc_id, unnest(generate_series(i, i + 4)) AS p
            FROM hits),
    covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id)
    SELECT tk.doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(coalesce(len(ps), 0) AS BIGINT) AS n_removed,
           coalesce(array_to_string(
             list_where(t, list_transform(generate_series(1, len(t)),
                                          p -> NOT coalesce(list_contains(ps, p), FALSE))),
             ' '), '') AS clean_text
    FROM tk LEFT JOIN covl ON tk.doc_id = covl.doc_id
    """,
)
def cur_span_scrub(spark, sf_dir):
    """C4-style duplicated-span REMOVAL (the rewrite pass downstream of
    the flag pass): every 5-token window shared across >= 2 documents has
    its token positions scrubbed and the document reassembled. The oracle
    reproduces the cleaned text string-exact, so window positioning,
    overlap union, and reassembly order are all value-hash-checked."""
    return scrub_shared_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=5
    )
