"""L1-L6 — LLM-data-pipeline queries (SURVEY.md §2.9), oracle-checked where
SQL-expressible (exact dedup, inverted-index Jaccard, brute-force cosine,
text stats/quality/lang-id/fingerprint), rows-only + pytest self-checks for
the LSH internals (minhash/simhash/ANN — verified against their exact
counterparts in tests/test_llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import load_table
from ..functions.text import (
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    LANG_STOPWORDS,
    fingerprint,
    predict_lang,
    quality_features,
    tokens,
)
from ..llm.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from ..llm.components import connected_components
from ..llm.multimodal import attach_fake_media, decode_image_features
from ..llm.similarity import ivf_topk, lsh_topk, topk_bruteforce
from .registry import query

# DuckDB fragments mirroring functions/text.py exactly.
_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
_SQL_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------- L1 --
@query(
    "llm_exact_dedup",
    oracle="""
    SELECT sha256(text) AS content_hash,
           min(doc_id)  AS keep_id,
           count(*)     AS n_copies
    FROM documents GROUP BY 1
    """,
)
def llm_exact_dedup(spark, sf_dir):
    """Exact dedup (L1): canonical id + copy count per distinct content;
    only the 32-byte hash shuffles, not the documents."""
    return exact_dedup_groups(_docs(spark, sf_dir), "text", "doc_id")


# --------------------------------------------------------------------- L2 --
@query(
    "llm_jaccard_pairs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(count(*)::DOUBLE /
                   (any_value(a.n_sh) + any_value(b.n_sh) - count(*)), 6) AS jaccard
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    WHERE jaccard >= 0.2
    """,
)
def llm_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (L2) via the inverted-index
    self-join — docs meet only in shared-shingle buckets, never n^2."""
    return jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text", n=3, threshold=0.2)


@query("llm_minhash_pairs", oracle=None)
def llm_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup (L2 scale path): banded signature bucket join,
    exact-Jaccard verify. Subset-of-exact proven in tests/test_llm.py."""
    return minhash_near_dup_pairs(
        _docs(spark, sf_dir), "doc_id", "text", n=3,
        n_hashes=32, bands=16, threshold=0.2,
    )


@query("llm_simhash_pairs", oracle=None)
def llm_simhash_pairs(spark, sf_dir):
    """SimHash near-dup (L2): 64-bit signatures, 4x16-bit block bucket join,
    Hamming <= 3 (exhaustive by pigeonhole for <= 3 differing bits)."""
    return simhash_near_dup_pairs(_docs(spark, sf_dir), "doc_id", "text",
                                  max_hamming=3, blocks=4)


@query(
    "llm_embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(
             list_aggregate(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(generate_series(1, 64),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))),
           6) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
      AND cos_sim >= 0.3
    """,
)
def llm_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (L2/L3 hybrid) — exact pairwise on a
    bounded slice; the LSH path (llm_lsh_topk) is the full-corpus shape."""
    from ..functions.vectors import cosine

    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )


# --------------------------------------------------------------------- L3 --
@query(
    "llm_topk_similarity",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(
               list_aggregate(list_transform(generate_series(1, 64),
                   i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
                   i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(generate_series(1, 64),
                   i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum'))),
             6) AS cos_sim
      FROM q, embeddings c WHERE c.vec_id != q.query_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def llm_topk_similarity(spark, sf_dir):
    """Brute-force cosine top-5 (L3 baseline): broadcast query set x corpus,
    per-query window top-k; corpus never shuffles."""
    e = _emb(spark, sf_dir)
    return topk_bruteforce(
        e.filter(F.col("vec_id") < 10), e, k=5
    ).withColumn("rank", F.col("rank").cast("int"))


@query("llm_lsh_topk", oracle=None)
def llm_lsh_topk(spark, sf_dir):
    """ANN top-5 via random-hyperplane LSH (L3 scale path): bucket join on
    signature bands + exact re-rank. Recall vs brute force asserted in
    tests/test_llm.py."""
    e = _emb(spark, sf_dir)
    return lsh_topk(e.filter(F.col("vec_id") < 10), e, dim=64, k=5,
                    n_planes=16, bands=8)


# --------------------------------------------------------------------- L4 --
@query(
    "llm_text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks, text FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                 AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT)  AS n_distinct_tokens,
           round(list_aggregate(list_transform(toks, x -> len(x)), 'sum')::DOUBLE
                 / greatest(len(toks), 1), 4)        AS avg_token_len,
           CAST(list_reduce(
                 list_prepend(0::BIGINT, list_transform(
                     generate_series(1, greatest(len(substring(text, 1, 64)), 0)),
                     i -> ascii(substring(substring(text, 1, 64), i, 1)))),
                 (h, c) -> (h * {FINGERPRINT_BASE} + c) % {FINGERPRINT_MOD})
               AS BIGINT)                            AS fingerprint
    FROM t
    """,
)
def llm_text_stats(spark, sf_dir):
    """Token counting + document fingerprinting (L4): whitespace tokens,
    distinct counts, mean token length, 64-char polynomial rolling hash —
    all codegen'd expressions, no UDF."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        fingerprint(F.col("text"), 64).alias("fingerprint"),
    )


@query(
    "llm_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, text, {_SQL_TOKS} AS toks FROM documents)
    SELECT doc_id,
           round((len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                 / greatest(len(text), 1), 6) AS digit_ratio,
           round(len(list_filter(toks, x -> list_contains(
                 {LANG_STOPWORDS['en']}, x)))::DOUBLE
                 / greatest(len(toks), 1), 6) AS stopword_ratio_en,
           CAST(len(text) >= 50 AND len(toks) >= 10
                AND len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1) > 0.3
                AS INTEGER) AS passes_quality
    FROM t
    """,
)
def llm_quality_scores(spark, sf_dir):
    """Quality scoring + filter flag (L4/L6): digit ratio, stopword ratio,
    lexical diversity gate — the heuristic pre-filters of a training-data
    pipeline."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    feats = quality_features(F.col("text"))
    diversity = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    return d.select(
        "doc_id",
        feats["digit_ratio"].alias("digit_ratio"),
        feats["stopword_ratio_en"].alias("stopword_ratio_en"),
        (
            (F.length("text") >= 50) & (F.size(toks) >= 10) & (diversity > 0.3)
        ).cast("int").alias("passes_quality"),
    )


@query(
    "llm_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({LANG_STOPWORDS['en']}, x)))::DOUBLE
               / greatest(len(toks), 1) AS s_en,
             len(list_filter(toks, x -> list_contains({LANG_STOPWORDS['es']}, x)))::DOUBLE
               / greatest(len(toks), 1) AS s_es,
             len(list_filter(toks, x -> list_contains({LANG_STOPWORDS['fr']}, x)))::DOUBLE
               / greatest(len(toks), 1) AS s_fr
      FROM t)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN greatest(s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
)
def llm_lang_id(spark, sf_dir):
    """Language-ID heuristic (L4): stopword-ratio argmax with deterministic
    tie-break (en > es > fr), 'und' when no list matches."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predict_lang(tokens(F.col("text"))).alias("predicted_lang"),
    )


# --------------------------------------------------------------------- L6 --
@query(
    "llm_quality_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang IN ('en', 'es') AND n_chars BETWEEN 200 AND 2000
      AND source NOT IN ('src0', 'src13')
    """,
)
def llm_quality_filter(spark, sf_dir):
    """Corpus filter (L6) on language/length/source metadata — pushed to the
    parquet scan."""
    d = _docs(spark, sf_dir)
    return d.filter(
        F.col("lang").isin("en", "es")
        & F.col("n_chars").between(200, 2000)
        & ~F.col("source").isin("src0", "src13")
    ).select("doc_id", "lang", "source", "n_chars")


# --------------------------------------------------------------------- L5 --
@query("llm_multimodal_features", oracle=None)
def llm_multimodal_features(spark, sf_dir):
    """Multimodal decode plumbing (L5): binary media struct -> mapInPandas
    feature extraction (decoder stubbed deterministically; Spark contract
    real). Determinism asserted in tests/test_llm.py."""
    return decode_image_features(attach_fake_media(_docs(spark, sf_dir)))


@query("llm_dedup_components", oracle=None)
def llm_dedup_components(spark, sf_dir):
    """Near-dup groups (L2 final step): connected components over the exact
    Jaccard pair graph via iterative min-label propagation — O(log n)
    join rounds, no driver-side graph. Verified against a Python union-find
    in tests/test_llm.py."""
    pairs = jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text", n=3, threshold=0.2)
    return connected_components(pairs)


@query("llm_ivf_topk", oracle=None)
def llm_ivf_topk(spark, sf_dir):
    """IVF-flat ANN top-5 (L3 alternative scale path): coarse-quantizer
    inverted lists, n_probe nearest lists per query, exact re-rank inside.
    Recall vs brute force asserted in tests/test_llm.py."""
    e = _emb(spark, sf_dir)
    return ivf_topk(e.filter(F.col("vec_id") < 10), e, k=5, n_lists=16, n_probe=4)


@query(
    "llm_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n)
    SELECT doc_id, token, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rn
      FROM scored)
    WHERE rn <= 3
    """,
)
def llm_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document (L4): term frequency via
    explode+groupBy, document frequency via a distinct count, idf as a
    broadcast-joined lookup — the manual (non-MLlib) formulation whose
    shuffles are all on token/doc keys."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # one scalar action; at scale use a cached count
    scored = tf.join(F.broadcast(dfreq), "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


@query("llm_stratified_sample", oracle=None)
def llm_stratified_sample(spark, sf_dir):
    """Stratified sampling by language (training-data mixture control):
    seeded sampleBy with per-stratum fractions — deterministic for a given
    seed but engine-specific, so rows-only + proportion self-checks in
    tests/test_llm.py."""
    d = _docs(spark, sf_dir)
    fractions = {"en": 0.5, "es": 0.8, "fr": 0.8, "de": 1.0, "zh": 1.0}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang", "source")
