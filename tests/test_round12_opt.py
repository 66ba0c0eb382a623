"""Round-12 optimization regressions.

Pins for this round's operator-internal changes:

* the Arrow coarse-quantizer assignment kernel must be BIT-IDENTICAL to
  the retained expression path (winners, norms, and the trained
  centroids), on real embedding data;
* the minhash banded/sized postings must stay materialized (one
  Generate+Window pass at runtime, not one per join side);
* the PQ/IVF-PQ exact re-rank must keep its single-fold pair projection
  with the corpus norm coming from the candidate-scoped projection, and
  the candidate frame must stay materialized (two consumers);
* ``_spread_width`` must cap plan width by the size signal on small
  inputs and keep the defaultParallelism ceiling on large ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.llm import similarity as S
from s3_glue_redshift_guide_spark.llm.dedup import (
    _doc_shingle_sets,
    _spread_width,
    minhash_lsh_candidates,
)

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def test_arrow_assignment_bit_identical_to_expression_path(spark):
    emb = _emb(spark)
    cents = S.kmeans_centroids(emb, k=8, iters=1, use_arrow=False)
    for n_keep, norm in ((1, None), (3, "__vn")):
        ref = S._nearest_lists(
            emb, cents, "embedding", ("vec_id", "id"), "v", n_keep,
            norm_out=norm, use_arrow=False,
        )
        got = S._nearest_lists(
            emb, cents, "embedding", ("vec_id", "id"), "v", n_keep,
            norm_out=norm, use_arrow=True,
        )
        assert _rows(got) == _rows(ref)


def test_arrow_kmeans_centroids_identical_to_expression_path(spark):
    emb = _emb(spark)
    ref = S.kmeans_centroids(emb, k=8, iters=2, use_arrow=False)
    got = S.kmeans_centroids(emb, k=8, iters=2, use_arrow=True)
    assert got == ref


def test_minhash_capped_candidates_match_groupby_stats_reference(spark):
    """Value pin for the capped candidate set: the shipped window shape
    must emit exactly the pairs of an independently-built groupBy-stats
    reference (the r12 rejected-variant shape — same math, different
    plan), so a future restructure can't silently drift the cap
    semantics."""
    docs = load_table(spark, SF, "documents")
    sets = _doc_shingle_sets(docs, "doc_id", "text", 3)
    cap = 8
    got = minhash_lsh_candidates(
        docs, "doc_id", "text", 3, 32, 16,
        shingle_sets=sets, max_band_bucket=cap,
    )
    # reference: same banding, bucket stats via groupBy + join-back
    uncapped_ab = minhash_lsh_candidates(
        docs, "doc_id", "text", 3, 32, 16, shingle_sets=sets,
    )
    from s3_glue_redshift_guide_spark.llm.dedup import (
        _materialize,
        _minhash_sigs_arrow,
    )

    r = 32 // 16
    sig = _materialize(
        _minhash_sigs_arrow(sets.filter(F.size("sh") > 0), 32)
    )
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", band * r + j + 1)
                                for j in range(r)
                            ]
                        ).alias("bucket"),
                    )
                    for band in range(16)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    stats = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bsz"), F.min("doc").alias("hub")
    )
    joined = banded.join(stats, ["band", "bucket"])
    sm = joined.filter(F.col("bsz") <= cap)
    ref_pairs = (
        sm.select("band", "bucket", F.col("doc").alias("doc_a"))
        .join(
            sm.select("band", "bucket", F.col("doc").alias("doc_b")),
            ["band", "bucket"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    ref_star = joined.filter(
        (F.col("bsz") > cap) & (F.col("doc") != F.col("hub"))
    ).select(F.col("hub").alias("doc_a"), F.col("doc").alias("doc_b"))
    ref = ref_pairs.unionAll(ref_star).distinct()
    assert _rows(got) == _rows(ref)
    # and the cap only ever REMOVES pairs vs uncapped (plus hub edges)
    assert len(_rows(got)) <= len(_rows(uncapped_ab)) + len(
        _rows(ref_star.distinct())
    )


def test_pq_rerank_single_fold_and_materialized_candidates(spark):
    emb = _emb(spark)
    q = emb.limit(5)
    df = S.pq_topk(q, emb, dim=64, k=3, m=8, k_codes=8,
                   n_candidates=10, kmeans_iters=1)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    cos_lines = [ln for ln in plan.splitlines() if "AS cos_sim" in ln]
    assert cos_lines, "re-rank projection missing"
    for ln in cos_lines:
        assert ln.count("aggregate(") == 1, "re-rank must fold ONCE"
        assert "__qn" in ln and "__cn" in ln
    # candidate frame materialized: the plan reads it as an RDD scan
    assert "ExistingRDD" in plan


def test_pq_assign_kernel_identical_to_expression_path(spark):
    """The r12 PQ assignment kernel (default for codebook training and
    pq_encode) must produce bit-identical codebooks AND codes vs the
    retained expression path — including the rounded-distance argmin
    tie semantics (round(_l2sq, 6) then (d, code) struct-sort order,
    reproduced with a raw-distance band + exact HALF_UP fallback)."""
    emb = _emb(spark)
    cb_k = S.pq_codebooks(emb, 64, m=8, k_codes=16, iters=2,
                          use_arrow=True)
    cb_e = S.pq_codebooks(emb, 64, m=8, k_codes=16, iters=2,
                          use_arrow=False)
    assert cb_k == cb_e
    enc_k = S.pq_encode(emb, cb_k, "vec_id", use_arrow=True)
    enc_e = S.pq_encode(emb, cb_k, "vec_id", use_arrow=False)
    assert _rows(enc_k) == _rows(enc_e)


def test_semantic_pairscore_kernel_identical_to_fold_path(spark):
    """The r12 per-list Arrow scoring kernel (default) must emit the
    exact pair set AND bit-identical cos_sim values of the retained
    salted-join fold path — including the Spark round(double, 6)
    semantics (Double.toString -> HALF_UP) the kernel mirrors via
    Decimal(repr(x))."""
    emb = _emb(spark)
    kern = S.semantic_dedup_pairs(
        emb, threshold=0.4, n_lists=8, n_probe=3, kmeans_iters=2,
        use_arrow=True,
    )
    fold = S.semantic_dedup_pairs(
        emb, threshold=0.4, n_lists=8, n_probe=3, kmeans_iters=2,
        use_arrow=False,
    )
    assert _rows(kern) == _rows(fold)


def test_merge_mor_null_key_duplicates_never_raise(spark, tmp_path):
    """ADVICE-r11: pin the null-key duplicate-source behavior on BOTH
    merge paths. NULL join keys never `=`-match a target row (Delta's
    matching), so they can never be ambiguous — a matched-clause merge
    must not raise for them; and an insert-only merge must never raise
    at all (matched rows are ignored whatever their multiplicity)."""
    from s3_glue_redshift_guide_spark.sources.snapshots import (
        SnapshotTable,
    )

    tgt = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    # matched-clause path: two NULL-key source rows + one real update
    t1 = SnapshotTable(spark, str(tmp_path / "nullkey_matched"))
    t1.commit_append(tgt.coalesce(1))
    src = spark.createDataFrame(
        [(None, 91), (None, 92), (2, 200)], "k long, v long"
    )
    t1.merge_mor(src, on=["k"], when_matched_update={"v": F.col("__src_v")})
    rows = {r["k"]: r["v"] for r in t1.read().filter("k is not null").collect()}
    assert rows == {1: 10, 2: 200, 3: 30}
    # the null-key rows are not-matched: they insert (Delta `=` join)
    assert t1.read().filter("k is null").count() == 2

    # insert-only path: duplicate keys MATCHING a target row are
    # ignored (no raise — Delta), not-matched duplicates both insert
    t2 = SnapshotTable(spark, str(tmp_path / "nullkey_insert_only"))
    t2.commit_append(tgt.coalesce(1))
    src2 = spark.createDataFrame(
        [(2, 201), (2, 202), (9, 90), (9, 91), (None, 1)],
        "k long, v long",
    )
    t2.merge_mor(src2, on=["k"])  # insert-only: must not raise
    out = t2.read()
    assert out.filter("k = 2").collect()[0]["v"] == 20  # untouched
    assert out.filter("k = 9").count() == 2  # both inserted
    assert out.filter("k is null").count() == 1


def test_spread_width_caps_small_and_ceilings_large(spark):
    par = spark.sparkContext.defaultParallelism
    small = load_table(spark, SF, "documents")  # ~65 KB at sf0.01
    w = _spread_width(small)
    assert 1 <= w <= max(1, par // 2), f"small input not capped: {w}"
    # a frame whose stats estimate is far beyond the slice budget
    big = small.crossJoin(spark.range(10_000).select(F.lit(1).alias("j")))
    assert _spread_width(big) == par
