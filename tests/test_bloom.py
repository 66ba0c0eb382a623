"""Bloom prefilter: zero false negatives (every true join key survives),
real volume reduction on a selective build side, and vectorized probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
)

from .conftest import SF_SMOKE


def test_no_false_negatives_and_reduces_volume(spark):
    o = load_table(spark, SF_SMOKE, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, SF_SMOKE, "lineitem")
    bitset = bloom_build(o, "o_orderkey")
    pruned = bloom_prefilter(l, "l_orderkey", bitset)

    n_total = l.count()
    n_pruned = pruned.count()
    n_true = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi").count()
    # never drops a matching row; genuinely cuts the shuffled volume
    assert n_true <= n_pruned < n_total

    # the prefiltered join equals the plain join exactly
    plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert pruned.join(o, pruned.l_orderkey == o.o_orderkey).count() == plain


def test_bitset_is_metadata_sized(spark):
    o = load_table(spark, SF_SMOKE, "orders").limit(100)
    bitset = bloom_build(o, "o_orderkey", m_bits=1 << 12)
    assert bitset.nbytes == (1 << 12) // 8  # 512 B for m=4096
    assert bitset.any()


def test_shingle_screen_drops_most_of_the_corpus_side(spark):
    """The decontamination composition: a Bloom filter of the (tiny) eval
    side must drop the overwhelming share of corpus shingles before the
    exact join, while keeping every true overlap."""
    from pyspark.sql import functions as F

    from s3_glue_redshift_guide_spark.llm.dedup import _doc_shingle_sets

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = _doc_shingle_sets(docs, "doc_id", "text", 3)
    ex = sh.select("doc", F.explode("sh").alias("shingle"))
    ev = ex.filter(F.col("doc") < 20).select("shingle").distinct()
    corp = ex.filter(F.col("doc") >= 20)
    bitset = bloom_build(ev, "shingle")
    cand = bloom_prefilter(corp, "shingle", bitset)
    n_corp, n_cand = corp.count(), cand.count()
    n_true = corp.join(ev, "shingle", "left_semi").count()
    assert n_true <= n_cand  # no false negatives
    assert n_cand < n_corp * 0.2, (n_cand, n_corp)  # real screening


def test_randomized_no_false_negatives_and_fp_bound(spark):
    """Seeded random key sets: every member key must pass (the Bloom
    contract), and the false-positive rate must sit near the analytic
    bound (1-e^(-kn/m))^k — ~9e-5 for n=2000, m=2^17, k=3; asserted
    under 1%."""
    import numpy as np

    for seed in (7, 23, 99):
        rng = np.random.RandomState(seed)
        members = rng.choice(10_000_000, size=2000, replace=False)
        non = rng.choice(10_000_000, size=4000, replace=False)
        non = np.setdiff1d(non, members)[:2000]
        mdf = spark.createDataFrame([(int(x),) for x in members], "k long")
        ndf = spark.createDataFrame([(int(x),) for x in non], "k long")
        bits = bloom_build(mdf, "k")
        assert bloom_prefilter(mdf, "k", bits).count() == len(members)
        fp = bloom_prefilter(ndf, "k", bits).count() / len(non)
        assert fp < 0.01, (seed, fp)
