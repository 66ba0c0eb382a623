#!/usr/bin/env python
"""A/B experiments for the near-dup optimization candidates (round 11).

Baseline vs variants, min-of-3 each, noop sink. Variants are implemented
inline; winners get applied to llm/dedup.py and proven value-identical.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window as W, functions as F  # noqa: E402

from s3_glue_redshift_guide_spark.catalog import load_table  # noqa: E402
from s3_glue_redshift_guide_spark.llm.dedup import (  # noqa: E402
    _materialize,
    _minhash_sigs_arrow,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
)
from s3_glue_redshift_guide_spark.queries.llm_suite import (  # noqa: E402
    JACCARD_MAX_SHINGLE_FREQ,
    _shingle_sets,
)
from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, runs=3):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:55s} {best:8.3f} s", flush=True)
    return best


# --- variant implementations ------------------------------------------


def mh_verify_barrier(docs_sets, cands, threshold):
    """V1: single-eval verify — n_common/sizes in one projection, barrier,
    then the threshold filter (cannot push into the join condition)."""
    a = docs_sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = docs_sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    scored = joined.select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("sh_a", "sh_b")).alias("__n_common"),
        F.size("sh_a").alias("__n_a"),
        F.size("sh_b").alias("__n_b"),
    )
    jac = F.col("__n_common").cast("double") / (
        F.col("__n_a") + F.col("__n_b") - F.col("__n_common")
    ).cast("double")
    return (
        _materialize(scored)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def mh_capped_barrier(sig, bands, r, max_band_bucket):
    """V2: one banding pass + one window pass, materialized, shared by the
    small-bucket self-join and the star branch."""
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", band * r + j + 1) for j in range(r)]
                        ).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    w = W.partitionBy("band", "bucket")
    sized = _materialize(
        banded.withColumns(
            {
                "__bsz": F.count(F.lit(1)).over(w),
                "__hub": F.min("doc").over(w),
            }
        )
    )
    small = sized.filter(F.col("__bsz") <= max_band_bucket)
    a = small.select("band", "bucket", F.col("doc").alias("doc_a"))
    b = small.select("band", "bucket", F.col("doc").alias("doc_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    star = sized.filter(
        (F.col("__bsz") > max_band_bucket) & (F.col("doc") != F.col("__hub"))
    ).select(F.col("__hub").alias("doc_a"), F.col("doc").alias("doc_b"))
    return pairs.unionAll(star).distinct()


def jac_kept_barrier(sh, cap, threshold):
    """V3: materialize the capped postings so the a/b sides of the
    self-join share one computation."""
    ex = sh.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = _materialize(
        ex.join(freq.filter(F.col("df") <= cap), "shingle")
    )
    a = kept.select("shingle", F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    b = kept.select("shingle", F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return inter.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def jac_window_cap(sh, cap, threshold):
    """V4: window-count cap (one exchange of the postings) instead of
    groupBy + join-back, then materialize for the self-join."""
    ex = sh.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    w = W.partitionBy("shingle")
    kept = _materialize(
        ex.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= cap)
        .drop("__df")
    )
    a = kept.select("shingle", F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    b = kept.select("shingle", F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return inter.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench", "sf1")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp_dedup")
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_sets(spark, sf_dir)
    mat(sh)
    spark.range(1000).toPandas()
    print(f"== variants @ {sf_dir}, min-of-{runs} ==", flush=True)

    # baseline references
    timeit(
        "BASE mh.full capped=64",
        lambda: mat(
            minhash_near_dup_pairs(
                docs, "doc_id", "text", n=3, n_hashes=32, bands=16,
                threshold=0.2, shingle_sets=sh, max_band_bucket=64,
            )
        ),
        runs,
    )

    # V1: verify barrier on top of baseline candidates
    def v1():
        ds = sh
        cands = minhash_lsh_candidates(
            docs, "doc_id", "text", 3, 32, 16,
            shingle_sets=ds, max_band_bucket=64,
        )
        mat(mh_verify_barrier(ds, cands, 0.2))

    timeit("V1   mh.full, verify barrier", v1, runs)

    # V2: capped candidates with one banding+window pass
    def v2_cands():
        sig = _materialize(
            _minhash_sigs_arrow(sh.filter(F.size("sh") > 0), 32)
        )
        mat(mh_capped_barrier(sig, 16, 2, 64))

    timeit("V2   mh.candidates capped, sized barrier", v2_cands, runs)
    timeit(
        "BASE mh.candidates capped",
        lambda: mat(
            minhash_lsh_candidates(
                docs, "doc_id", "text", 3, 32, 16,
                shingle_sets=sh, max_band_bucket=64,
            )
        ),
        runs,
    )

    # V1+V2 combined
    def v12():
        sig = _materialize(
            _minhash_sigs_arrow(sh.filter(F.size("sh") > 0), 32)
        )
        cands = mh_capped_barrier(sig, 16, 2, 64)
        mat(mh_verify_barrier(sh, cands, 0.2))

    timeit("V1+2 mh.full combined", v12, runs)

    # jaccard
    timeit(
        "BASE jac.full capped=5",
        lambda: mat(
            jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.2,
                max_shingle_freq=JACCARD_MAX_SHINGLE_FREQ, shingle_sets=sh,
            )
        ),
        runs,
    )
    timeit(
        "V3   jac kept barrier",
        lambda: mat(jac_kept_barrier(sh, JACCARD_MAX_SHINGLE_FREQ, 0.2)),
        runs,
    )
    timeit(
        "V4   jac window cap",
        lambda: mat(jac_window_cap(sh, JACCARD_MAX_SHINGLE_FREQ, 0.2)),
        runs,
    )

    spark.stop()


if __name__ == "__main__":
    main()
