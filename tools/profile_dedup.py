#!/usr/bin/env python
"""Component-level wall profiling of the near-dup headline queries
(guide §1: measure first — which stage of minhash/jaccard owns the time).

Each component is materialized with the noop sink after a warm pass;
min-of-N reported. Usage: python tools/profile_dedup.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

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
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:45s} {best:8.3f} s")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench", "sf1")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_dedup")
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_sets(spark, sf_dir)
    mat(sh)  # featurize once, outside all timings (bench does the same)
    spark.range(1000).toPandas()
    print(f"== components @ {sf_dir}, min-of-{runs} ==")

    n_docs = docs.count()
    print(f"docs: {n_docs}")

    # --- minhash components -------------------------------------------
    sigs = _materialize(_minhash_sigs_arrow(sh.filter(F.size("sh") > 0), 32))
    timeit("mh.signatures (arrow mapInPandas)", lambda: mat(sigs), runs)

    timeit(
        "mh.candidates capped=64 (bench shape)",
        lambda: mat(
            minhash_lsh_candidates(
                docs, "doc_id", "text", 3, 32, 16,
                shingle_sets=sh, max_band_bucket=64,
            )
        ),
        runs,
    )
    timeit(
        "mh.candidates uncapped",
        lambda: mat(
            minhash_lsh_candidates(
                docs, "doc_id", "text", 3, 32, 16, shingle_sets=sh
            )
        ),
        runs,
    )
    timeit(
        "mh.full capped=64 (bench operator)",
        lambda: mat(
            minhash_near_dup_pairs(
                docs, "doc_id", "text", n=3, n_hashes=32, bands=16,
                threshold=0.2, shingle_sets=sh, max_band_bucket=64,
            )
        ),
        runs,
    )
    cands = minhash_lsh_candidates(
        docs, "doc_id", "text", 3, 32, 16, shingle_sets=sh, max_band_bucket=64
    )
    print(f"candidate pairs (capped): {cands.count()}")

    # --- jaccard components -------------------------------------------
    timeit(
        "jac.full capped=5 (bench query)",
        lambda: mat(
            jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.2,
                max_shingle_freq=JACCARD_MAX_SHINGLE_FREQ, shingle_sets=sh,
            )
        ),
        runs,
    )
    ex = sh.select(
        "doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    timeit("jac.postings explode only", lambda: mat(ex), runs)
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = ex.join(freq.filter(F.col("df") <= JACCARD_MAX_SHINGLE_FREQ), "shingle")
    timeit("jac.postings+freq cap join", lambda: mat(kept), runs)

    spark.stop()


if __name__ == "__main__":
    main()
