#!/usr/bin/env python
"""Value-identity check of the round-11 dedup variants vs the shipped
implementations, at two scale factors. Exact frame equality (collect +
sorted compare) — the optimization must not change a single value."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from s3_glue_redshift_guide_spark.catalog import load_table  # noqa: E402
from s3_glue_redshift_guide_spark.llm.dedup import (  # noqa: E402
    jaccard_pairs,
    minhash_near_dup_pairs,
)
from s3_glue_redshift_guide_spark.queries.llm_suite import (  # noqa: E402
    JACCARD_MAX_SHINGLE_FREQ,
    _shingle_sets,
)
from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402

from exp_dedup_variants import jac_window_cap, mh_verify_barrier  # noqa: E402
from s3_glue_redshift_guide_spark.llm.dedup import (  # noqa: E402
    minhash_lsh_candidates,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def check(name, a, b):
    ra, rb = rows(a), rows(b)
    ok = ra == rb
    print(f"{name:40s} {'IDENTICAL' if ok else 'MISMATCH'} ({len(ra)} rows)")
    if not ok:
        sa, sb = set(ra), set(rb)
        print("  only-base:", list(sa - sb)[:5])
        print("  only-var :", list(sb - sa)[:5])
        sys.exit(1)


def main():
    spark = get_spark("exp_identity")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf_dir, "documents")
        sh = _shingle_sets(spark, sf_dir)
        print(f"== {sf_dir} ==")

        base_jac = jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.2,
            max_shingle_freq=JACCARD_MAX_SHINGLE_FREQ, shingle_sets=sh,
        )
        var_jac = jac_window_cap(sh, JACCARD_MAX_SHINGLE_FREQ, 0.2)
        check("jaccard window-cap", base_jac, var_jac)

        for cap in (None, 64):
            base_mh = minhash_near_dup_pairs(
                docs, "doc_id", "text", n=3, n_hashes=32, bands=16,
                threshold=0.2, shingle_sets=sh, max_band_bucket=cap,
            )
            cands = minhash_lsh_candidates(
                docs, "doc_id", "text", 3, 32, 16,
                shingle_sets=sh, max_band_bucket=cap,
            )
            var_mh = mh_verify_barrier(sh, cands, 0.2)
            check(f"minhash verify barrier cap={cap}", base_mh, var_mh)
    spark.stop()
    print("ALL IDENTICAL")


if __name__ == "__main__":
    main()
