#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is materialized with the noop sink (all columns computed, nothing
collected to the driver) so timings reflect full plan execution, not
driver-side transfer. One warm-up run of the first query absorbs JVM/codegen
startup so per-query numbers are comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from s3_glue_redshift_guide_spark.queries import REGISTRY  # noqa: E402
from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402

# Headline set: the scale-critical representatives of each operator family.
HEADLINE = [
    "q1_pricing_summary",      # wide aggregate over the fact table
    "q5_regional_revenue",     # 6-table star join + agg
    "q3_shipping_priority",    # join + agg + top-k
    "join_range_events",       # bucketed range join
    "join_asof_events",        # as-of join (window pass)
    "win_rank_topk",           # top-k per group window
    "agg_rollup",              # grouping-sets aggregation
    "ev_session_window",       # session windows
    "llm_jaccard_pairs",       # inverted-index near-dup
    "llm_minhash_pairs",       # MinHash LSH dedup
    "llm_topk_similarity",     # brute-force ANN baseline
    "llm_text_stats",          # tokenize/fingerprint featurization
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    # warm-up: JVM + codegen + parquet footer caches
    materialize(REGISTRY[names[0]].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        materialize(REGISTRY[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
