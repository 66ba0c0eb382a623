#!/usr/bin/env python
"""Decade-scale probe of the SemDeDup-shape operator (round 11).

semantic_dedup_pairs' scale story is "compares ~ per-list co-residents,
never corpus^2" — which holds only when the quantizer scales with the
corpus (n_lists ~ n, constant per-list occupancy), exactly how FAISS
sizes IVF lists. This probe measures the operator across three decades
(800 / 8k / 80k vectors) holding occupancy constant, so the wall-clock
exponent is the operator's, not the demo parameters'.

sf10 embeddings derive like tools/gen_sf1.py::gen_embeddings at 10x
(same generative process, fresh seed — NOT copy-duplication, which
would collapse every cluster onto its copies and distort the candidate
structure being measured). Gitignored under .bench/sf10emb.

Also notes the salt behavior per decade: n_lists >= cores plans
UNSALTED (salts=1) — the local low-cardinality treatment vanishes at
production list counts by construction.

Deterministic. Usage: python tools/probe_ivf_sf10.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from s3_glue_redshift_guide_spark.catalog import load_table  # noqa: E402
from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402
from s3_glue_redshift_guide_spark.llm.similarity import (  # noqa: E402
    semantic_dedup_pairs,
)


def gen_sf10_embeddings(out: str, n: int = 80_000, seed: int = 44) -> None:
    rng = np.random.default_rng(seed)
    dim, k = 64, 10
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + 0.5 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    os.makedirs(out, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet", row_group_size=8_000)


def main() -> None:
    sf10 = os.path.join(REPO, ".bench", "sf10emb")
    if not os.path.exists(os.path.join(sf10, "embeddings.parquet")):
        gen_sf10_embeddings(sf10)

    spark = get_spark("probe-ivf-sf10")
    scales = [
        ("/root/testdata/sf0.1", 8),
        (os.path.join(REPO, ".bench", "sf1"), 80),
        (sf10, 800),
    ]
    print("scale | n_vecs | n_lists | pairs_found | wall_s (min of 2)")
    prev = None
    for sf_dir, n_lists in scales:
        e = load_table(spark, sf_dir, "embeddings")
        n = e.count()
        spark.sparkContext.setJobDescription(
            f"semantic_dedup probe n={n} L={n_lists}"
        )
        best, found = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            df = semantic_dedup_pairs(
                e, threshold=0.4, n_lists=n_lists, n_probe=3,
                kmeans_iters=2,
            )
            found = df.count()
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        exp = ""
        if prev:
            import math

            exp = f"  exponent {math.log10(best / prev):.2f}/decade"
        print(f"{sf_dir.split('/')[-1]} | {n} | {n_lists} | {found} | {best:.1f}{exp}")
        prev = best
    spark.stop()


if __name__ == "__main__":
    main()
