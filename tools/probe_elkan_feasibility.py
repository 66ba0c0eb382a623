#!/usr/bin/env python
"""Measure-first probe for Elkan-style coarse-quantizer pruning (r12).

The r11 verdict queued "Elkan-style exact assignment pruning" for the
O(n*L) IVF assignment term. Elkan/Hamerly bounds prune a centroid c for
row x (current best b) via the triangle inequality on the unit sphere
(cosine distance <-> Euclidean on normalized vectors):

  lemma 1 (half-distance): e(b,c) >= 2*e(x,b)        -> c cannot win
  lemma 2 (subtraction):   e(x,c) >= e(b,c) - e(x,b) -> prune when the
           implied cosine upper bound still loses to the current best

Whether those bounds ever FIRE depends entirely on the corpus geometry:
they need rows to sit much closer to their centroid than centroids sit
to each other. This probe replays the exact quantizer (same init, same
Lloyd rounds, same fp64 arithmetic as functions/vectors.py) over the
REAL embedding tables and counts, per assignment pass, the fraction of
(row, centroid) distance evaluations each lemma could skip — an upper
bound on Elkan's benefit BEFORE paying the implementation risk on a
bit-identity-critical path.

Pure numpy (no Spark) — the prune-rate question is geometric, not
distributed. Deterministic. Usage: python tools/probe_elkan_feasibility.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_emb(path: str) -> np.ndarray:
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    return np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )[order]


def lloyd(vecs: np.ndarray, k: int, iters: int = 2) -> np.ndarray:
    """Mirror kmeans_centroids: first-k init, cosine assignment, per-dim
    means rounded to 6 dp."""
    cents = vecs[:k].copy()
    for _ in range(iters):
        a = assign(vecs, cents)
        new = []
        for i in range(k):
            m = a == i
            new.append(
                np.round(vecs[m].mean(axis=0), 6) if m.any() else cents[i]
            )
        cents = np.stack(new)
    return cents


def assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d = dist(vecs, cents)
    return d.argmin(axis=1)  # first (lowest list_id) argmin on ties


def dist(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """-cosine, the assignment distance."""
    vn = np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    return -(vecs @ cents.T) / (vn * cn.T)


def prune_rates(vecs: np.ndarray, cents: np.ndarray) -> tuple[float, float]:
    """Fraction of (row, centroid) evaluations each lemma could skip,
    assuming the fold already knows the TRUE best (the most optimistic
    ordering any single-pass implementation could hope for)."""
    d = dist(vecs, cents)  # -cos in [-1, 1]
    e_x = np.sqrt(np.maximum(0.0, 2.0 + 2.0 * d))  # e(x, c) per pair
    best = e_x.min(axis=1, keepdims=True)  # e(x, b)
    # unit-normalized centroid pairwise Euclid
    cu = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    e_cc = np.sqrt(
        np.maximum(0.0, 2.0 - 2.0 * np.clip(cu @ cu.T, -1.0, 1.0))
    )
    b_idx = e_x.argmin(axis=1)
    e_bc = e_cc[b_idx]  # e(b, c) per (row, centroid)
    k = cents.shape[0]
    denom = vecs.shape[0] * (k - 1)  # best itself always evaluates
    lem1 = int((e_bc >= 2.0 * best).sum())
    # lemma 2: lower bound on e(x,c); prunes when lb > e(x,b)
    lem2 = int(((e_bc - best) > best).sum())
    return lem1 / denom, lem2 / denom


def stats(vecs: np.ndarray, cents: np.ndarray) -> str:
    d = dist(vecs, cents)
    e = np.sqrt(np.maximum(0.0, 2.0 + 2.0 * d))
    best = e.min(axis=1)
    cu = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    e_cc = np.sqrt(np.maximum(0.0, 2.0 - 2.0 * np.clip(cu @ cu.T, -1, 1)))
    iu = np.triu_indices(len(cents), 1)
    return (
        f"median e(x,b)={np.median(best):.3f} "
        f"median e(b,c)={np.median(e_cc[iu]):.3f} "
        f"max e(b,c)={e_cc[iu].max():.3f}"
    )


def main() -> None:
    cases = [("/root/testdata/sf0.1/embeddings.parquet", [8, 16])]
    sf1 = os.path.join(REPO, ".bench", "sf1", "embeddings.parquet")
    if os.path.exists(sf1):
        cases.append((sf1, [8, 16, 80]))
    sf10 = os.path.join(REPO, ".bench", "sf10emb", "embeddings.parquet")
    if os.path.exists(sf10):
        cases.append((sf10, [80, 800]))
    for path, ks in cases:
        vecs = load_emb(path)
        print(f"== {path} n={len(vecs)}")
        for k in ks:
            cents = lloyd(vecs, k)
            r1, r2 = prune_rates(vecs, cents)
            print(
                f"  n_lists={k:4d}: lemma1 prune={r1:7.4%}  "
                f"lemma2 prune={r2:7.4%}   [{stats(vecs, cents)}]"
            )


if __name__ == "__main__":
    main()
