#!/usr/bin/env python
"""Generate a DERIVED sf1.0 bench dataset under .bench/sf1 (gitignored).

The driver ships sf{0.001,0.01,0.1}; VERDICT r4 directive #2 asks for one
bench point where DATA dominates Spark's constant overheads. This tool
builds sf1 (~6M lineitem rows) from public structure only:

* TPC-H-ish tables + events: 10 key-shifted copies of sf0.1 — join
  selectivities, group cardinalities and per-user event density are
  preserved EXACTLY (each copy is a disjoint key universe with the same
  internal structure), which is what a scaling study needs.
* documents / embeddings: FRESH seeded generation mirroring sf0.1's
  marginals (31-word vocab, length/lang/source mix; 64-dim unit vectors
  in 10 label clusters). Copy-duplication would be wrong here: identical
  text 10x would inflate every shingle bucket and distort the near-dup
  candidate structure the LLM queries are benched on; re-running the
  same random process at 10x keeps the emergent duplicate rate instead.

Deterministic (seed 42). Usage:  python tools/gen_sf1.py [outdir]
Then:  SPARK_GRAFT_SF_DIR=.bench/sf1 SPARK_GRAFT_BENCH_SF=1.0 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key strides = sf0.1 key-universe sizes
STRIDE = {
    "o_orderkey": 150_000,
    "l_orderkey": 150_000,
    "c_custkey": 15_000,
    "o_custkey": 15_000,
    "s_suppkey": 1_000,
    "l_suppkey": 1_000,
    "p_partkey": 20_000,
    "l_partkey": 20_000,
    "event_id": 100_000,
    "user_id": 1_500,
}

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.412, 0.147, 0.147, 0.147, 0.147]


def shift_union(con: duckdb.DuckDBPyConnection, table: str, out: str) -> None:
    """One key-shifted copy PER FILE, written into a ``{table}.parquet``
    DIRECTORY (Spark reads it transparently): a single 10x fact file
    would cap scan parallelism at size/maxPartitionBytes (~2 tasks for
    lineitem) — a pure layout artifact no real multi-file table has, and
    it distorts the sf1 scaling trend the bench block exists to show."""
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).fetchall()
    ]
    d = f"{out}/{table}.parquet"
    os.makedirs(d, exist_ok=True)
    for i in range(COPIES):
        proj = ", ".join(
            f"{c} + {i * STRIDE[c]} AS {c}" if c in STRIDE else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {proj} FROM '{SRC}/{table}.parquet') TO"
            f" '{d}/part-{i:02d}.parquet' (FORMAT PARQUET)"
        )


def gen_documents(out: str, n: int = 50_000, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    nwords = rng.integers(8, 110, size=n)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), size=k)])
        for k in nwords
    ]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = [f"src{int(i)}" for i in rng.integers(0, 20, size=n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([str(x) for x in langs]),
            "source": pa.array(sources),
            "n_chars": pa.array(
                [len(t) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(out: str, n: int = 8_000, seed: int = 43) -> None:
    rng = np.random.default_rng(seed)
    dim, k = 64, 10
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + 0.5 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
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
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench", "sf1",
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):  # fixed-size dims: verbatim
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO"
            f" '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events"):
        shift_union(con, t, out)
    gen_documents(out)
    gen_embeddings(out)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        pat = (
            f"{out}/{t}.parquet/*.parquet"
            if os.path.isdir(f"{out}/{t}.parquet")
            else f"{out}/{t}.parquet"
        )
        n = con.sql(f"SELECT count(*) FROM '{pat}'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
