#!/usr/bin/env python
"""Generate a DERIVED sf10 documents table under .bench/sf10 (gitignored).

VERDICT-r9 directive #8 asks for one scale probe ABOVE sf1 for the LLM
headline trio (jaccard / minhash / text_stats — all documents-only), so
the 100 TB plan-shape arguments gain a measured decade: sf0.1 (5k docs)
-> sf1 (50k) -> sf10 (500k). Same generative process as tools/gen_sf1.py
(31-word vocab, 8-110 word lengths, lang/source mix, seed 42) — NOT
copy-duplication, which would inflate every shingle bucket and distort
the near-dup candidate structure being measured; re-running the process
at 10x keeps the emergent duplicate rate.

The output is a 10-file directory so scan parallelism reflects a real
multi-file table, not a single-file layout artifact.

Deterministic. Usage:  python tools/gen_sf10_docs.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gen_sf1 import LANGS, LANG_P, VOCAB  # same marginals as sf1


def gen_documents_dir(
    out: str, n: int = 500_000, files: int = 10, seed: int = 42
) -> None:
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    d = os.path.join(out, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    per = n // files
    base = 0
    for i in range(files):
        nwords = rng.integers(8, 110, size=per)
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), size=k)])
            for k in nwords
        ]
        langs = rng.choice(LANGS, size=per, p=LANG_P)
        sources = [f"src{int(x)}" for x in rng.integers(0, 20, size=per)]
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    range(base, base + per), pa.int64()
                ),
                "text": pa.array(texts),
                "lang": pa.array([str(x) for x in langs]),
                "source": pa.array(sources),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"part-{i:02d}.parquet"))
        base += per


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench", "sf10",
    )
    os.makedirs(out, exist_ok=True)
    gen_documents_dir(out)
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet/*.parquet'"
    ).fetchone()[0]
    print("documents", n)


if __name__ == "__main__":
    main()
