"""Table-format DATA-op scale probe: the third decade (round 11).

The bench records the snapshot layer at sf0.1 and sf1 every round (one
decade). This probe derives sf10 ORDERS (the only table
``run_table_format_suite`` reads) — 10 key-shifted copies of the
derived sf1 orders, same recipe as tools/gen_sf1.py, ~15M rows — and
runs the SAME suite once, so OPTIMIZE / MoR MERGE / CDF / clustered
connector write / bloom lookup each get a measured sf0.1 -> sf1 -> sf10
growth curve like the LLM trio's (BENCH_NOTES round-10 probe).

Usage: python tools/probe_tf_sf10.py
Writes only under .bench/ (gitignored); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, ".bench", "sf1")
OUT = os.path.join(REPO, ".bench", "sf10rel")
STRIDE_ORDERKEY = 1_500_000  # sf1's o_orderkey universe
STRIDE_CUSTKEY = 150_000


def derive_orders() -> None:
    d = os.path.join(OUT, "orders.parquet")
    if os.path.isdir(d) and len(os.listdir(d)) == 100:
        return  # already derived (deterministic)
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(SF1, "orders.parquet")
    cols = [
        r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}/*.parquet'").fetchall()
    ]
    shifts = {"o_orderkey": STRIDE_ORDERKEY, "o_custkey": STRIDE_CUSTKEY}
    parts = sorted(os.listdir(src))
    k = 0
    for i in range(10):
        for p in parts:
            proj = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols
            )
            con.sql(
                f"COPY (SELECT {proj} FROM '{src}/{p}') TO "
                f"'{d}/part-{k:03d}.parquet' (FORMAT PARQUET)"
            )
            k += 1


def main() -> None:
    if not os.path.isdir(os.path.join(SF1, "orders.parquet")):
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_sf1.py")],
            capture_output=True,
        )
        if r.returncode != 0:
            sys.exit("gen_sf1 failed: " + r.stderr.decode()[-500:])
    derive_orders()
    from bench import run_table_format_suite  # noqa: E402
    from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402

    spark = get_spark("probe_tf_sf10")
    timings, extras = run_table_format_suite(spark, OUT, runs=1)
    print(
        json.dumps(
            {
                "sf": 10.0,
                "table_format": timings,
                "total": round(sum(timings.values()), 3),
                **{
                    k: v
                    for k, v in extras.items()
                    if isinstance(v, (int, float, str))
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
