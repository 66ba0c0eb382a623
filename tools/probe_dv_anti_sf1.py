"""DV-mask cost probe at sf1 (round 11, companion to the bucketed
readback anti-join tier — SURVEY S78).

Question: what does masking deletion vectors cost on the bucketed
readback path, and does the zero-Exchange co-bucketed join survive at
every tier? Three twins of the same 6M-row bucketed lineitem table:

- ``none``  — no DVs (the baseline join cost);
- ``point`` — ~60 positions, inline NOT-filter tier;
- ``half``  — 3M positions (50% MoR-deleted), broadcast anti-join tier
  (``dv_serve='anti'``).

Each joins the same co-bucketed orders-key table and aggregates per
key; min-of-3 wall after a warm run; the executed plan's
``Exchange hashpartitioning`` count and ``LeftAnti`` presence are
printed with the timings.

Run: python tools/probe_dv_anti_sf1.py   (needs .bench/sf1 from
tools/gen_sf1.py). Bank results in BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

from pyspark.sql import SparkSession, functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from s3_glue_redshift_guide_spark.sources.snapshots import (  # noqa: E402
    SnapshotTable,
    load_manifest,
)

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench",
    "sf1",
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(
        os.path.join(SF1, "lineitem.parquet")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    keys = SnapshotTable(spark, tempfile.mkdtemp(prefix="dvp_keys_"))
    keys.set_tblproperties({"bucket.by": "o_orderkey:8"})
    keys.commit_append(
        spark.read.parquet(os.path.join(SF1, "orders.parquet"))
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey")
    )
    vk = keys.register_bucketed_view(
        f"dvp_keys_{uuid.uuid4().hex[:6]}"
    )
    for mode in ("none", "point", "half"):
        t = SnapshotTable(
            spark, tempfile.mkdtemp(prefix=f"dvp_{mode}_")
        )
        t.set_tblproperties({"bucket.by": "l_orderkey:8"})
        t.commit_append(li)
        if mode == "half":
            t.delete_where(F.col("l_linenumber") % 2 == 0)
        elif mode == "point":
            t.delete_where(
                (F.col("l_orderkey") % 100_000 == 7)
                & (F.col("l_linenumber") == 1)
            )
        man = load_manifest(t.root, t.current_version())
        dv = {f: v for f, v in (man.get("dv") or {}).items() if v}
        sbytes = sum(
            os.path.getsize(os.path.join(d, f))
            for d in sorted({p for lst in dv.values() for p in lst})
            for f in os.listdir(d)
        )
        kw = {"dv_serve": "anti"} if mode == "half" else {}
        v = t.register_bucketed_view(
            f"dvp_{mode}_{uuid.uuid4().hex[:6]}", **kw
        )
        j = (
            spark.table(v)
            .join(
                spark.table(vk),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey")
            .agg(F.sum("cents").alias("c"))
        )
        j.count()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            j.count()
            ts.append(time.time() - t0)
        plan = j._jdf.queryExecution().executedPlan().toString()
        print(
            f"{mode}: best {min(ts):.2f} s | sidecar "
            f"{sbytes/1e6:.1f} MB | Exchange hashpartitioning "
            f"{plan.count('Exchange hashpartitioning')} | LeftAnti "
            f"{'LeftAnti' in plan}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
