"""Streaming state-store scale probe (round 11).

Every other layer has measured growth exponents (relational sf0.1->sf1,
LLM trio sf0.1->sf1->sf10, manifest log to 2k commits, table-format
sf10); the STREAMING layer's 100 TB claims — bounded state under
watermarks, O(batch) not O(state) per-trigger cost — are so far
plan-shape arguments. This probe turns them into data.

Method: pre-stage B zero-padded parquet batch files, drive a stream
with ``maxFilesPerTrigger=1`` + ``processAllAvailable()``, then read
``query.recentProgress`` — per-trigger durations and
``stateOperators[].numRowsTotal`` — straight from the engine's own
telemetry. Two stateful ops x three key-cardinality decades x two
state-store providers:

- ``dedup``   — ``dropDuplicates`` under a watermark: state grows to K
  then saturates; the question is whether per-trigger cost follows
  state size (O(state) snapshot re-write) or batch size (incremental).
- ``window``  — tumbling event-time count per key: watermark closes
  windows each trigger, so state is windows-in-horizon x K.

Providers: HDFS-backed (default; keeps every key in executor heap and
snapshots per maintenance interval) vs RocksDB (incremental
changelog). The 100 TB question is exactly the provider choice: at
1e8+ keys per executor heap-backed state stops fitting; RocksDB's
per-trigger cost must stay flat in K for streams to scale.

Run:  python tools/probe_streaming_state.py [--quick]
Writes a markdown table to stdout; bank the result in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def stage_batches(
    spark, root: str, n_batches: int, rows: int, n_keys: int
) -> str:
    """Batch b: ``rows`` events, keys uniform in [0, n_keys), event
    time advancing one minute per batch (so watermarks close old
    windows as the stream progresses)."""
    src = os.path.join(root, "in")
    for b in range(n_batches):
        (
            spark.range(rows)
            .select(
                ((F.col("id") * 2654435761 + b * 97) % n_keys).alias(
                    "k"
                ),
                F.to_timestamp(
                    F.lit("2026-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(mins=F.lit(b))
                ).alias("ts"),
                F.col("id").alias("v"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"b{b:04d}"))
        )
    return src


def run_stream(spark, src: str, ckpt: str, op: str, provider: str):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", provider
    )
    raw = (
        spark.readStream.schema("k long, ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
        .withWatermark("ts", "5 minutes")
    )
    if op == "dedup":
        out = raw.dropDuplicates(["k"])
    elif op == "window":
        out = raw.groupBy(
            F.window("ts", "2 minutes"), F.col("k")
        ).agg(F.count("*").alias("n"))
    else:
        raise ValueError(op)
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append" if op == "dedup" else "update")
        .start()
    )
    t0 = time.time()
    q.processAllAvailable()
    wall = time.time() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    return wall, prog


def summarize(prog):
    batches = [
        p
        for p in prog
        if p.get("numInputRows", 0) > 0 and p.get("stateOperators")
    ]
    if not batches:
        return None
    trig = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    state = [p["stateOperators"][0].get("numRowsTotal", 0) for p in batches]
    commit = [
        p["stateOperators"][0].get("commitTimeMs", 0) for p in batches
    ]
    k = max(1, min(3, len(trig) // 2))
    return {
        "n_batches": len(batches),
        "first_ms": sum(trig[:k]) / k,
        "last_ms": sum(trig[-k:]) / k,
        "final_state_rows": state[-1],
        "last_commit_ms": sum(commit[-k:]) / k,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n_batches = 8 if args.quick else 16
    rows = 20_000 if args.quick else 100_000
    cards = [10_000, 100_000, 1_000_000]
    if args.quick:
        cards = cards[:2]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-streaming-state")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: one throwaway stream so JIT/codegen/state-store class
    # loading doesn't land in the first measured configuration
    wroot = tempfile.mkdtemp(prefix="probe_ss_warm_")
    try:
        wsrc = stage_batches(spark, wroot, 3, 5_000, 1_000)
        run_stream(
            spark, wsrc, os.path.join(wroot, "ck"), "dedup", ROCKSDB
        )
    except Exception:
        pass
    finally:
        shutil.rmtree(wroot, ignore_errors=True)
    providers = [("hdfs", None), ("rocksdb", ROCKSDB)]
    results = []
    for n_keys in cards:
        root = tempfile.mkdtemp(prefix=f"probe_ss_{n_keys}_")
        try:
            src = stage_batches(spark, root, n_batches, rows, n_keys)
            for op in ("dedup", "window"):
                for pname, pclass in providers:
                    ckpt = os.path.join(root, f"ck_{op}_{pname}")
                    try:
                        wall, prog = run_stream(
                            spark,
                            src,
                            ckpt,
                            op,
                            pclass
                            or spark.conf.get(
                                "spark.sql.streaming.stateStore."
                                "providerClass.default",
                                "org.apache.spark.sql.execution."
                                "streaming.state."
                                "HDFSBackedStateStoreProvider",
                            ),
                        )
                    except Exception as e:  # provider unavailable
                        print(
                            f"| {op} | {pname} | {n_keys} | "
                            f"UNAVAILABLE: {str(e)[:80]} |"
                        )
                        continue
                    s = summarize(prog)
                    s.update(
                        op=op, provider=pname, n_keys=n_keys, wall=wall
                    )
                    results.append(s)
                    print(
                        f"| {op} | {pname} | {n_keys:>9,} | "
                        f"{s['n_batches']:>2} | {s['first_ms']:8.0f} | "
                        f"{s['last_ms']:8.0f} | {s['last_commit_ms']:7.0f} | "
                        f"{s['final_state_rows']:>9,} | {wall:6.1f} |",
                        flush=True,
                    )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    # growth of steady-state trigger cost vs key cardinality
    print()
    for op in ("dedup", "window"):
        for pname, _ in providers:
            pts = [
                r
                for r in results
                if r["op"] == op and r["provider"] == pname
            ]
            if len(pts) >= 2:
                a, b = pts[0], pts[-1]
                exp = (
                    math.log(max(b["last_ms"], 1) / max(a["last_ms"], 1))
                    / math.log(b["n_keys"] / a["n_keys"])
                )
                print(
                    f"{op}/{pname}: steady trigger "
                    f"{a['last_ms']:.0f} -> {b['last_ms']:.0f} ms over "
                    f"{a['n_keys']:,} -> {b['n_keys']:,} keys; "
                    f"exponent {exp:.2f}/decade"
                )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
