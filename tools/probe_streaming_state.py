"""Streaming state-store scale probe (round 11).

Every other layer has measured growth exponents (relational sf0.1->sf1,
LLM trio sf0.1->sf1->sf10, manifest log to 2k commits, table-format
sf10); the STREAMING layer's 100 TB claims — watermarks bound state,
per-trigger cost tracks the BATCH not the accumulated STATE — were so
far plan-shape arguments. This probe turns both into data, read
straight from the engine's own telemetry (``query.recentProgress``:
per-trigger durations, ``stateOperators[].numRowsTotal`` /
``memoryUsedBytes`` / ``commitTimeMs``).

Two experiments x two state-store providers (HDFS-backed heap map vs
RocksDB), driven by pre-staged zero-padded parquet batches with
``maxFilesPerTrigger=1`` + ``processAllAvailable()``:

- ``dedup-grow``: every batch carries ALL-NEW keys, so
  ``dropDuplicates`` state grows by one batch per trigger (the
  unbounded-retention shape; production bounds it with
  dropDuplicatesWithinWatermark — this measures the cost curve a
  pipeline rides if it doesn't). Fit: log(trigger ms) vs log(state
  rows) across batches -> the per-trigger exponent in state size. The
  other number that matters at 100 TB is ``memoryUsedBytes``: the
  HDFS-backed provider keeps every key ON HEAP, so its growth line is
  the executor-memory ceiling; RocksDB's stays off-heap/disk.

- ``window-bounded``: fixed key population, event time advancing one
  minute per batch, 2-minute tumbling windows under a 5-minute
  watermark. The claim: state PLATEAUS (closed windows evict) while
  input keeps flowing, and trigger cost stays flat. Reported as
  plateau ratio (final state / mid-run state, ~1.0 = bounded) and
  steady-cost ratio (last-5 / mid-5 trigger ms).

Run:  python tools/probe_streaming_state.py [--quick]
Bank the table + readings in BENCH_NOTES.md.
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
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def stage_batches(
    spark, root: str, n_batches: int, rows: int, mode: str, n_keys: int
) -> str:
    """dedup-grow: batch b's keys are [b*rows, (b+1)*rows) — all new.
    window-bounded: keys uniform in [0, n_keys), event time advancing
    one minute per batch so the watermark closes old windows."""
    src = os.path.join(root, "in")
    for b in range(n_batches):
        base = spark.range(rows)
        if mode == "grow":
            k = (F.col("id") + b * rows).alias("k")
        else:
            k = ((F.col("id") * 2654435761 + b * 97) % n_keys).alias(
                "k"
            )
        (
            base.select(
                k,
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
    batches = [
        p
        for p in prog
        if p.get("numInputRows", 0) > 0 and p.get("stateOperators")
    ]
    return wall, [
        {
            "trigger_ms": p["durationMs"].get("triggerExecution", 0),
            "commit_ms": p["stateOperators"][0].get("commitTimeMs", 0),
            "state_rows": p["stateOperators"][0].get("numRowsTotal", 0),
            "mem_bytes": p["stateOperators"][0].get(
                "memoryUsedBytes", 0
            ),
        }
        for p in batches
    ]


def _mean(xs):
    return sum(xs) / max(1, len(xs))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n_batches = 10 if args.quick else 40
    rows = 20_000 if args.quick else 100_000
    n_keys = 20_000
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-streaming-state")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: throwaway streams so JIT/codegen/provider class loading
    # don't land in the first measured configuration
    wroot = tempfile.mkdtemp(prefix="probe_ss_warm_")
    try:
        wsrc = stage_batches(spark, wroot, 3, 5_000, "grow", n_keys)
        for prov in (HDFS, ROCKSDB):
            run_stream(
                spark,
                wsrc,
                os.path.join(wroot, f"ck_{prov[-20:]}"),
                "dedup",
                prov,
            )
    except Exception as e:
        print(f"warm-up failed: {e}", file=sys.stderr)
    finally:
        shutil.rmtree(wroot, ignore_errors=True)

    for op, mode in (("dedup", "grow"), ("window", "bounded")):
        root = tempfile.mkdtemp(prefix=f"probe_ss_{op}_")
        try:
            src = stage_batches(
                spark, root, n_batches, rows, mode, n_keys
            )
            for pname, pclass in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
                ckpt = os.path.join(root, f"ck_{pname}")
                try:
                    wall, b = run_stream(spark, src, ckpt, op, pclass)
                except Exception as e:
                    print(f"{op}/{pname}: UNAVAILABLE {str(e)[:120]}")
                    continue
                n = len(b)
                mid = b[n // 2 - 2 : n // 2 + 3]
                last = b[-5:]
                first = b[2:7]
                out = {
                    "op": op,
                    "provider": pname,
                    "batches": n,
                    "early_trigger_ms": round(
                        _mean([x["trigger_ms"] for x in first])
                    ),
                    "mid_trigger_ms": round(
                        _mean([x["trigger_ms"] for x in mid])
                    ),
                    "late_trigger_ms": round(
                        _mean([x["trigger_ms"] for x in last])
                    ),
                    "late_commit_ms": round(
                        _mean([x["commit_ms"] for x in last])
                    ),
                    "mid_state_rows": b[n // 2]["state_rows"],
                    "final_state_rows": b[-1]["state_rows"],
                    "early_mem_mb": round(
                        b[4]["mem_bytes"] / 1e6, 1
                    ),
                    "final_mem_mb": round(
                        b[-1]["mem_bytes"] / 1e6, 1
                    ),
                    "wall_s": round(wall, 1),
                }
                if mode == "grow":
                    # per-trigger cost exponent in STATE SIZE: compare
                    # steady readings one state-decade apart
                    s0, s1 = (
                        b[max(2, n // 10)],
                        b[-1],
                    )
                    if s0["state_rows"] > 0 and s1["state_rows"] > 0:
                        out["trigger_vs_state_exp"] = round(
                            math.log(
                                max(
                                    _mean(
                                        [x["trigger_ms"] for x in last]
                                    ),
                                    1,
                                )
                                / max(s0["trigger_ms"], 1)
                            )
                            / math.log(
                                s1["state_rows"] / s0["state_rows"]
                            ),
                            2,
                        )
                    out["mem_growth_x"] = round(
                        b[-1]["mem_bytes"]
                        / max(1, b[max(2, n // 10)]["mem_bytes"]),
                        1,
                    )
                else:
                    out["state_plateau_ratio"] = round(
                        b[-1]["state_rows"]
                        / max(1, b[n // 2]["state_rows"]),
                        2,
                    )
                    out["steady_cost_ratio"] = round(
                        _mean([x["trigger_ms"] for x in last])
                        / max(
                            1.0, _mean([x["trigger_ms"] for x in mid])
                        ),
                        2,
                    )
                print(json.dumps(out), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
