"""Metadata-scale probe (VERDICT-r10 directive #8): manifest-log
operation cost vs COMMIT DEPTH, with and without log checkpoints.

The LLM trio has measured scale exponents (BENCH_NOTES round-10 probe);
this banks the same kind of data for the table-format layer. A
streaming table committing once a minute accumulates ~500k versions a
year — the ops a reader pays on every table open must stay flat in
total version count:

  * ``latest_version``  — head resolution (pointer + forward probe)
  * ``load_manifest``   — head-state load (self-contained manifest)
  * ``version_as_of``   — TIMESTAMP AS OF (checkpoint timestamp index)
  * ``history().count`` — DESCRIBE HISTORY (checkpoint history index)

Build: one real data commit, then property commits to depth (each a
full manifest publish through the same ``_publish`` choke point —
what a high-frequency metadata writer looks like without paying 2,000
Spark write jobs in a probe). The no-checkpoint twin patches
``CHECKPOINT_INTERVAL`` beyond reach, keeping the head POINTER (it
updates per-commit regardless) — so the delta isolates the checkpoint
indexes, and a third timing drops the pointer file to show the raw
listing fallback.

Usage: python tools/probe_manifest_depth.py [depths...]
Writes nothing outside .bench/ (gitignored); prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402
from s3_glue_redshift_guide_spark.sources import snapshots as S  # noqa: E402


def _timeit(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _measure(root: str, spark) -> dict:
    t = S.SnapshotTable(spark, root)
    head = S.latest_version(root)
    mid_ts = S.load_manifest(root, max(1, head // 2)).get("ts")
    out = {
        "latest_version_ms": round(
            _timeit(lambda: S.latest_version(root)) * 1e3, 3
        ),
        "load_manifest_head_ms": round(
            _timeit(lambda: S.load_manifest(root, head)) * 1e3, 3
        ),
        "version_as_of_ms": round(
            _timeit(lambda: S.version_as_of(root, mid_ts)) * 1e3, 3
        ),
        "history_ms": round(
            _timeit(lambda: t.history().count(), reps=2) * 1e3, 1
        ),
    }
    # the raw fallback: head resolution with NO pointer file
    ptr = os.path.join(root, "_manifests", "_last_checkpoint.json")
    saved = open(ptr).read() if os.path.exists(ptr) else None
    if saved is not None:
        os.unlink(ptr)
    out["latest_version_no_pointer_ms"] = round(
        _timeit(lambda: S.latest_version(root)) * 1e3, 3
    )
    if saved is not None:
        with open(ptr, "w") as f:
            f.write(saved)
    return out


def main() -> None:
    depths = [int(a) for a in sys.argv[1:]] or [100, 500, 2000]
    base = os.path.join(REPO, ".bench", "manifest_depth")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    spark = get_spark("probe_manifest_depth", cpus=8)
    results: dict[str, dict] = {}
    for mode in ("checkpointed", "no_checkpoint"):
        saved_interval = S.CHECKPOINT_INTERVAL
        if mode == "no_checkpoint":
            S.CHECKPOINT_INTERVAL = 10**9
        try:
            root = os.path.join(base, mode)
            t = S.SnapshotTable(spark, root)
            t.commit_append(
                spark.range(1000).selectExpr(
                    "id AS k", "id * 2 AS v"
                )
            )
            done = t.current_version()
            for depth in depths:
                while done < depth:
                    t.set_tblproperties({"probe.tick": str(done)})
                    done += 1
                results.setdefault(mode, {})[str(depth)] = _measure(
                    root, spark
                )
        finally:
            S.CHECKPOINT_INTERVAL = saved_interval
    print(json.dumps({"depths": depths, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
