"""Manifest-based snapshot table: time travel + snapshot isolation over
plain parquet files (the Delta/Iceberg transaction-log shape, built from
first principles).

A table version is a MANIFEST — a JSON file listing exactly the data
files visible in that snapshot. Commits never mutate data files:

* ``commit_append(df)``  — write new files, manifest N+1 = manifest N +
  new files.
* ``commit_rewrite(df)`` — write replacement files, manifest N+1 = the
  new files only (the compaction/OPTIMIZE commit: same rows, new layout).

Readers resolve a manifest first and read ONLY its files, so a reader of
version N is never affected by later appends, rewrites, or compactions —
snapshot isolation by construction — and old versions stay readable until
their files are garbage-collected (not implemented; a real system vacuums
by manifest reachability).

Scale notes: the manifest is metadata (1 line per file — ~100k entries at
100 TB with 1 GB files); commit cost is O(new files), never O(table).
The atomic step is the manifest publish: written to a temp name, then
``os.replace`` (atomic on POSIX) onto ``v{N}.json``; on S3 the equivalent
is a putIfAbsent/conditional-put on the manifest key, exactly as
Delta's log store does. Data files are immutable, so a failed commit
leaves only unreferenced files, never a corrupt table.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # ------------------------------------------------------------ internals
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifests", f"v{version}.json")

    def _load_manifest(self, version: int) -> list[str]:
        with open(self._manifest_path(version)) as f:
            return json.load(f)["files"]

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write ``df`` as immutable parquet files under a fresh commit
        dir; returns the file paths. Distributed write — rows never cross
        the driver; only the resulting path list (metadata) does."""
        d = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(d)
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    def _publish(self, files: list[str]) -> int:
        """Atomically publish the next manifest (temp write + rename)."""
        v = self.current_version() + 1
        tmp = self._manifest_path(v) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"version": v, "files": files}, f)
        os.replace(tmp, self._manifest_path(v))
        return v

    # ------------------------------------------------------------- surface
    def current_version(self) -> int:
        vs = [
            int(f[1:-5])
            for f in os.listdir(os.path.join(self.root, "_manifests"))
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(vs, default=0)

    def commit_append(self, df: DataFrame) -> int:
        base = [] if self.current_version() == 0 else self._load_manifest(
            self.current_version()
        )
        return self._publish(base + self._write_files(df))

    def commit_rewrite(self, df: DataFrame) -> int:
        """Replace the visible file set (compaction / OPTIMIZE): readers
        of older versions keep their files; the new version sees only the
        rewritten layout."""
        return self._publish(self._write_files(df))

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        files = self._load_manifest(v)
        return self.spark.read.parquet(*files)

    def file_count(self, version: int | None = None) -> int:
        v = self.current_version() if version is None else version
        return len(self._load_manifest(v))
