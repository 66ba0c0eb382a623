"""Manifest-based snapshot table: time travel + snapshot isolation over
plain parquet files (the Delta/Iceberg transaction-log shape, built from
first principles).

A table version is a MANIFEST — a JSON file listing exactly the data
files visible in that snapshot. Commits never mutate data files:

* ``commit_append(df)``  — write new files, manifest N+1 = manifest N +
  new files.
* ``commit_rewrite(df)`` — write replacement files, manifest N+1 = the
  new files only (the compaction/OPTIMIZE commit: same rows, new layout).

* ``commit_replace(remove, df)`` — surgical rewrite of only the files
  that contain affected rows (the DELETE/UPDATE primitive).

Readers resolve a manifest first and read ONLY its files, so a reader of
version N is never affected by later appends, rewrites, or compactions —
snapshot isolation by construction — and old versions stay readable until
``vacuum`` garbage-collects files unreachable from the retention window.

Scale notes: the manifest is metadata (1 line per file — ~100k entries at
100 TB with 1 GB files); commit cost is O(new files), never O(table).
The atomic step is the manifest publish: EXCLUSIVE create of
``v{N}.json`` on top of the version the writer read, so racing writers
get ``CommitConflict`` instead of a lost update (optimistic concurrency;
on S3 the equivalent is a conditional put on the manifest key, exactly
as Delta's log store does). Data files are immutable, so a failed commit
leaves only unreferenced files, never a corrupt table.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first — re-read the table
    state and retry (optimistic concurrency, the Delta log protocol)."""


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

    def _publish(self, files: list[str], base_version: int) -> int:
        """Atomically publish version ``base_version + 1`` with optimistic
        concurrency: commits target the version ON TOP OF THE SNAPSHOT THE
        WRITER READ, and the manifest is created exclusively (hard-link of
        a temp file onto the version name — fails if it exists), so of two
        racing writers exactly ONE wins and the other gets
        ``CommitConflict`` to re-read and retry — a lost update is
        impossible. On S3 the equivalent is a conditional put
        (If-None-Match) on the manifest key, Delta's log protocol."""
        v = base_version + 1
        tmp = self._manifest_path(v) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"version": v, "files": files}, f)
        try:
            os.link(tmp, self._manifest_path(v))
        except FileExistsError:
            raise CommitConflict(
                f"version {v} was committed concurrently"
            ) from None
        finally:
            os.unlink(tmp)
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
        cur = self.current_version()
        base = [] if cur == 0 else self._load_manifest(cur)
        return self._publish(base + self._write_files(df), cur)

    def commit_rewrite(self, df: DataFrame) -> int:
        """Replace the visible file set (compaction / OPTIMIZE): readers
        of older versions keep their files; the new version sees only the
        rewritten layout."""
        return self._publish(self._write_files(df), self.current_version())

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot. ``mergeSchema`` is on: commits may add
        columns (additive evolution, the S5 contract — older files
        surface the new columns as NULL), and same-schema reads pay only
        a footer union for it."""
        v = self.current_version() if version is None else version
        files = self._load_manifest(v)
        return self.spark.read.option("mergeSchema", "true").parquet(*files)

    def file_count(self, version: int | None = None) -> int:
        v = self.current_version() if version is None else version
        return len(self._load_manifest(v))

    def commit_replace(self, remove: list[str], df: DataFrame) -> int:
        """Surgical rewrite: drop ``remove`` from the visible set, add
        ``df``'s files. The DELETE/UPDATE primitive of every lakehouse
        format: untouched files keep their identity (no data movement, no
        cache/pruning-stats invalidation); only the files that actually
        contain affected rows are rewritten. Readers of older versions
        still see the removed files — they are unreferenced, not
        deleted."""
        gone = set(remove)
        cur = self.current_version()
        base = [] if cur == 0 else self._load_manifest(cur)
        keep = [f for f in base if f not in gone]
        return self._publish(keep + self._write_files(df), cur)

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Garbage-collect data files unreachable from the newest
        ``retain_versions`` manifests (and drop the older manifests) —
        the VACUUM that makes rewrites reclaim space. Pure metadata walk:
        reachability = union of the retained manifests' file lists;
        everything else under data/ unlinks. Returns the deleted paths.
        Versions older than the retention window stop being readable, by
        design — retention is the time-travel horizon."""
        cur = self.current_version()
        keep_versions = [
            v for v in range(max(1, cur - retain_versions + 1), cur + 1)
        ]
        reachable: set[str] = set()
        for v in keep_versions:
            reachable |= set(self._load_manifest(v))
        deleted: list[str] = []
        data_root = os.path.join(self.root, "data")
        for d in os.listdir(data_root) if os.path.isdir(data_root) else []:
            full = os.path.join(data_root, d)
            for f in os.listdir(full):
                p = os.path.join(full, f)
                if f.endswith(".parquet") and p not in reachable:
                    os.unlink(p)
                    deleted.append(p)
        for v in range(1, keep_versions[0]):
            try:
                os.unlink(self._manifest_path(v))
            except FileNotFoundError:
                pass
        return sorted(deleted)
