"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource`` API):
the snapshot table exposed as a REGISTERED SPARK FORMAT.

``spark.read.format("pysnapshot").option("root", ...).load()`` resolves a
manifest on the driver, zone-map-prunes the file list with the stats
banked in the transaction log, and hands Spark ONE InputPartition PER
SURVIVING DATA FILE — so the scan parallelizes exactly like a native file
source, executors open only their own file (pyarrow, yielding Arrow
RecordBatches — zero row-at-a-time Python), and skipped files never get a
task. This is the pure-Python equivalent of a DSv2 table-format connector
(what delta-rs / iceberg-python do natively).

Filter pushdown is PRUNING-ONLY by design: ``pushFilters`` records range
predicates on stats-tracked columns to shrink the partition list, but
RETURNS every filter as unsupported so Spark keeps the residual row-level
filter — zone maps prune files, not rows, and claiming full pushdown
would silently drop the residual semantics. That split (source prunes,
engine re-filters) is exactly how native formats integrate with Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)


class SnapshotFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class SnapshotManifestReader(DataSourceReader):
    def __init__(self, options, columns: list[str] | None = None) -> None:
        import json
        import os

        self.columns = columns
        self.root = options["root"]
        mdir = os.path.join(self.root, "_manifests")
        versions = [
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        v = int(options.get("version", max(versions)))
        with open(os.path.join(mdir, f"v{v}.json")) as f:
            m = json.load(f)
        self.files: list[str] = m["files"]
        self.stats: dict = m.get("stats", {})
        self.bounds: dict[str, list] = {}

    # ------------------------------------------------- filter pushdown
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest range predicates for FILE pruning, then return every
        filter unsupported: the engine keeps the row-level residual (zone
        maps prune files, not rows)."""
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if isinstance(f, EqualTo):
                self._narrow(col, f.value, f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._narrow(col, f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._narrow(col, None, f.value)
        return iter(filters)

    def _narrow(self, col: str | None, lo, hi) -> None:
        if col is None:
            return
        cur = self.bounds.setdefault(col, [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    # ------------------------------------------------------ partitions
    def partitions(self) -> list[InputPartition]:
        keep = []
        for p in self.files:
            st = self.stats.get(p, {})
            skip = False
            for col, (lo, hi) in self.bounds.items():
                mm = st.get(col)
                if mm is None:
                    continue  # absent stats: conservative keep
                if (hi is not None and mm[0] > hi) or (
                    lo is not None and mm[1] < lo
                ):
                    skip = True
                    break
            if not skip:
                keep.append(SnapshotFilePartition(p))
        return keep

    # ------------------------------------------------------------ read
    def read(self, partition: SnapshotFilePartition):
        """Arrow-batch read of one data file. Columns are selected AND
        ordered by the declared read schema, so a caller-supplied schema
        with reordered fields still maps by name, never by file
        position."""
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(partition.path).iter_batches(
            columns=self.columns
        )


class SnapshotDataSource(DataSource):
    """format("pysnapshot") — options: root (required), version
    (default: head)."""

    @classmethod
    def name(cls) -> str:
        return "pysnapshot"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        import json
        import os

        mdir = os.path.join(self.options["root"], "_manifests")
        v = max(
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        )
        with open(os.path.join(mdir, f"v{v}.json")) as f:
            first = json.load(f)["files"][0]
        return from_arrow_schema(pq.ParquetFile(first).schema_arrow)

    def reader(self, schema) -> SnapshotManifestReader:
        return SnapshotManifestReader(
            self.options, [f.name for f in schema.fields]
        )


def register_snapshot_source(spark) -> None:
    """Idempotent registration of the pysnapshot format."""
    spark.dataSource.register(SnapshotDataSource)
