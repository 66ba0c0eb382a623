"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource`` API):
the snapshot table exposed as a REGISTERED SPARK FORMAT.

``spark.read.format("pysnapshot").option("root", ...).load()`` resolves a
manifest on the driver, zone-map-prunes the file list with the stats
banked in the transaction log, and hands Spark ONE InputPartition PER
SURVIVING DATA FILE — so the scan parallelizes exactly like a native file
source, executors open only their own file (pyarrow, yielding Arrow
RecordBatches — zero row-at-a-time Python), and skipped files never get a
task. This is the pure-Python equivalent of a DSv2 table-format connector
(what delta-rs / iceberg-python do natively). Manifest resolution and the
zone-map overlap test are the SAME code ``SnapshotTable`` reads with
(`snapshots.latest_version/load_manifest/zone_prune`) — the connector
cannot silently diverge from the table's own pruning.

Filter pushdown is PRUNING-ONLY by design: ``pushFilters`` records range
predicates on stats-tracked columns to shrink the partition list, but
RETURNS every filter as unsupported so Spark keeps the residual row-level
filter — zone maps prune files, not rows, and claiming full pushdown
would silently drop the residual semantics. That split (source prunes,
engine re-filters) is exactly how native formats integrate with Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from .snapshots import (
    CommitConflict,
    _footer_stats_one,
    latest_version,
    load_manifest,
    publish_version,
    zone_prune,
)


class SnapshotFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _schema_maps(schema) -> tuple[list[str], dict]:
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow = to_arrow_schema(schema)
    return (
        [f.name for f in schema.fields],
        {f.name: f.type for f in arrow},
    )


def _resolve(options) -> dict:
    """Manifest for the requested (or head) version — shared log-access
    code with SnapshotTable."""
    root = options["root"]
    v = int(options.get("version", latest_version(root)))
    return load_manifest(root, v)


class SnapshotManifestReader(DataSourceReader):
    def __init__(
        self, options, columns: list[str] | None = None, types=None
    ) -> None:
        self.columns = columns
        self.types = types or {}  # name -> pyarrow type, for typed NULLs
        m = _resolve(options)
        self.files: list[str] = m["files"]
        self.stats: dict = m["stats"]
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
        bounds = {c: (lo, hi) for c, (lo, hi) in self.bounds.items()}
        return [
            SnapshotFilePartition(p)
            for p in zone_prune(self.files, self.stats, bounds)
        ]

    # ------------------------------------------------------------ read
    def read(self, partition: SnapshotFilePartition):
        """Arrow-batch read of one data file, aligned to the declared
        read schema: columns map BY NAME (a caller-supplied schema with
        reordered fields reads correctly), unread columns are pruned at
        the parquet layer, and a column this file predates (additive
        evolution) surfaces as typed NULLs — the same contract as
        ``SnapshotTable.read``'s mergeSchema."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        want = self.columns or pf.schema_arrow.names
        present = [c for c in want if c in have]
        for batch in pf.iter_batches(columns=present):
            if len(present) == len(want):
                yield batch
                continue
            cols, names = [], []
            by_name = {n: batch.column(i)
                       for i, n in enumerate(batch.schema.names)}
            for c in want:
                if c in by_name:
                    cols.append(by_name[c])
                else:
                    cols.append(
                        pa.nulls(batch.num_rows, type=self.types.get(c))
                    )
                names.append(c)
            yield pa.RecordBatch.from_arrays(cols, names=names)


class SnapshotStreamReader(DataSourceStreamReader):
    """The snapshot log as a STRUCTURED STREAMING SOURCE: offsets are
    version numbers, one micro-batch covers the versions committed since
    the last processed offset, and the rows of a batch are the files
    ADDED in that version range — append-commit consumption, the Delta
    streaming-source shape, driven by the engine's own offset/commit
    bookkeeping (the checkpoint stores {"version": N}; exactly-once
    across restarts comes from Structured Streaming itself, not from any
    consumer-side cursor code). Each added file is one InputPartition,
    so a batch scans at file parallelism on the executors and a poll
    that finds nothing new schedules zero tasks.

    Append-only by design (like Delta's source without
    skipChangeCommits): files REMOVED in the range (rewrites/deletes)
    are ignored; row-level delete feeds are the batch
    ``read_changes``/``changes_since`` API."""

    def __init__(self, options, columns, types) -> None:
        self.options = options
        self.root = options["root"]
        self.columns = columns
        self.types = types

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": latest_version(self.root)}

    def partitions(self, start: dict, end: dict):
        a, b = start["version"], end["version"]
        base = (
            set() if a == 0 else set(load_manifest(self.root, a)["files"])
        )
        head = load_manifest(self.root, b)["files"]
        return [
            SnapshotFilePartition(p)
            for p in sorted(f for f in head if f not in base)
        ]

    def read(self, partition: SnapshotFilePartition):
        rdr = SnapshotManifestReader.__new__(SnapshotManifestReader)
        rdr.columns, rdr.types = self.columns, self.types
        yield from SnapshotManifestReader.read(rdr, partition)

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint is the cursor; nothing to clean


@dataclass
class SnapshotCommitMessage(WriterCommitMessage):
    path: str = ""
    stats: dict = field(default_factory=dict)


class SnapshotDataWriter(DataSourceWriter):
    """``df.write.format("pysnapshot")`` — a DISTRIBUTED ATOMIC COMMIT
    through the Python DataSource writer protocol: each executor task
    streams its rows into one immutable parquet file (Arrow batches, no
    per-row Python cost beyond the engine's hand-off) and reports back
    only (path, footer stats) as its commit message; the driver's
    ``commit`` publishes ONE manifest over all task files — so a write is
    all-or-nothing (a failed job's ``abort`` unlinks the orphans, and an
    unpublished file is invisible anyway), stats for zone-map pruning are
    collected executor-side FOR FREE at write time (Delta's exact
    design), and ``mode("append")``/``mode("overwrite")`` map to
    commit_append / commit_rewrite semantics with the same optimistic-
    concurrency manifest protocol as every other log writer."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        import os
        import uuid

        self.root = options["root"]
        self.overwrite = overwrite
        self.stats_cols = [
            c for c in options.get("statscols", "").split(",") if c
        ]
        self.schema = schema  # StructType: picklable, ships to tasks
        self.commit_dir = os.path.join(
            self.root, "data", uuid.uuid4().hex
        )
        # a table created purely through the connector needs its log dir
        os.makedirs(os.path.join(self.root, "_manifests"), exist_ok=True)

    BATCH_ROWS = 65536

    def write(self, iterator) -> SnapshotCommitMessage | None:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        names = [f.name for f in self.schema.fields]
        os.makedirs(self.commit_dir, exist_ok=True)
        path = os.path.join(
            self.commit_dir, f"part-{uuid.uuid4().hex}.parquet"
        )
        writer = None
        buf: list = []

        def flush():
            nonlocal writer
            if not buf:
                return
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array([r[i] for r in buf], type=f.type)
                    for i, f in enumerate(arrow_schema)
                ],
                names=names,
            )
            if writer is None:
                writer = pq.ParquetWriter(path, arrow_schema)
            writer.write_batch(batch)
            buf.clear()

        for row in iterator:
            buf.append(tuple(row))
            if len(buf) >= self.BATCH_ROWS:
                flush()
        flush()
        if writer is None:
            return None  # empty task: no file, no commit message
        writer.close()
        stats = (
            _footer_stats_one(path, self.stats_cols)
            if self.stats_cols
            else {}
        )
        return SnapshotCommitMessage(path=path, stats=stats)

    def commit(self, messages) -> None:
        files = sorted(m.path for m in messages if m)
        stats = {m.path: m.stats for m in messages if m}
        for _ in range(5):  # optimistic-concurrency retry loop
            base_v = latest_version(self.root)
            if self.overwrite or base_v == 0:
                base_files, base_stats = [], {}
            else:
                m = load_manifest(self.root, base_v)
                base_files, base_stats = m["files"], m["stats"]
            try:
                publish_version(
                    self.root,
                    base_files + files,
                    base_v,
                    {**base_stats, **stats},
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            "5 consecutive manifest conflicts — giving up"
        )

    def abort(self, messages) -> None:
        import os

        for m in messages or []:
            if m:
                try:
                    os.unlink(m.path)
                except FileNotFoundError:
                    pass


class SnapshotStreamWriter(SnapshotDataWriter, DataSourceStreamWriter):
    """``df.writeStream.format("pysnapshot")`` — one ATOMIC snapshot
    version per micro-batch, with epoch IDEMPOTENCE: the committed
    batchId is recorded in the manifest (``txn.batch_id``), so a retried
    epoch (crash between the engine's commit call and its checkpoint
    advance) detects it already published and unlinks its duplicate
    shards instead of double-appending — exactly Delta's txn/appId
    protocol for exactly-once streaming sinks. Executor-side shard
    writes and write-time stats collection are inherited from the batch
    writer."""

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import os

        files = sorted(m.path for m in messages if m)
        stats = {m.path: m.stats for m in messages if m}
        for _ in range(5):
            base_v = latest_version(self.root)
            base_files: list = []
            base_stats: dict = {}
            if base_v > 0:
                m = load_manifest(self.root, base_v)
                base_files, base_stats = m["files"], m["stats"]
                if m.get("txn", {}).get("batch_id") == batchId:
                    # replayed epoch: already durable — drop duplicates
                    for p in files:
                        try:
                            os.unlink(p)
                        except FileNotFoundError:
                            pass
                    return
            try:
                publish_version(
                    self.root,
                    base_files + files,
                    base_v,
                    {**base_stats, **stats},
                    extra={"txn": {"batch_id": batchId}},
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            "5 consecutive manifest conflicts — giving up"
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        SnapshotDataWriter.abort(self, messages)


class SnapshotDataSource(DataSource):
    """format("pysnapshot") — options: root (required), version
    (default: head)."""

    @classmethod
    def name(cls) -> str:
        return "pysnapshot"

    def schema(self):
        """Union schema across the requested version's files (additive
        evolution means later files carry new columns that older files
        surface as NULL — exactly what ``SnapshotTable.read``'s
        mergeSchema exposes). Footer-only: no data reads."""
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _resolve(self.options)["files"]
        if not files:
            raise ValueError(
                "pysnapshot: the requested version has no data files; "
                "supply an explicit .schema(...)"
            )
        import pyarrow as pa

        unified = pq.ParquetFile(files[0]).schema_arrow
        for f in files[1:]:
            unified = pa.unify_schemas(
                [unified, pq.ParquetFile(f).schema_arrow]
            )
        # every field nullable: a column added by evolution is NULL in
        # pre-evolution files even if its own writer marked it required
        # (e.g. a literal column) — same posture as Spark's mergeSchema
        unified = pa.schema(
            [f.with_nullable(True) for f in unified]
        )
        return from_arrow_schema(unified)

    def reader(self, schema) -> SnapshotManifestReader:
        names, types = _schema_maps(schema)
        return SnapshotManifestReader(self.options, names, types)

    def streamReader(self, schema) -> SnapshotStreamReader:
        names, types = _schema_maps(schema)
        return SnapshotStreamReader(self.options, names, types)

    def writer(self, schema, overwrite: bool) -> SnapshotDataWriter:
        return SnapshotDataWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> SnapshotStreamWriter:
        return SnapshotStreamWriter(self.options, schema, False)


def register_snapshot_source(spark) -> None:
    """Register the pysnapshot format (idempotent). Also enables
    ``spark.sql.python.filterPushdown.enabled``: the reader implements
    ``pushFilters``, and Spark REFUSES such readers outright when the
    conf (default false) is off — without this, every read through the
    connector fails on a vanilla session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
