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

from pyspark.sql import DataFrame, SparkSession, functions as F


def _json_scalar_value(v):
    """Parquet-footer stat -> JSON-storable, order-preserving scalar:
    bytes decode (BYTE_ARRAY stats), datetimes/dates go ISO (ISO strings
    compare lexicographically in timeline order)."""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _footer_stats_one(path: str, cols: list[str]) -> dict[str, list]:
    """Footer min/max for one file (module-level so the distributed
    stats path can ship it to executors)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    # Key physical columns by their DOTTED PATH, not the leaf name: a
    # struct field ``s.b`` has leaf name ``b`` and would otherwise shadow
    # a top-level column ``b``, banking min/max from the WRONG physical
    # column — silent mispruning that loses rows. Requested stats_cols
    # are top-level names, so they only ever match path == name.
    idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    st: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        mins: list = []
        maxs: list = []
        ok = True
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[c]).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            mins.append(_json_scalar_value(s.min))
            maxs.append(_json_scalar_value(s.max))
        if ok and mins:
            st[c] = [min(mins), max(maxs)]
    return st


class CommitConflict(Exception):
    """Another writer published this version first — re-read the table
    state and retry (optimistic concurrency, the Delta log protocol)."""


class LogTruncated(Exception):
    """The requested version's manifest has been vacuumed past — the
    reader's cursor predates the retention window. A change-feed consumer
    seeing this must RE-BOOTSTRAP (full read at head + fresh cursor);
    there is no way to reconstruct the missed deltas."""


# ---------------------------------------------------------- log access --
# Module-level manifest access so other readers of the log (the pysnapshot
# DataSource connector in sources/pyds.py) share ONE implementation of
# manifest resolution and zone-map overlap — a manifest format change or a
# pruning fix lands here and everywhere at once.

def latest_version(root: str) -> int:
    mdir = os.path.join(root, "_manifests")
    vs = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(vs, default=0)


def load_manifest(root: str, version: int) -> dict:
    """The manifest dict {version, files, stats}; raises LogTruncated if
    the version has been vacuumed away."""
    path = os.path.join(root, "_manifests", f"v{version}.json")
    try:
        with open(path) as f:
            m = json.load(f)
    except FileNotFoundError:
        raise LogTruncated(
            f"version {version} predates the retention window "
            f"(manifest {path} vacuumed) — re-bootstrap from head"
        ) from None
    m.setdefault("stats", {})
    return m


def publish_version(
    root: str,
    files: list[str],
    base_version: int,
    stats: dict[str, dict[str, list]] | None = None,
    extra: dict | None = None,
) -> int:
    """Atomically publish version ``base_version + 1`` with optimistic
    concurrency: commits target the version ON TOP OF THE SNAPSHOT THE
    WRITER READ, and the manifest is created exclusively (hard-link of a
    temp file onto the version name — fails if it exists), so of two
    racing writers exactly ONE wins and the other gets ``CommitConflict``
    to re-read and retry — a lost update is impossible. On S3 the
    equivalent is a conditional put (If-None-Match) on the manifest key,
    Delta's log protocol. Module-level so every log writer —
    ``SnapshotTable`` and the pysnapshot DataSourceWriter — shares one
    commit protocol."""
    v = base_version + 1
    path = os.path.join(root, "_manifests", f"v{v}.json")
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": v,
                "files": files,
                "stats": stats or {},
                **(extra or {}),
            },
            f,
        )
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise CommitConflict(
            f"version {v} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)
    return v


def zone_prune(
    files: list[str],
    stats: dict[str, dict[str, list]],
    bounds: dict[str, tuple],
) -> list[str]:
    """Files whose banked [min, max] ranges could intersect EVERY bound
    in ``bounds`` ({col: (lo, hi)}, None = unbounded side). Absent stats
    are a conservative keep — pruning can waste a read, never lose a
    row."""
    keep = []
    for f in files:
        st = stats.get(f, {})
        skip = False
        for col, (lo, hi) in bounds.items():
            mm = st.get(col)
            if mm is None:
                continue
            try:
                if (hi is not None and mm[0] > hi) or (
                    lo is not None and mm[1] < lo
                ):
                    skip = True
                    break
            except TypeError:
                # bound and banked stat live in incomparable domains
                # (e.g. a datetime literal vs an ISO-string stat a caller
                # failed to normalize): conservative keep — pruning may
                # waste a read, never lose a row.
                continue
        if not skip:
            keep.append(f)
    return keep


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # ------------------------------------------------------------ internals
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifests", f"v{version}.json")

    def _load_manifest(self, version: int) -> list[str]:
        return load_manifest(self.root, version)["files"]

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

    #: Commits with at least this many new files collect their footer
    #: stats executor-side (one task per chunk of paths) instead of in a
    #: driver loop — the fleet-scale path for bulk backfills. Small
    #: commits skip the job-scheduling overhead.
    DISTRIBUTED_STATS_THRESHOLD = 64

    def _footer_stats(
        self, files: list[str], cols: list[str]
    ) -> dict[str, dict[str, list]]:
        """Per-file min/max for ``cols`` read from the parquet FOOTERS of
        freshly written files — no data scan, O(new files) footer reads
        per commit (in production the writer's task results carry these
        for free, as in Delta). Driver-side for typical commit sizes;
        past ``DISTRIBUTED_STATS_THRESHOLD`` files the footer reads fan
        out as a Spark job over the path list, so a 100k-file backfill
        collects stats at cluster parallelism and only the (path, mins,
        maxs) tuples return to the driver. A column missing footer stats
        in any row group is omitted for that file — absent stats mean
        "must read", never wrong pruning. String stats stay safe under
        parquet's stat truncation because writers round a truncated max
        UP (and drop min/max entirely when they can't), so a banked
        range is always a superset of the file's true range."""
        if len(files) >= self.DISTRIBUTED_STATS_THRESHOLD:
            sc = self.spark.sparkContext
            n_slices = max(1, min(len(files) // 16, 256))
            parts = sc.parallelize(files, n_slices).map(
                lambda p: (p, _footer_stats_one(p, cols))
            )
            return dict(parts.collect())
        return {p: _footer_stats_one(p, cols) for p in files}

    def _load_stats(self, version: int) -> dict[str, dict[str, list]]:
        return load_manifest(self.root, version)["stats"]

    def _publish(
        self,
        files: list[str],
        base_version: int,
        stats: dict[str, dict[str, list]] | None = None,
    ) -> int:
        # carry the txn map (streaming writers' appId -> batchId records)
        # forward through EVERY commit — epoch-replay detection must
        # survive interleaved table commits (the Delta txn invariant)
        txn = (
            load_manifest(self.root, base_version).get("txn", {})
            if base_version > 0
            else {}
        )
        return publish_version(
            self.root,
            files,
            base_version,
            stats,
            extra={"txn": txn} if txn else None,
        )

    # ------------------------------------------------------------- surface
    def current_version(self) -> int:
        return latest_version(self.root)

    def _merged_stats(
        self,
        base_version: int,
        new_files: list[str],
        stats_cols: list[str] | None,
    ) -> dict[str, dict[str, list]]:
        """Stats for a commit's manifest: carried-forward files KEEP their
        banked stats (immutable files, immutable stats — Delta's add-file
        actions behave the same); new files get footer stats for
        ``stats_cols`` (plus any column the table already tracks, so the
        stat schema stays uniform across commits)."""
        prior = (
            self._load_stats(base_version) if base_version > 0 else {}
        )
        cols = set(stats_cols or [])
        for st in prior.values():
            cols |= set(st)
        merged = dict(prior)
        if cols:
            merged.update(self._footer_stats(new_files, sorted(cols)))
        else:
            merged.update({f: {} for f in new_files})
        return merged

    def commit_append(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> int:
        cur = self.current_version()
        base = [] if cur == 0 else self._load_manifest(cur)
        new = self._write_files(df)
        return self._publish(
            base + new, cur, self._merged_stats(cur, new, stats_cols)
        )

    def commit_rewrite(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> int:
        """Replace the visible file set (compaction / OPTIMIZE): readers
        of older versions keep their files; the new version sees only the
        rewritten layout."""
        cur = self.current_version()
        new = self._write_files(df)
        stats = self._merged_stats(cur, new, stats_cols)
        return self._publish(
            new, cur, {f: stats.get(f, {}) for f in new}
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot. ``mergeSchema`` is on: commits may add
        columns (additive evolution, the S5 contract — older files
        surface the new columns as NULL), and same-schema reads pay only
        a footer union for it."""
        v = self.current_version() if version is None else version
        files = self._load_manifest(v)
        if not files:
            # an EMPTY snapshot (e.g. a streaming complete-mode epoch
            # whose recomputed result was empty): zero rows, schema from
            # the newest prior version that had files — the table's last
            # known shape, exactly what a reader of "the current result"
            # expects.
            for pv in range(v - 1, 0, -1):
                try:
                    prior = self._load_manifest(pv)
                except LogTruncated:
                    break
                if prior:
                    return (
                        self.spark.read.option("mergeSchema", "true")
                        .parquet(*prior)
                        .limit(0)
                    )
            raise ValueError(
                f"snapshot version {v} is empty and no prior version "
                "carries a schema"
            )
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
        new = self._write_files(df)
        stats = self._merged_stats(cur, new, None)
        visible = keep + new
        return self._publish(
            visible, cur, {f: stats.get(f, {}) for f in visible}
        )

    def pruned_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[list[str], int]:
        """Manifest-only zone-map pruning (Iceberg/Delta data skipping):
        split a snapshot's file list into (must-read, total) using the
        min/max stats BANKED IN THE TRANSACTION LOG at commit time — zero
        file opens, zero footer reads, zero Spark jobs at read time. At
        100 TB the planner decides which of ~100k files to scan from a
        few MB of log metadata. A file without stats for ``col`` is
        conservatively kept (absent stats can waste a read, never lose a
        row). Bounds compare in the stat's JSON domain — numerics
        natively, dates/timestamps as ISO strings."""
        v = self.current_version() if version is None else version
        m = load_manifest(self.root, v)
        keep = zone_prune(m["files"], m["stats"], {col: (lo, hi)})
        return keep, len(m["files"])

    def read_where(
        self, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Snapshot read with manifest-stats file pruning; the residual
        per-row filter still applies downstream (zone maps prune files,
        not rows)."""
        files, _ = self.pruned_files(col, lo, hi, version)
        if not files:
            return self.read(version).limit(0)
        return self.spark.read.option("mergeSchema", "true").parquet(
            *files
        )

    def read_changes(
        self, from_version: int, to_version: int
    ) -> DataFrame:
        """Row-level change feed between two snapshots (the Delta CDF
        capability), derived purely from the manifest diff — no per-commit
        change files are ever written. Because data files are immutable, a
        file present in both manifests cannot have changed and is NEVER
        read; only the churned files (added or dropped between the two
        versions) scan, so the cost is O(churn), not O(table) — at 100 TB
        a day's ingest reads a day's files.

        Semantics (multiset, so duplicates are respected):

        * ``insert`` rows = rows of added files  EXCEPT ALL  rows of
          removed files — a compaction rewrite carries every row forward,
          so the two sides cancel and a pure-layout commit reports zero
          changes;
        * ``delete`` rows = rows of removed files EXCEPT ALL rows of
          added files;
        * an UPDATE surfaces as its delete/insert pair (the pre-image and
          post-image), exactly as Delta CDF reports rewrites without a
          change log.

        Columns are aligned to the ``to_version`` schema (additive
        evolution: pre-evolution rows surface new columns as NULL).
        """
        a = (
            set() if from_version == 0
            else set(self._load_manifest(from_version))
        )
        b = set(self._load_manifest(to_version))
        added, removed = sorted(b - a), sorted(a - b)
        # Align both sides to the union schema of the CHURNED files only
        # (one mergeSchema footer union over O(churn) files) — deriving it
        # from the full to-version snapshot would cost O(table) footer
        # reads per poll. Rows come exclusively from churned files, so
        # their union schema is complete for every returned row; a column
        # that exists only in untouched files cannot appear in a change.
        churned = added + removed
        if not churned:
            template = sorted(b) or sorted(a)
            if not template:  # both versions empty: no rows, no columns
                return self.spark.createDataFrame(
                    [], "_change_type string"
                )
            empty = self.spark.read.parquet(template[0]).limit(0)
            return empty.withColumn("_change_type", F.lit("insert"))
        schema = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*churned)
            .schema
        )

        def side(files: list[str]) -> DataFrame:
            if not files:
                return self.spark.createDataFrame([], schema)
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *files
            )
            return df.select(
                *[
                    (
                        df[f.name] if f.name in df.columns
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in schema.fields
                ]
            )

        new_rows, old_rows = side(added), side(removed)
        return (
            new_rows.exceptAll(old_rows)
            .withColumn("_change_type", F.lit("insert"))
            .unionAll(
                old_rows.exceptAll(new_rows)
                .withColumn("_change_type", F.lit("delete"))
            )
        )

    def optimize_small_files(
        self,
        small_threshold: int,
        target_bytes: int,
        z_cols: tuple[str, str] | None = None,
    ) -> dict[str, int]:
        """Transactional OPTIMIZE (Delta's compaction-as-a-commit): plan
        from METADATA only (file sizes via one listing — at fleet scale
        the sizes ride in the manifest), pick the files under
        ``small_threshold``, bin-pack them into ``target_bytes`` outputs,
        and publish ONE ``commit_replace`` that swaps exactly those files
        — large files keep their byte identity and historical versions
        keep the old layout. Work is O(small files); concurrent readers
        are never disturbed (snapshot isolation), and a racing writer
        conflicts on the manifest, not on data.

        With ``z_cols=(a, b)`` the rewrite also CLUSTERS the compacted
        rows along the Morton curve of the two columns (Delta's
        ``OPTIMIZE ... ZORDER BY``): each output file owns a contiguous
        curve segment — a bounded region in BOTH dimensions — so footer
        and manifest stats prune on either column afterwards. That path
        shuffles the small-file rows once (a layout job, priced per
        OPTIMIZE run, not per query); the default path is a shuffle-free
        coalesce."""
        import math

        cur = self.current_version()
        files = self._load_manifest(cur)
        sizes = {f: os.path.getsize(f) for f in files}
        small = [f for f in files if sizes[f] < small_threshold]
        if len(small) <= 1:
            return {
                "n_files_before": len(files),
                "n_small": len(small),
                "n_files_after": len(files),
                "version": cur,
            }
        n_bins = max(1, math.ceil(sum(sizes[f] for f in small) / target_bytes))
        packed = self.spark.read.option("mergeSchema", "true").parquet(
            *small
        )
        if z_cols is not None:
            from ..operators.zorder import z_order_key

            packed = (
                z_order_key(packed, *z_cols)
                .repartitionByRange(n_bins, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            packed = packed.coalesce(n_bins)
        v = self.commit_replace(small, packed)
        return {
            "n_files_before": len(files),
            "n_small": len(small),
            "n_files_after": self.file_count(v),
            "version": v,
        }

    def changes_since(
        self, cursor: int
    ) -> tuple[DataFrame | None, int]:
        """Incremental consumption of the snapshot log (the Delta
        streaming-source shape): return the row-level changes committed
        AFTER ``cursor`` plus the new cursor to persist. Each committed
        version is delivered exactly once across successive calls —
        the cursor is the version number, so the consumer's bookkeeping
        is one integer, and a crash between read and cursor-persist
        replays (at-least-once) without ever skipping. ``cursor=0``
        means "from the beginning" (everything visible at head is an
        insert). Returns (None, cursor) when there is nothing new —
        callers skip scheduling work entirely."""
        head = self.current_version()
        if head == cursor:
            return None, cursor
        return self.read_changes(cursor, head), head

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
