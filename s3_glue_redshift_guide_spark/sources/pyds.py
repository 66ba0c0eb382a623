"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource`` API):
the snapshot table exposed as a REGISTERED SPARK FORMAT — batch read,
streaming read, batch write, and streaming sink.

``spark.read.format("pysnapshot").option("root", ...).load()`` resolves a
manifest on the driver, zone-map-prunes the file list with the stats
banked in the transaction log, and hands Spark ONE InputPartition PER
SURVIVING DATA FILE — so the scan parallelizes exactly like a native file
source, executors open only their own file (pyarrow, yielding Arrow
RecordBatches — zero row-at-a-time Python), and skipped files never get a
task. This is the pure-Python equivalent of a DSv2 table-format connector
(what delta-rs / iceberg-python do natively). Manifest resolution, the
zone-map overlap test, and the atomic publish are the SAME code
``SnapshotTable`` uses (`snapshots.latest_version/load_manifest/
zone_prune/publish_version`) — the connector cannot silently diverge from
the table's own semantics.

Filter pushdown is PRUNING-ONLY by design: ``pushFilters`` records range
predicates on stats-tracked columns to shrink the partition list, but
RETURNS every filter as unsupported so Spark keeps the residual row-level
filter — zone maps prune files, not rows, and claiming full pushdown
would silently drop the residual semantics. That split (source prunes,
engine re-filters) is exactly how native formats integrate with Catalyst.

Write paths use the ARROW writer protocol (``DataSourceArrowWriter``):
executors receive the engine's RecordBatches directly and stream them
into one immutable parquet shard per task — no per-row Python anywhere.
Commit transactions carry a ``txn`` map (appId -> last committed batchId)
forward through EVERY commit, so streaming-epoch idempotence survives
interleaved batch commits and distinguishes writers by application, the
Delta txn protocol.
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)

from .snapshots import (
    NULLS_SUFFIX,
    CommitConflict,
    _footer_stats_one,
    _json_scalar_value,
    latest_version,
    load_manifest,
    publish_version,
    zone_prune,
)


class SnapshotFilePartition(InputPartition):
    def __init__(self, path: str, dv: tuple[str, ...] = ()) -> None:
        self.path = path
        self.dv = dv  # deletion-vector sidecar dirs masking this file


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


def _prefix_upper(p: str) -> str | None:
    """The smallest string GREATER than every string with prefix ``p``
    (exclusive upper bound for StringStartsWith pruning): increment the
    rightmost incrementable code point and truncate. None when every
    char is U+10FFFF (no finite bound — lower bound still prunes)."""
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            return p[:i] + chr(c + 1)
    return None


def _alias_map(schema_map) -> dict[str, list[str]]:
    """current name -> historical physical names, from the manifest's
    field-id map (empty for tables that never renamed)."""
    if not schema_map:
        return {}
    return {
        e["name"]: list(e.get("prior", []))
        for e in schema_map
        if e.get("prior")
    }


def _dv_positions(path: str, dv_dirs: tuple[str, ...]):
    """The set of tombstoned row positions for one data file, read from
    its deletion-vector sidecars (each a parquet of (__dv_file,
    __dv_pos) pairs). O(deleted rows) — the sidecars are the point-
    delete ledger, not data."""
    import os

    import pyarrow.dataset as ds
    import pyarrow.compute as pc

    pos: set[int] = set()
    for d in dv_dirs:
        files = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]
        if not files:
            continue
        t = ds.dataset(files).to_table(
            columns=["__dv_pos"], filter=pc.field("__dv_file") == path
        )
        pos.update(t.column("__dv_pos").to_pylist())
    return pos


def _row_group_selection(md, bounds: dict, phys_of: dict) -> list[int]:
    """Row groups whose footer min/max could intersect every pushed
    bound — the SECOND skipping tier below manifest zone maps (a 1 GB
    file holds ~100 row groups; a selective predicate reads a handful).
    Same conservative semantics as ``zone_prune``: absent stats or
    incomparable domains keep the group."""
    idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    keep = []
    for rg in range(md.num_row_groups):
        skip = False
        for col, (lo, hi) in bounds.items():
            phys = phys_of.get(col)
            if phys is None or phys not in idx:
                continue
            s = md.row_group(rg).column(idx[phys]).statistics
            if s is None or not s.has_min_max:
                continue
            mn = _json_scalar_value(s.min)
            mx = _json_scalar_value(s.max)
            try:
                if (hi is not None and mn > hi) or (
                    lo is not None and mx < lo
                ):
                    skip = True
                    break
            except TypeError:
                continue
        if not skip:
            keep.append(rg)
    return keep


def _read_file(
    path: str,
    columns: list[str] | None,
    types: dict,
    aliases: dict | None = None,
    dv_dirs: tuple[str, ...] = (),
    only_positions: set | None = None,
    extra_consts: dict | None = None,
    bounds: dict | None = None,
):
    """Arrow-batch read of one data file, aligned to the declared read
    schema: columns map BY NAME (a caller-supplied schema with reordered
    fields reads correctly), unread columns are pruned at the parquet
    layer, and a column this file predates (additive evolution) surfaces
    as typed NULLs — the same contract as ``SnapshotTable.read``'s
    mergeSchema. ``aliases`` maps each current name to its historical
    physical names (field-id renames), so a pre-rename file reads back
    under the new name; ``dv_dirs`` masks tombstoned row positions
    (deletion vectors) by running offset; ``only_positions`` inverts the
    selection to emit EXACTLY those row positions (the change-feed
    delete leg); ``extra_consts`` appends constant metadata columns
    ({name: (value, pyarrow_type)} — the CDF ``_change_type`` /
    ``_commit_version``). Shared by the batch and streaming readers."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    have = set(pf.schema_arrow.names)
    extra_consts = extra_consts or {}
    want = [
        c
        for c in (columns or list(pf.schema_arrow.names))
        if c not in extra_consts
    ]
    out_names = want + list(extra_consts)
    aliases = aliases or {}

    def physical(c: str) -> str | None:
        for n in (c, *aliases.get(c, [])):
            if n in have:
                return n
        return None

    phys_of = {c: physical(c) for c in want}
    present = sorted({p for p in phys_of.values() if p is not None})
    deleted = _dv_positions(path, dv_dirs) if dv_dirs else None

    def align(col, name):
        """Cast a file's physical column to the DECLARED read type: a
        file written before a type widened (int32 commits, then int64)
        must surface in the widened type, same as the declared schema
        (which unifies permissively) promises."""
        t = types.get(name)
        return col.cast(t) if t is not None and col.type != t else col

    md = pf.metadata
    # row positions are FILE-absolute (deletion vectors / CDF legs key
    # on them), so reads iterate per ROW GROUP with each group's true
    # starting offset — pruned groups never desync the position math
    group_start = [0]
    for rg in range(md.num_row_groups):
        group_start.append(group_start[-1] + md.row_group(rg).num_rows)
    selected = (
        _row_group_selection(md, bounds, phys_of)
        if bounds
        else range(md.num_row_groups)
    )
    for rg in selected:
        offset = group_start[rg]
        for batch in pf.iter_batches(row_groups=[rg], columns=present):
            n = batch.num_rows
            if only_positions is not None:
                keep = np.array(
                    [offset + i in only_positions for i in range(n)],
                    dtype=bool,
                )
                offset += n
                batch = batch.filter(pa.array(keep))
                if batch.num_rows == 0:
                    continue
            elif deleted:
                keep = np.array(
                    [offset + i not in deleted for i in range(n)],
                    dtype=bool,
                )
                offset += n
                if not keep.all():
                    batch = batch.filter(pa.array(keep))
                    if batch.num_rows == 0:
                        continue
            else:
                offset += n
            by_name = {
                nm: batch.column(i)
                for i, nm in enumerate(batch.schema.names)
            }
            arrays = [
                align(by_name[phys_of[c]], c)
                if phys_of[c] is not None
                else pa.nulls(batch.num_rows, type=types.get(c))
                for c in want
            ]
            for name, (v, t) in extra_consts.items():
                arrays.append(pa.array([v] * batch.num_rows, type=t))
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)


class SnapshotManifestReader(DataSourceReader):
    def __init__(
        self, options, columns: list[str] | None = None, types=None
    ) -> None:
        self.columns = columns
        self.types = types or {}  # name -> pyarrow type, for typed NULLs
        m = _resolve(options)
        self.files: list[str] = m["files"]
        self.stats: dict = m["stats"]
        self.dv: dict = m.get("dv", {})
        self.aliases = _alias_map(m.get("schema"))
        self.bounds: dict[str, list] = {}
        self.null_req: dict[str, set] = {}  # col -> {"null","notnull"}

    # ------------------------------------------------- filter pushdown
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest range predicates for FILE pruning, then return every
        filter unsupported: the engine keeps the row-level residual (zone
        maps prune files, not rows)."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            # only simple top-level column references participate in
            # pruning: a nested path ("s", "b") would compare against the
            # WRONG banked stat key
            col = attr[0] if attr and len(attr) == 1 else None
            if isinstance(f, EqualTo):
                self._narrow(col, f.value, f.value)
            elif isinstance(f, EqualNullSafe):
                # <=> NULL matches only nulls — zone maps carry no null
                # counts, so only the non-null case narrows
                if f.value is not None:
                    self._narrow(col, f.value, f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._narrow(col, f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._narrow(col, None, f.value)
            elif isinstance(f, In):
                # sound relaxation: IN (v1..vn) ⊆ [min(v), max(v)] — a
                # file outside the hull can't hold any listed value
                vals = [_json_scalar_value(v) for v in f.value or ()]
                if vals and all(
                    not isinstance(v, (list, dict, tuple, set))
                    and v is not None
                    for v in vals
                ):
                    try:
                        self._narrow(col, min(vals), max(vals))
                    except TypeError:
                        pass  # mixed-domain list: no narrowing
            elif isinstance(f, StringStartsWith):
                p = f.value
                if isinstance(p, str) and p:
                    # every match is >= p and < the next prefix string
                    self._narrow(col, p, None)
                    up = _prefix_upper(p)
                    if up is not None:
                        self._narrow(col, None, up)
            elif isinstance(f, IsNull):
                if col:
                    self.null_req.setdefault(col, set()).add("null")
            elif isinstance(f, IsNotNull):
                if col:
                    self.null_req.setdefault(col, set()).add("notnull")
        return iter(filters)

    def _narrow(self, col: str | None, lo, hi) -> None:
        """Tighten the pruning bounds for ``col``. Filter literals arrive
        in PYTHON domain (datetime.date / datetime.datetime for date and
        timestamp predicates, lists for array equality); banked manifest
        stats live in the JSON domain (`_json_scalar_value`: ISO strings
        for temporals). Normalize through the SAME function so the
        zone-map comparison is always like-vs-like — an unnormalized
        datetime literal used to TypeError at partition planning. Non-
        scalar literals (lists, dicts) never narrow: zone maps carry
        scalar ranges only."""
        if col is None:
            return
        lo = _json_scalar_value(lo)
        hi = _json_scalar_value(hi)
        if isinstance(lo, (list, dict, tuple, set)) or isinstance(
            hi, (list, dict, tuple, set)
        ):
            return
        cur = self.bounds.setdefault(col, [None, None])
        try:
            if lo is not None and (cur[0] is None or lo > cur[0]):
                cur[0] = lo
            if hi is not None and (cur[1] is None or hi < cur[1]):
                cur[1] = hi
        except TypeError:
            # two pushed literals for one column in incomparable domains
            # — drop the narrowing for this column entirely (pruning is
            # an optimization; the engine keeps the row-level residual)
            self.bounds.pop(col, None)

    # ------------------------------------------------------ partitions
    def partitions(self) -> list[InputPartition]:
        # a renamed column's stats are banked under the physical name
        # each file was written with — spread every bound over the
        # column's historical aliases so pre-rename files keep pruning
        bounds: dict[str, tuple] = {}
        for c, (lo, hi) in self.bounds.items():
            for n in (c, *self.aliases.get(c, [])):
                bounds[n] = (lo, hi)
        keep = zone_prune(self.files, self.stats, bounds)
        if self.null_req:
            keep = [f for f in keep if self._null_admits(f)]
        return [
            SnapshotFilePartition(p, tuple(self.dv.get(p, [])))
            for p in keep
        ]

    def _null_admits(self, f: str) -> bool:
        """Null-count data skipping (the banked ``col#nulls`` =
        [null_count, num_rows] stats): an IS NULL predicate can't match
        in a file with zero nulls; IS NOT NULL can't match in an
        all-null file. Absent accounting = conservative keep. A file
        the query deletes rows from (deletion vectors) still admits —
        masking can only REMOVE rows, and a kept file is never wrong,
        only potentially wasted."""
        st = self.stats.get(f, {})
        for col, reqs in self.null_req.items():
            entry = None
            for n in (col, *self.aliases.get(col, [])):
                entry = st.get(n + NULLS_SUFFIX)
                if entry is not None:
                    break
            if entry is None:
                continue
            nulls, rows = entry
            if "null" in reqs and nulls == 0:
                return False
            if "notnull" in reqs and rows > 0 and nulls == rows:
                return False
        return True

    # ------------------------------------------------------------ read
    def read(self, partition: SnapshotFilePartition):
        # partitions() returning [] (every file pruned, or an empty
        # snapshot) makes PySpark still invoke read(None) once — a fully
        # out-of-range filter must yield zero rows, not crash
        if partition is None or not getattr(partition, "path", None):
            return
        yield from _read_file(
            partition.path,
            self.columns,
            self.types,
            self.aliases,
            getattr(partition, "dv", ()),
            bounds={
                c: (lo, hi) for c, (lo, hi) in self.bounds.items()
            },
        )


class SnapshotStreamReader(DataSourceStreamReader):
    """The snapshot log as a STRUCTURED STREAMING SOURCE: offsets are
    version numbers, one micro-batch covers the versions committed since
    the last processed offset, and the rows of a batch are the files
    ADDED by the APPEND commits in that range — the Delta streaming-
    source shape, driven by the engine's own offset/commit bookkeeping
    (the checkpoint stores {"version": N}; exactly-once across restarts
    comes from Structured Streaming itself, not from any consumer-side
    cursor code). Each added file is one InputPartition, so a batch
    scans at file parallelism on the executors and a poll that finds
    nothing new schedules zero tasks.

    CHANGE COMMITS (rewrites / OPTIMIZE / surgical deletes — any version
    that also REMOVES files) would re-deliver every row their rewritten
    files carry forward, so by default the stream FAILS on one, exactly
    like Delta's source; ``.option("skipChangeCommits", "true")`` skips
    them entirely (their added files are never emitted). Row-level
    delete/update feeds are the batch ``read_changes`` API."""

    def __init__(self, options, columns, types) -> None:
        self.root = options["root"]
        self.skip_change = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        self.columns = columns
        self.types = types
        # rename aliases from the head manifest (the map only grows, so
        # resolving at construction covers every earlier version; the
        # reader ships pickled to executors with this map aboard)
        try:
            self._aliases = _alias_map(
                load_manifest(
                    self.root, latest_version(self.root)
                ).get("schema")
            )
        except Exception:
            self._aliases = {}

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": latest_version(self.root)}

    def partitions(self, start: dict, end: dict):
        a, b = start["version"], end["version"]
        if a == 0:
            prev, prev_dv = set(), {}
        else:
            ma = load_manifest(self.root, a)
            prev, prev_dv = set(ma["files"]), ma["dv"]
        out: list[str] = []
        aliases: dict = {}
        for v in range(a + 1, b + 1):
            m = load_manifest(self.root, v)
            cur, cur_dv = set(m["files"]), m["dv"]
            aliases = _alias_map(m.get("schema"))
            added, removed = cur - prev, prev - cur
            # a DELETION-VECTOR commit removes ROWS while keeping file
            # identity — same re-delivery hazard as a rewrite, so it is
            # a change commit too (Delta's DV streams behave the same)
            dv_changed = cur_dv != prev_dv
            if removed or dv_changed:
                if not self.skip_change:
                    raise ValueError(
                        f"pysnapshot stream: version {v} is a change "
                        "commit (files were rewritten/removed, or "
                        "deletion vectors changed); its carried-forward "
                        "rows would re-deliver as duplicates. Set "
                        '.option("skipChangeCommits", "true") to skip '
                        "change commits, or consume row-level changes "
                        "via the batch read_changes API."
                    )
            else:
                out.extend(added)
            prev, prev_dv = cur, cur_dv
        self._aliases = aliases
        return [SnapshotFilePartition(p) for p in sorted(out)]

    def read(self, partition: SnapshotFilePartition):
        if partition is None or not getattr(partition, "path", None):
            return  # empty micro-batch: PySpark substitutes a None part
        yield from _read_file(
            partition.path,
            self.columns,
            self.types,
            getattr(self, "_aliases", {}),
        )

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint is the cursor; nothing to clean


class SnapshotCdfPartition(InputPartition):
    def __init__(
        self,
        path: str,
        kind: str,  # "insert" | "delete"
        version: int,
        dv_new: tuple[str, ...] = (),
        dv_old: tuple[str, ...] = (),
    ) -> None:
        self.path = path
        self.kind = kind
        self.version = version
        self.dv_new = dv_new
        self.dv_old = dv_old


class SnapshotChangeFeedStreamReader(DataSourceStreamReader):
    """The snapshot log as a STREAMING CHANGE DATA FEED (Delta's
    ``readChangeFeed`` stream): offsets are version numbers; each
    micro-batch emits ROW-LEVEL changes with ``_change_type`` and
    ``_commit_version`` columns — inserts from APPEND commits (the added
    files' rows) and deletes from DELETION-VECTOR commits (exactly the
    newly tombstoned positions, read straight from the sidecar diff —
    no exceptAll needed, so every partition stays an independent
    per-file executor read). A merge-on-read UPDATE surfaces as its
    delete/insert pair across the same version, the Delta CDF shape.

    Commits that REMOVE files (rewrites, OPTIMIZE, materialize, restore)
    cannot be diffed per-partition; they fail the stream by default and
    ``.option("skipChangeCommits", "true")`` skips them — rewrites carry
    rows forward, so skipping a pure-layout commit loses nothing."""

    def __init__(self, options, columns, types) -> None:
        self.root = options["root"]
        self.skip_change = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        self.columns = columns
        self.types = types
        try:
            self._aliases = _alias_map(
                load_manifest(
                    self.root, latest_version(self.root)
                ).get("schema")
            )
        except Exception:
            self._aliases = {}

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": latest_version(self.root)}

    def partitions(self, start: dict, end: dict):
        a, b = start["version"], end["version"]
        if a == 0:
            prev, prev_dv = set(), {}
        else:
            ma = load_manifest(self.root, a)
            prev, prev_dv = set(ma["files"]), ma["dv"]
        out: list[SnapshotCdfPartition] = []
        for v in range(a + 1, b + 1):
            m = load_manifest(self.root, v)
            cur, cur_dv = set(m["files"]), m["dv"]
            removed = prev - cur
            if removed:
                if not self.skip_change:
                    raise ValueError(
                        f"pysnapshot CDF stream: version {v} removes "
                        "files (rewrite/OPTIMIZE/restore) — its row "
                        "diff is not per-file computable. Set "
                        '.option("skipChangeCommits", "true") to skip '
                        "layout commits, or use the batch "
                        "read_changes API."
                    )
            else:
                for p in sorted(cur - prev):
                    out.append(
                        SnapshotCdfPartition(
                            p, "insert", v,
                            dv_new=tuple(cur_dv.get(p, [])),
                        )
                    )
                for p in sorted(cur & prev):
                    new_dirs = [
                        d
                        for d in cur_dv.get(p, [])
                        if d not in set(prev_dv.get(p, []))
                    ]
                    if new_dirs:
                        out.append(
                            SnapshotCdfPartition(
                                p, "delete", v,
                                dv_new=tuple(new_dirs),
                                dv_old=tuple(prev_dv.get(p, [])),
                            )
                        )
            prev, prev_dv = cur, cur_dv
        return out

    def read(self, partition: SnapshotCdfPartition):
        import pyarrow as pa

        if partition is None or not getattr(partition, "path", None):
            return
        consts = {
            "_change_type": (partition.kind, pa.string()),
            "_commit_version": (partition.version, pa.int64()),
        }
        if partition.kind == "insert":
            # rows visible at the add commit (minus any dv it carried)
            yield from _read_file(
                partition.path,
                self.columns,
                self.types,
                self._aliases,
                dv_dirs=partition.dv_new,
                extra_consts=consts,
            )
            return
        # delete leg: EXACTLY the newly tombstoned positions — the
        # sidecar diff, never a table diff
        new_pos = _dv_positions(partition.path, partition.dv_new)
        if partition.dv_old:
            new_pos -= _dv_positions(partition.path, partition.dv_old)
        if not new_pos:
            return
        yield from _read_file(
            partition.path,
            self.columns,
            self.types,
            self._aliases,
            only_positions=new_pos,
            extra_consts=consts,
        )

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint is the cursor


class SnapshotChangeFeedBatchReader(DataSourceReader):
    """Batch CDF through the connector (Delta's
    ``read.option("readChangeFeed", true)``): row-level changes between
    ``startingVersion`` (exclusive base, default 0 = from the beginning)
    and ``endingVersion`` (default head), same per-file insert/delete
    partitions as the streaming reader — one bounded slice of history
    instead of a cursor."""

    def __init__(self, options, columns, types) -> None:
        root = options["root"]
        self._inner = SnapshotChangeFeedStreamReader(
            options, columns, types
        )
        self.start = int(options.get("startingversion", 0))
        self.end = int(
            options.get("endingversion", latest_version(root))
        )

    def partitions(self) -> list[InputPartition]:
        return self._inner.partitions(
            {"version": self.start}, {"version": self.end}
        )

    def read(self, partition):
        yield from self._inner.read(partition)


@dataclass
class SnapshotCommitMessage(WriterCommitMessage):
    path: str = ""
    stats: dict = field(default_factory=dict)


class SnapshotDataWriter(DataSourceArrowWriter):
    """``df.write.format("pysnapshot")`` — a DISTRIBUTED ATOMIC COMMIT
    through the Python DataSource ARROW writer protocol: each executor
    task streams the engine's RecordBatches straight into one immutable
    parquet shard (no per-row Python at all) and reports back only
    (path, footer stats) as its commit message; the driver's ``commit``
    publishes ONE manifest over all task files — so a write is
    all-or-nothing (a failed job's ``abort`` unlinks the orphans, and an
    unpublished file is invisible anyway), stats for zone-map pruning
    are collected executor-side FOR FREE at write time (Delta's exact
    design), and ``mode("append")``/``mode("overwrite")`` map to
    commit_append / commit_rewrite semantics with the same optimistic-
    concurrency manifest protocol as every other log writer. Stats for
    columns the table ALREADY tracks are backfilled even when
    ``statsCols`` omits them, so the stat schema stays uniform across
    commits (the ``_merged_stats`` invariant). An all-empty write
    publishes NO version: an empty manifest would make the table head
    unreadable, and an empty append is a no-op by definition."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        import os
        import uuid

        self.root = options["root"]
        self.overwrite = overwrite
        self.stats_cols = [
            c for c in options.get("statscols", "").split(",") if c
        ]
        self.commit_dir = os.path.join(
            self.root, "data", uuid.uuid4().hex
        )
        # a table created purely through the connector needs its log dir
        os.makedirs(os.path.join(self.root, "_manifests"), exist_ok=True)

    def write(self, iterator) -> SnapshotCommitMessage | None:
        import os
        import uuid

        import pyarrow.parquet as pq

        os.makedirs(self.commit_dir, exist_ok=True)
        path = os.path.join(
            self.commit_dir, f"part-{uuid.uuid4().hex}.parquet"
        )
        writer = None
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
        if writer is None:
            # empty task: no file. The Arrow writer protocol requires a
            # commit message object (None is rejected), so signal "no
            # file" with an empty path the commit step filters out.
            return SnapshotCommitMessage(path="", stats={})
        writer.close()
        stats = (
            _footer_stats_one(path, self.stats_cols)
            if self.stats_cols
            else {}
        )
        return SnapshotCommitMessage(path=path, stats=stats)

    # ------------------------------------------------- commit protocol
    def _commit_with_retry(self, messages, txn_update=None) -> None:
        """The one manifest-commit loop every connector write path uses:
        optimistic-concurrency retry, txn map carried forward through
        every commit, tracked-stat-column backfill, append/overwrite
        base handling, and the empty-write no-op."""
        files = sorted(m.path for m in messages if m and m.path)
        stats = {m.path: m.stats for m in messages if m and m.path}
        if not files and txn_update is None:
            return  # empty BATCH write: publish nothing (append of
            # nothing is a no-op; an empty batch overwrite keeps the
            # table readable rather than truncating it — documented)
        # An empty STREAMING epoch still commits: complete-mode must
        # publish the recomputed (empty) result instead of leaving the
        # previous epoch visible, and append-mode must still bank the
        # (appId, batchId) txn entry so replay detection has no holes.
        for _ in range(5):
            base_v = latest_version(self.root)
            base_files: list = []
            base_stats: dict = {}
            txn: dict = {}
            if base_v > 0:
                m = load_manifest(self.root, base_v)
                base_stats, txn = m["stats"], dict(m.get("txn", {}))
                if not self.overwrite:
                    base_files = m["files"]
                if txn_update:
                    app, batch = txn_update
                    if txn.get(app) is not None and txn[app] >= batch:
                        # replayed epoch: already durable — reclaim dupes
                        import os

                        for p in files:
                            try:
                                os.unlink(p)
                            except FileNotFoundError:
                                pass
                        return
            # uniform stat schema: backfill columns the table already
            # tracks but this write's statsCols omitted (O(new files)
            # footer reads, same cost class as the write itself)
            tracked = set().union(
                *(set(s) for s in base_stats.values()), set()
            ) if base_stats else set()
            missing = sorted(tracked - set(self.stats_cols))
            if missing:
                for p in files:
                    extra_stats = _footer_stats_one(p, missing)
                    stats[p] = {**extra_stats, **stats.get(p, {})}
            if txn_update:
                txn[txn_update[0]] = txn_update[1]
            try:
                publish_version(
                    self.root,
                    base_files + files,
                    base_v,
                    {
                        **(base_stats if not self.overwrite else {}),
                        **stats,
                    },
                    extra={"txn": txn} if txn else None,
                )
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            "5 consecutive manifest conflicts — giving up"
        )

    def commit(self, messages) -> None:
        self._commit_with_retry(messages)

    def abort(self, messages) -> None:
        import os

        for m in messages or []:
            if m and m.path:
                try:
                    os.unlink(m.path)
                except FileNotFoundError:
                    pass


class SnapshotStreamWriter(SnapshotDataWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("pysnapshot")`` — one ATOMIC snapshot
    version per micro-batch, with epoch IDEMPOTENCE keyed on
    (appId, batchId): the manifest's ``txn`` map records each writer
    application's last committed batch and is carried forward through
    EVERY commit, so a retried epoch (crash between the engine's commit
    call and its checkpoint advance) detects it already published — even
    if unrelated commits interleaved — and unlinks its duplicate shards
    instead of double-appending, while a DIFFERENT streaming query
    writing the same table is never misclassified as a replay. This is
    Delta's txn/appId protocol. The appId defaults to the query's
    checkpoint location (the engine passes it through the options) and
    can be pinned with ``.option("txnAppId", ...)``.

    ``outputMode("complete")`` (the engine passes overwrite=True) makes
    each epoch a rewrite commit: the new version holds only that epoch's
    recomputed result. Executor-side Arrow shard writes and write-time
    stats collection are inherited from the batch writer."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        super().__init__(options, schema, overwrite)
        self.app_id = (
            options.get("txnappid")
            or options.get("checkpointlocation")
            or "pysnapshot-stream"
        )

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        self._commit_with_retry(
            messages, txn_update=(self.app_id, batchId)
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        SnapshotDataWriter.abort(self, messages)


class SnapshotDataSource(DataSource):
    """format("pysnapshot") — options: root (required), version
    (default: head), statsCols, skipChangeCommits, txnAppId."""

    @classmethod
    def name(cls) -> str:
        return "pysnapshot"

    def schema(self):
        """Union schema across the requested version's files (additive
        evolution means later files carry new columns that older files
        surface as NULL — exactly what ``SnapshotTable.read``'s
        mergeSchema exposes). Footer-only: no data reads."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        m = _resolve(self.options)
        files = m["files"]
        if not files:
            # empty snapshot (e.g. a complete-mode epoch that recomputed
            # to zero rows): schema from the newest PRIOR version that
            # had files — the table's last known shape
            root = self.options["root"]
            v = int(self.options.get("version", latest_version(root)))
            for pv in range(v - 1, 0, -1):
                try:
                    prior = load_manifest(root, pv)["files"]
                except Exception:
                    break
                if prior:
                    files = [prior[0]]
                    break
        if not files:
            raise ValueError(
                "pysnapshot: the requested version has no data files; "
                "supply an explicit .schema(...)"
            )
        unified = pq.ParquetFile(files[0]).schema_arrow
        for f in files[1:]:
            # permissive promotion: commits may WIDEN a column's physical
            # type (int32 files then int64 files) — unify to the wider
            # type instead of raising; _read_file casts each file's
            # batches up to this declared type
            unified = pa.unify_schemas(
                [unified, pq.ParquetFile(f).schema_arrow],
                promote_options="permissive",
            )
        # every field nullable: a column added by evolution is NULL in
        # pre-evolution files even if its own writer marked it required
        # (e.g. a literal column) — same posture as Spark's mergeSchema
        unified = pa.schema([f.with_nullable(True) for f in unified])
        smap = m.get("schema")
        if smap:
            # field-id map: project the physical union onto the CURRENT
            # logical names (renames read back under the new name; a
            # dropped field's physical bytes stop surfacing)
            fields = []
            for ent in smap:
                for n in (ent["name"], *ent.get("prior", [])):
                    if unified.get_field_index(n) >= 0:
                        fields.append(
                            unified.field(n).with_name(ent["name"])
                        )
                        break
            unified = pa.schema(fields)
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            # CDF metadata columns ride LAST (the readers append them)
            unified = pa.schema(
                list(unified)
                + [
                    pa.field("_change_type", pa.string()),
                    pa.field("_commit_version", pa.int64()),
                ]
            )
        return from_arrow_schema(unified)

    def reader(self, schema) -> DataSourceReader:
        names, types = _schema_maps(schema)
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            return SnapshotChangeFeedBatchReader(
                self.options, names, types
            )
        return SnapshotManifestReader(self.options, names, types)

    def streamReader(self, schema) -> DataSourceStreamReader:
        names, types = _schema_maps(schema)
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            return SnapshotChangeFeedStreamReader(
                self.options, names, types
            )
        return SnapshotStreamReader(self.options, names, types)

    def writer(self, schema, overwrite: bool) -> SnapshotDataWriter:
        return SnapshotDataWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> SnapshotStreamWriter:
        return SnapshotStreamWriter(self.options, schema, overwrite)


def register_snapshot_source(spark) -> None:
    """Register the pysnapshot format (idempotent). Also enables
    ``spark.sql.python.filterPushdown.enabled``: the reader implements
    ``pushFilters``, and Spark REFUSES such readers outright when the
    conf (default false) is off — without this, every read through the
    connector fails on a vanilla session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
