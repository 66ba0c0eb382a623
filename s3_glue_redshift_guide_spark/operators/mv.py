"""Incrementally-maintained materialized aggregates over a snapshot
table's CHANGE FEED — with RETRACTION semantics.

``IncrementalRollup`` (rollup.py) maintains monoid state over
insert-only deltas; this module closes the other half: a source table
that also DELETES and UPDATES (deletion vectors, merge-on-read MERGE,
copy-on-write surgery). The change feed reports every mutation as an
insert/delete multiset, so a refresh folds ``+row`` for inserts and
``-row`` for deletes into per-group partial aggregates — the
Flink/Materialize retractable-aggregate shape, built from the table
format's own CDF instead of a stream processor.

Scale contract (the reason this exists at 100 TB):

* refresh cost is **O(churn since last refresh)**, never O(table):
  ``read_changes`` scans only files added/removed/DV-grown between the
  cursor and head (immutable files shared by both versions are never
  read);
* the merge shuffle carries **|state groups| + |delta groups|** rows —
  aggregate-scale, not row-scale;
* the refresh cursor publishes ATOMICALLY with the refreshed state via
  the state table's txn action (Delta's idempotent-writer record): a
  crash between "state written" and "cursor advanced" is impossible,
  so a refresh can never double-apply or skip a commit's changes;
* the MV state IS a snapshot table — time-travelable, cloneable,
  readable through the pysnapshot connector like any other.

Only RETRACTABLE aggregates are allowed: sum / count (avg derives at
read time). min/max are rejected — retracting the current extreme
requires the full group, i.e. a scan, exactly why stream processors
refuse them too. Exactness under retraction requires an exact-additive
sum domain: integer/long/decimal columns are safe; float/double sums
are rejected (a + x - x need not equal a in binary floating point —
the MV would drift from the recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import SnapshotTable

#: retraction sign: +1 for the post-image world, -1 for the pre-image
_SIGN = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
    F.lit(-1)
)

_FLOATY = ("float", "double")


class ChangeFeedMaterializedView:
    """Materialized ``GROUP BY keys`` aggregate over ``source``,
    refreshed incrementally from its change feed.

    ``measures`` maps output column -> ("sum", col) or ("count",).
    A hidden ``__mv_rows`` count is always maintained so fully-retracted
    groups vanish from the view (a group whose every row was deleted
    must not linger at zero).
    """

    CURSOR_APP = "mv-refresh"

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        root: str,
        keys: list[str],
        measures: dict[str, tuple],
    ) -> None:
        if not measures:
            raise ValueError("at least one measure required")
        for out, spec in measures.items():
            if spec[0] == "count" and len(spec) == 1:
                continue
            if spec[0] == "sum" and len(spec) == 2:
                continue
            raise ValueError(
                f"{out}: only ('sum', col) and ('count',) are "
                "retractable — min/max need the full group to retract "
                "an extreme (that's a scan; recompute instead)"
            )
        self.spark = spark
        self.source = source
        self.keys = list(keys)
        self.measures = dict(measures)
        self.state = SnapshotTable(spark, root)

    # ------------------------------------------------------- internals
    def _check_sum_dtypes(self, df: DataFrame) -> None:
        dt = dict(df.dtypes)
        for out, spec in self.measures.items():
            if spec[0] == "sum" and dt.get(spec[1]) in _FLOATY:
                raise ValueError(
                    f"{out}: sum over {spec[1]} ({dt[spec[1]]}) is not "
                    "exactly retractable in binary floating point — "
                    "cast to decimal/long (e.g. integer cents) first"
                )

    def _delta_aggs(self) -> list:
        out = []
        for name, spec in self.measures.items():
            if spec[0] == "count":
                out.append(F.sum(_SIGN).cast("long").alias(name))
            else:
                out.append(
                    F.sum(_SIGN * F.col(spec[1])).alias(name)
                )
        out.append(F.sum(_SIGN).cast("long").alias("__mv_rows"))
        return out

    def _merge_aggs(self) -> list:
        cols = [*self.measures, "__mv_rows"]
        return [F.sum(c).alias(c) for c in cols]

    # --------------------------------------------------------- surface
    def last_refreshed_version(self) -> int:
        return int(self.state.txn_watermark(self.CURSOR_APP) or 0)

    def _fold(self, changes: DataFrame, new_cursor: int) -> None:
        """Fold one change multiset into the state and publish the new
        cursor IN THE SAME manifest (crash-atomic, replay-impossible).
        Shared by batch refresh and the streaming epoch fold."""
        self._check_sum_dtypes(changes)
        delta = changes.groupBy(*self.keys).agg(*self._delta_aggs())
        prior = (
            self.state.read()
            if self.state.current_version() > 0
            else None
        )
        merged = (
            delta
            if prior is None
            else prior.unionByName(delta)
            .groupBy(*self.keys)
            .agg(*self._merge_aggs())
        )
        merged = merged.filter(F.col("__mv_rows") > 0)
        self.state.commit_rewrite(
            merged, txn_update={self.CURSOR_APP: int(new_cursor)}
        )

    def refresh(self) -> int:
        """Fold every source commit since the last refresh into the
        state; returns the source version now reflected. No-op (no new
        state commit) when the source hasn't moved. If VACUUM truncated
        the log past the cursor (``LogTruncated``), the incremental
        deltas are unrecoverable by definition — the refresh falls back
        to a FULL REBUILD from the head snapshot (the one unavoidable
        O(table) case, exactly Delta's re-bootstrap contract for CDF
        consumers whose cursor left the retention window)."""
        from ..sources.snapshots import LogTruncated

        last = self.last_refreshed_version()
        head = self.source.current_version()
        if head == last:
            return last
        try:
            changes = self.source.read_changes(last, head)
        except LogTruncated:
            snap = self.source.read(head).withColumn(
                "_change_type", F.lit("insert")
            )
            self._rebuild(snap, head)
            return head
        self._fold(changes, head)
        return head

    def _rebuild(self, inserts: DataFrame, cursor: int) -> None:
        """Full recompute path: fold ``inserts`` as if the state were
        empty (bypassing the stored partials)."""
        self._check_sum_dtypes(inserts)
        merged = inserts.groupBy(*self.keys).agg(
            *self._delta_aggs()
        ).filter(F.col("__mv_rows") > 0)
        self.state.commit_rewrite(
            merged, txn_update={self.CURSOR_APP: int(cursor)}
        )

    def refresh_stream(
        self,
        checkpoint: str,
        processing_time: str | None = None,
        available_now: bool = False,
    ):
        """ALWAYS-ON maintenance: the connector's change-data-feed
        STREAM (``readChangeFeed``) feeds each micro-batch's change
        multiset through the same ±sign fold via ``foreachBatch``.
        Exactly-once across restarts and mixed batch/stream use without
        trusting the sink: every epoch first drops rows with
        ``_commit_version <= cursor`` (a restarted stream redelivers
        its last epoch, and a stream started on an already-refreshed MV
        bootstraps from version 0), then publishes the surviving max
        version as the cursor ATOMICALLY with the folded state. At
        100 TB each epoch's cost is the epoch's churn — admission
        control (``maxVersionsPerTrigger``) bounds it — and the merge
        shuffle stays group-scale."""
        from ..sources.pyds import register_snapshot_source

        register_snapshot_source(self.spark)

        def fold_epoch(batch_df: DataFrame, epoch_id: int) -> None:
            cur = self.last_refreshed_version()
            fresh = batch_df.filter(
                F.col("_commit_version") > F.lit(cur)
            ).localCheckpoint(eager=True)
            hi = fresh.agg(F.max("_commit_version")).collect()[0][0]
            if hi is None:
                return  # fully-redelivered or empty epoch
            self._fold(fresh.drop("_commit_version"), hi)

        stream = (
            self.spark.readStream.format("pysnapshot")
            .option("root", self.source.root)
            .option("readChangeFeed", "true")
            .load()
        )
        writer = (
            stream.writeStream.foreachBatch(fold_epoch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def read(self) -> DataFrame:
        """The maintained aggregate (hidden bookkeeping column
        dropped)."""
        if self.state.current_version() == 0:
            raise ValueError("refresh() has never run")
        return self.state.read().drop("__mv_rows")


class ChangeFeedJoinAggView:
    """Materialized ``GROUP BY keys`` aggregate over the EQUI-JOIN of two
    snapshot tables, maintained incrementally from BOTH change feeds.

    The refresh applies the multiset telescoping identity

        L_new ⋈ R_new  -  L_old ⋈ R_old
          =  ΔL ⋈ R_new   ∪   L_old ⋈ ΔR

    where ``ΔL = L_new - L_old`` is the left table's signed change feed
    (insert = +1, delete = -1) — so a refresh that sees BOTH sides move
    is exact with no ΔL⋈ΔR correction term, because the left delta joins
    the right's NEW snapshot while the right delta joins the left's OLD
    one. MOR updates arrive as their delete/insert pair and retract /
    re-add through the same fold.

    Scale contract at 100 TB:

    * each delta side is O(churn since the cursor) — the change feed
      reads only churned files — and is therefore the SMALL side of its
      join: AQE broadcasts it, so the big snapshot streams through a
      broadcast-hash join with zero shuffle of the big side;
    * the fold output is aggregate-scale (|groups|), identical to the
      single-table MV; the state table never stores joined rows;
    * both cursors publish ATOMICALLY with the refreshed state in one
      state-table commit (two txn app records), so a crash between
      "left folded" and "right folded" is impossible by construction.

    Same retractability rules as ``ChangeFeedMaterializedView``: only
    ('sum', col) over exact-additive domains and ('count',).
    """

    CURSOR_L = "mv-join-left"
    CURSOR_R = "mv-join-right"

    def __init__(
        self,
        spark: SparkSession,
        left: SnapshotTable,
        right: SnapshotTable,
        root: str,
        left_on: list[str],
        right_on: list[str],
        keys: list[str],
        measures: dict[str, tuple],
    ) -> None:
        if len(left_on) != len(right_on) or not left_on:
            raise ValueError("left_on/right_on must pair 1:1 and be non-empty")
        inner = ChangeFeedMaterializedView.__init__
        # reuse the measure validation + fold helpers via composition
        self._agg = ChangeFeedMaterializedView.__new__(ChangeFeedMaterializedView)
        inner(self._agg, spark, left, root, keys, measures)
        self.spark = spark
        self.left, self.right = left, right
        self.left_on, self.right_on = list(left_on), list(right_on)
        self.keys = list(keys)
        self.measures = dict(measures)
        self.state = self._agg.state

    # ------------------------------------------------------- internals
    def _cursors(self) -> tuple[int, int]:
        return (
            int(self.state.txn_watermark(self.CURSOR_L) or 0),
            int(self.state.txn_watermark(self.CURSOR_R) or 0),
        )

    def _join(self, l_df: DataFrame, r_df: DataFrame) -> DataFrame:
        cond = None
        for lk, rk in zip(self.left_on, self.right_on):
            c = l_df[lk] == r_df[rk]
            cond = c if cond is None else (cond & c)
        return l_df.join(r_df, cond, "inner")

    def _project(self, joined: DataFrame) -> DataFrame:
        need = list(self.keys) + [
            spec[1] for spec in self.measures.values() if spec[0] == "sum"
        ]
        return joined.select(*dict.fromkeys(need), "_change_type")

    def _publish(self, changes: DataFrame, lv: int, rv: int) -> None:
        self._agg._check_sum_dtypes(changes)
        delta = changes.groupBy(*self.keys).agg(*self._agg._delta_aggs())
        # a cursor-only advance (streaming left-first bootstrap) leaves
        # a file-less state version — that is an EMPTY prior, not a
        # readable one
        prior = (
            self.state.read()
            if self.state.current_version() > 0
            and self.state.file_count() > 0
            else None
        )
        merged = (
            delta
            if prior is None
            else prior.unionByName(delta)
            .groupBy(*self.keys)
            .agg(*self._agg._merge_aggs())
        )
        self.state.commit_rewrite(
            merged.filter(F.col("__mv_rows") > 0),
            txn_update={self.CURSOR_L: int(lv), self.CURSOR_R: int(rv)},
        )

    # --------------------------------------------------------- surface
    def refresh(self) -> tuple[int, int]:
        """Fold every commit on either side since the cursors; returns
        the (left, right) versions now reflected. Falls back to a full
        rebuild (head ⋈ head, insert-only fold over empty state) when
        VACUUM truncated either log past its cursor."""
        from ..sources.snapshots import LogTruncated

        lc, rc = self._cursors()
        lv = self.left.current_version()
        rv = self.right.current_version()
        if (lv, rv) == (lc, rc):
            return lc, rc
        try:
            parts = []
            if lv > lc:
                d_l = self.left.read_changes(lc, lv)
                parts.append(
                    self._project(
                        self._join(
                            d_l, self.right.read(rv)
                        )
                    )
                )
            if rv > rc:
                d_r = self.right.read_changes(rc, rv)
                l_old = (
                    self.left.read(lc)
                    if lc > 0
                    else None
                )
                if l_old is not None:
                    joined = self._join(l_old, d_r)
                    parts.append(self._project(joined))
            if not parts:
                return lc, rc
            changes = parts[0]
            for p in parts[1:]:
                changes = changes.unionByName(p)
            self._publish(changes, lv, rv)
            return lv, rv
        except LogTruncated:
            head = self._project(
                self._join(self.left.read(lv), self.right.read(rv))
                .withColumn("_change_type", F.lit("insert"))
            )
            self._agg._check_sum_dtypes(head)
            merged = head.groupBy(*self.keys).agg(
                *self._agg._delta_aggs()
            ).filter(F.col("__mv_rows") > 0)
            self.state.commit_rewrite(
                merged,
                txn_update={self.CURSOR_L: int(lv), self.CURSOR_R: int(rv)},
            )
            return lv, rv

    def _fold_side(
        self, side: str, changes: DataFrame, new_v: int
    ) -> None:
        """Fold ONE side's change batch (round 8: the streaming unit of
        work). The single-side telescoping identity holds with the
        OTHER side pinned at its own cursor::

            ΔL ⋈ R@rc      (left fold: right frozen at right-cursor)
            L@lc ⋈ ΔR      (right fold: left frozen at left-cursor)

        so any SERIALIZED interleaving of left/right folds telescopes
        to head ⋈ head exactly — each fold advances one cursor and the
        state commit banks it atomically. Concurrent folds are safe,
        not lossy: the state table's optimistic publish turns a racing
        fold into ``CommitConflict`` (the stream retries its epoch),
        never a silently lost update."""
        from ..sources.snapshots import load_manifest

        lc, rc = self._cursors()
        cur = lc if side == "L" else rc
        if new_v <= cur:
            return  # replayed epoch
        if side == "L":
            other = self.right.read(rc) if rc > 0 else None
            joined = (
                self._join(changes, other)
                if other is not None
                else None
            )
            lv, rv = new_v, rc
            app = self.CURSOR_L
        else:
            other = self.left.read(lc) if lc > 0 else None
            joined = (
                self._join(other, changes)
                if other is not None
                else None
            )
            lv, rv = lc, new_v
            app = self.CURSOR_R
        if joined is None:
            # the other side has never been folded (cursor 0 = empty
            # multiset): nothing joins, but the cursor must advance
            # atomically — a metadata-only state commit
            st = self.state
            sv = st.current_version()
            m = (
                load_manifest(st.root, sv)
                if sv > 0
                else {"files": [], "stats": {}}
            )
            st._publish(
                m["files"], sv, m.get("stats") or {},
                txn_update={app: int(new_v)}, op="MV CURSOR",
            )
            return
        self._publish(self._project(joined), lv, rv)

    def refresh_streams(
        self,
        checkpoint_left: str,
        checkpoint_right: str,
        available_now: bool = False,
        processing_time: str | None = None,
        max_versions_per_trigger: int | None = None,
        sides: tuple[str, ...] = ("L", "R"),
    ):
        """ALWAYS-ON maintenance from BOTH change-data-feed streams
        (VERDICT-r7 round-8 candidate #1): each side's ``readChangeFeed``
        stream folds its micro-batches through ``_fold_side`` — the
        same ±sign fold as the batch refresh, one side at a time, the
        other side read at its cursor via time travel. Returns the two
        StreamingQuery handles. Epochs are idempotent across restarts:
        rows at or below the banked cursor are dropped before folding
        and the surviving max version publishes WITH the fold. With
        ``available_now`` the two drains run SEQUENTIALLY (left then
        right — deterministic serialization, both handles returned
        terminated); under timed triggers both run concurrently and a
        racing pair degrades to a CommitConflict retry, never a lost
        update. ``max_versions_per_trigger`` caps the BACKLOG each
        epoch folds on BOTH feeds (the source's admission control): a
        week-long outage replays as bounded epochs instead of one
        giant catch-up batch whose join state must fit memory at once.
        ``sides`` restricts the drain (operational single-side
        catch-up; also how the crash tests serialize a kill BETWEEN
        the two folds) — a half-drained pair is a CONSISTENT view
        (each fold telescopes independently), just stale on the
        undrained side."""
        from ..sources.pyds import register_snapshot_source

        register_snapshot_source(self.spark)

        def fold_epoch(side):
            def _fold(batch_df: DataFrame, epoch_id: int) -> None:
                lc, rc = self._cursors()
                cur = lc if side == "L" else rc
                fresh = batch_df.filter(
                    F.col("_commit_version") > F.lit(cur)
                ).localCheckpoint(eager=True)
                hi = fresh.agg(
                    F.max("_commit_version")
                ).collect()[0][0]
                if hi is None:
                    return  # fully-redelivered or empty epoch
                self._fold_side(
                    side, fresh.drop("_commit_version"), int(hi)
                )

            return _fold

        out = []
        for side, table, ckpt in (
            ("L", self.left, checkpoint_left),
            ("R", self.right, checkpoint_right),
        ):
            if side not in sides:
                out.append(None)
                continue
            if table.current_version() == 0:
                # nothing ever committed on this side: there is no log
                # to stream yet (the CDF source can't resolve an empty
                # root). The next drain bootstraps from version 0 — the
                # stream's default — so skipping loses nothing.
                out.append(None)
                continue
            reader = (
                self.spark.readStream.format("pysnapshot")
                .option("root", table.root)
                .option("readChangeFeed", "true")
            )
            if max_versions_per_trigger is not None:
                reader = reader.option(
                    "maxVersionsPerTrigger",
                    str(int(max_versions_per_trigger)),
                )
            stream = reader.load()
            writer = (
                stream.writeStream.foreachBatch(fold_epoch(side))
                .option("checkpointLocation", ckpt)
                .outputMode("update")
            )
            if available_now:
                writer = writer.trigger(availableNow=True)
            elif processing_time is not None:
                writer = writer.trigger(processingTime=processing_time)
            q = writer.start()
            if available_now:
                q.awaitTermination()
            out.append(q)
        return out

    def read(self) -> DataFrame:
        if self.state.current_version() == 0:
            raise ValueError("refresh() has never run")
        return self.state.read().drop("__mv_rows")
