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
