"""Always-on streaming near-duplicate filtering: an ingest stream of
documents folds through the incremental n-gram-Jaccard dedup
(``llm/dedup.py::jaccard_delta_pairs``, the R10 daily-ingest shape)
per micro-batch, against a STANDING index persisted as a snapshot
table — the streaming half of the LLM curation pipeline.

Per epoch the cost model is the batch delta-dedup's: only the DELTA
side's postings drive the probe join (|delta postings| x capped
posting length — never corpus² and never a corpus re-featurization:
the index table stores each accepted document's shingle SET, so the
corpus side is a column read, not a recompute). Exactly-once comes
from the snapshot log itself: the epoch watermark publishes atomically
with the accepted rows (the Delta txn action), a replayed epoch is a
detected no-op, and an epoch where everything was a duplicate still
advances the watermark through a metadata-only commit.

Keep-first policy (deterministic, mirrored bit-for-bit by the
``llm_stream_near_dup`` oracle): an incoming document is DROPPED when
it near-matches (Jaccard >= threshold) any document already in the
index, or any SMALLER-ID document of its own batch — whether or not
that smaller document itself survives (the standard greedy
approximation; a transitive-closure policy would serialize the batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..llm.dedup import _doc_shingle_sets, jaccard_delta_pairs
from ..sources.snapshots import SnapshotTable, load_manifest


class StreamingNearDupFilter:
    """foreachBatch handler: accepted documents (id, text, shingle set)
    land in the snapshot table at ``root``; duplicates drop. Attach
    with ``stream.writeStream.foreachBatch(f.process_batch)``."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        threshold: float = 0.5,
        max_shingle_freq: int | None = None,
        app_id: str = "neardup_stream",
        clock=None,
    ):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self.max_shingle_freq = max_shingle_freq
        self.app_id = app_id
        self.clock = clock

    def _table(self) -> SnapshotTable:
        return SnapshotTable(self.spark, self.root, clock=self.clock)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        t = self._table()
        wm = t.txn_watermark(self.app_id)
        if wm is not None and int(epoch_id) <= int(wm):
            return  # replayed epoch: the log says it already landed
        # pin the batch: foreachBatch sources may re-evaluate between
        # the featurize pass and the accepted-rows write
        batch = (
            batch_df.select(
                F.col(self.id_col).cast("long").alias("doc"),
                F.col(self.text_col).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        delta_sets = _doc_shingle_sets(
            batch, "doc", "text", self.n
        ).localCheckpoint(eager=True)
        cur = t.current_version()
        # an all-duplicate (or empty) FIRST epoch publishes a
        # metadata-only v1 with zero files and no schema; gate the
        # corpus read on the manifest actually carrying files so a
        # later non-empty epoch doesn't wedge on a schemaless read
        has_files = cur > 0 and bool(
            load_manifest(self.root, cur).get("files")
        )
        corpus_sets = (
            t.read().select("doc", "sh")
            if has_files
            else self.spark.createDataFrame(
                [], "doc bigint, sh array<string>"
            )
        )
        pairs = jaccard_delta_pairs(
            corpus_sets,
            delta_sets,
            threshold=self.threshold,
            max_shingle_freq=self.max_shingle_freq,
        )
        delta_ids = batch.select(F.col("doc").alias("doc_match"))
        # delta-delta pairs emit (doc_new < doc_match): the LARGER id
        # drops; delta-corpus pairs emit (doc_new, corpus doc): the
        # delta side drops
        dd = pairs.join(delta_ids, "doc_match", "left_semi").select(
            F.col("doc_match").alias("doc")
        )
        dc = pairs.join(delta_ids, "doc_match", "left_anti").select(
            F.col("doc_new").alias("doc")
        )
        drops = dd.unionByName(dc).distinct()
        accepted = (
            batch.join(delta_sets, "doc")
            .join(drops, "doc", "left_anti")
            .select("doc", "text", "sh")
        )
        if accepted.limit(1).count() == 0:
            # all duplicates: the watermark must still advance or a
            # restart replays this epoch forever
            t.commit_txn({self.app_id: int(epoch_id)}, op="NEARDUP")
            return
        t.commit_append(
            accepted,
            op="NEARDUP",
            txn_update={self.app_id: int(epoch_id)},
        )
