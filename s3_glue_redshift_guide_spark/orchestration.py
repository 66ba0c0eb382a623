"""Workflow orchestration — the reference's trigger->crawler->job->load
chain as a thin engine-side driver loop.

The reference wires: an S3 object-created event fires a Lambda
(README.md:171-202), the Lambda starts a workflow (README.md:155-166), the
workflow runs crawler -> job -> load. Spark-native equivalents, in order:

* **trigger**: a new-file poll over the watched prefix — the same
  at-least-once firing semantics as the S3-event notification (an event
  can fire for a file the bookmark already saw; dedup is the BOOKMARK's
  job, not the trigger's). ``poll_once`` is cheap: one listing, no read.
* **crawler**: ``sources.inference.crawl`` — on re-crawl it updates the
  catalog entry additively and syncs newly appeared partitions.
* **job**: ``sources.incremental.IncrementalFileSource.run_once`` — the
  checkpointed file-source bookmark processes each input file exactly
  once, applies the transform, and hands micro-batches to the loader.
* **load**: any ``(batch_df, epoch_id)`` callable — typically
  ``StagedCopyWriter.foreach_batch`` (COPY) or
  ``UpsertWriter.foreach_batch_upsert`` (MERGE) from ``sinks``.

Scale posture: the loop itself is O(listing) per poll and stateless beyond
the checkpoint directory — restart-safe, no driver-side data. On a real
deployment the poll is replaced by the bus notification (S3 events, SQS),
and everything downstream is unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .sources.incremental import IncrementalFileSource
from .sources.inference import CatalogEntry, crawl


@dataclass
class WorkflowRun:
    """One fired workflow run's record (the reference's run-history row)."""

    run_id: int
    trigger_files: int  # files newly seen by the trigger poll
    batches: int        # micro-batches the job processed
    catalog: CatalogEntry | None


class FileTriggeredWorkflow:
    """on-new-files: re-crawl, run the incremental job, load.

    ``poll_once`` returns ``None`` when the trigger sees nothing new, else
    fires the workflow and returns its run record. Firing is deliberately
    at-least-once (a duplicate fire processes zero new files — the
    bookmark guarantees exactly-once per FILE, which is the invariant that
    matters); the trigger state is just "paths seen by a previous poll" and
    lives in memory — losing it causes one spurious fire, never data loss
    or double-processing.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        source_path: str,
        schema: T.StructType,
        checkpoint_dir: str,
        loader: Callable[[DataFrame, int], None],
        transform: Callable[[DataFrame], DataFrame] | None = None,
        fmt: str = "csv",
        path_glob: str | None = None,
        recrawl: bool = True,
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.name = name
        self.source_path = source_path
        self.fmt = fmt
        self.recrawl = recrawl
        self.transform = transform
        self.loader = loader
        self.source = IncrementalFileSource(
            spark,
            source_path,
            schema,
            checkpoint_dir,
            fmt=fmt,
            path_glob=path_glob,
            max_files_per_trigger=max_files_per_trigger,
        )
        self._seen: set[str] = set()
        self._runs = 0

    def _list_files(self) -> set[str]:
        found: set[str] = set()
        for root, _dirs, files in os.walk(self.source_path):
            for f in files:
                if not f.startswith((".", "_")):
                    found.add(os.path.join(root, f))
        return found

    def poll_once(self) -> WorkflowRun | None:
        """The trigger: fire the workflow iff the prefix grew."""
        current = self._list_files()
        new = current - self._seen
        if not new:
            return None
        self._seen = current
        return self.fire(trigger_files=len(new))

    def fire(self, trigger_files: int = 0) -> WorkflowRun:
        """crawler -> job -> load, unconditionally (the Lambda's start_run)."""
        entry = None
        if self.recrawl:
            entry = crawl(
                self.spark, self.name, self.source_path, fmt=self.fmt
            )
        batches = self.source.run_once(self.transform, self.loader)
        self._runs += 1
        return WorkflowRun(
            run_id=self._runs,
            trigger_files=trigger_files,
            batches=batches,
            catalog=entry,
        )

    def drain(self, max_polls: int = 100) -> list[WorkflowRun]:
        """Poll until quiescent (for backfills/tests): fire while new files
        keep appearing, stop at the first empty poll."""
        runs: list[WorkflowRun] = []
        for _ in range(max_polls):
            run = self.poll_once()
            if run is None:
                break
            runs.append(run)
        return runs
