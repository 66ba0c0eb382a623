"""S6/T1 — the job bookmark, made native.

The reference's only stateful construct: "the job remembers which inputs it
has processed; each run handles only new data" (README.md:145), kicked off
per-upload by the S3-event -> Lambda -> workflow chain (README.md:171-202).

Spark-native equivalent: the Structured Streaming **file source** with a
checkpoint. The checkpoint's file-source log IS the bookmark — exactly-once
per input file, resilient to restarts — and ``trigger(availableNow=True)``
turns the stream into a "process everything new, then stop" batch run, which
is precisely the semantics of one workflow run in the reference. The S3-event
prefix/suffix filter (README.md:197-198) maps to ``pathGlobFilter``.

Scale: the file-source log scales with file count, not bytes;
``maxFilesPerTrigger`` bounds per-run work so a backlog of years of files
drains in bounded micro-batches instead of one giant batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .csv_dialect import OPENCSV_DIALECT


class IncrementalFileSource:
    """Bookmark-incremental processing of a growing directory of files.

    Each ``run_once(transform, sink)`` call processes only files not seen by
    any prior run (tracked in ``checkpoint_dir``), applies ``transform`` to
    the batch DataFrame, and hands the result to ``sink`` — mirroring one
    crawler->job workflow run in the reference.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        checkpoint_dir: str,
        fmt: str = "csv",
        path_glob: str | None = None,
        header: bool = True,
        max_files_per_trigger: int | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.schema = schema
        self.checkpoint_dir = checkpoint_dir
        self.fmt = fmt
        self.path_glob = path_glob
        self.header = header
        self.max_files_per_trigger = max_files_per_trigger

    def _stream(self) -> DataFrame:
        reader = self.spark.readStream.format(self.fmt).schema(self.schema)
        if self.fmt == "csv":
            reader = reader.options(**OPENCSV_DIALECT).option(
                "header", str(self.header).lower()
            )
        if self.path_glob:
            reader = reader.option("pathGlobFilter", self.path_glob)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        return reader.load(self.path)

    def run_once(
        self,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        sink: Callable[[DataFrame, int], None] | None = None,
    ) -> int:
        """Process all currently-unseen files; returns number of micro-batches.

        ``sink(batch_df, epoch_id)`` runs per micro-batch via ``foreachBatch``
        (the streaming-native place for a JDBC/COPY warehouse load, §sinks).
        """
        df = self._stream()
        if transform is not None:
            df = transform(df)

        batches = {"n": 0}

        def _sink(batch_df: DataFrame, epoch_id: int) -> None:
            batches["n"] += 1
            if sink is not None:
                sink(batch_df, epoch_id)

        q = (
            df.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batches["n"]
