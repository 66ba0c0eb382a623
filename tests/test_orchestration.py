"""End-to-end workflow drive: the reference's trigger -> crawler -> job ->
load chain (README.md:155-166,171-202) against a DuckDB warehouse stand-in.

Three upload waves; each poll fires exactly one run, each file is loaded
exactly once (bookmark), the catalog entry tracks the growing partition
set, and a no-new-files poll does not fire.
"""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_glue_redshift_guide_spark.orchestration import FileTriggeredWorkflow
from s3_glue_redshift_guide_spark.sinks import DuckDBWarehouse, StagedCopyWriter


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_file_triggered_workflow_end_to_end(spark, tmp_path):
    src = str(tmp_path / "uploads")
    con = duckdb.connect()
    writer = StagedCopyWriter(str(tmp_path / "staging"), DuckDBWarehouse(con))

    wf = FileTriggeredWorkflow(
        spark,
        name="uploads_t",
        source_path=src,
        schema=SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=lambda df: df.withColumn("doubled", F.col("amount") * 2),
        loader=writer.foreach_batch("loaded"),
    )

    # wave 1: two files in one partition
    _write(f"{src}/dt=2024-01-01/a.csv", "id,amount\n1,10.0\n2,20.0\n")
    _write(f"{src}/dt=2024-01-01/b.csv", "id,amount\n3,30.0\n")
    run1 = wf.poll_once()
    assert run1 is not None and run1.trigger_files == 2 and run1.batches >= 1
    assert run1.catalog.partitions == [("2024-01-01",)]
    assert con.sql("SELECT count(*) FROM loaded").fetchall()[0][0] == 3
    assert con.sql(
        "SELECT sum(doubled) FROM loaded"
    ).fetchall()[0][0] == 120.0

    # idle poll: trigger must not fire
    assert wf.poll_once() is None

    # wave 2: a new partition appears
    _write(f"{src}/dt=2024-01-02/c.csv", "id,amount\n4,40.0\n")
    run2 = wf.poll_once()
    assert run2 is not None and run2.run_id == 2
    assert run2.catalog.partitions == [("2024-01-01",), ("2024-01-02",)]
    assert con.sql("SELECT count(*) FROM loaded").fetchall()[0][0] == 4

    # wave 3: drain() handles a multi-wave backlog, then quiesces
    _write(f"{src}/dt=2024-01-03/d.csv", "id,amount\n5,50.0\n")
    runs = wf.drain()
    assert len(runs) == 1
    assert con.sql("SELECT count(*) FROM loaded").fetchall()[0][0] == 5
    # exactly-once per file across every wave
    assert con.sql(
        "SELECT count(DISTINCT id), count(*) FROM loaded"
    ).fetchall()[0] == (5, 5)


def test_duplicate_fire_is_harmless(spark, tmp_path):
    """The trigger is at-least-once by design; a redundant fire() must load
    nothing new (bookmark-guarded)."""
    src = str(tmp_path / "up2")
    con = duckdb.connect()
    writer = StagedCopyWriter(str(tmp_path / "staging2"), DuckDBWarehouse(con))
    wf = FileTriggeredWorkflow(
        spark,
        name="uploads_t2",
        source_path=src,
        schema=SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        loader=writer.foreach_batch("loaded2"),
    )
    _write(f"{src}/dt=2024-01-01/a.csv", "id,amount\n1,10.0\n")
    wf.poll_once()
    n1 = con.sql("SELECT count(*) FROM loaded2").fetchall()[0][0]
    wf.fire()  # spurious event for an already-seen file
    n2 = con.sql("SELECT count(*) FROM loaded2").fetchall()[0][0]
    assert (n1, n2) == (1, 1)
