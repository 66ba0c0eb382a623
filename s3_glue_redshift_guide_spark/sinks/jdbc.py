"""S8 — JDBC sink with auto table creation.

The reference's job target is "JDBC" with "Create tables in your data
target" (README.md:134-138,150). Spark's built-in JDBC writer already
creates the table from the DataFrame schema on ``overwrite``/first
``append`` — this wrapper just pins the scale-relevant options.

Scale: row-by-row INSERT over JDBC is the slow path at warehouse scale —
``batchsize`` and ``numPartitions`` bound concurrency/round-trips, but the
real 100 TB answer is the staged COPY writer (warehouse_copy.py), exactly
why the reference keeps an S3 temp dir (README.md:146).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Write ``df`` to a JDBC table, creating it if absent.

    ``num_partitions`` caps concurrent connections (a 1000-executor cluster
    must not open 1000 warehouse connections); ``batch_size`` amortizes
    round-trips.
    """
    writer = df
    if num_partitions is not None:
        # coalesce never increases partition count, so this is the cap
        # directly — no RDD-lineage detour to read the current count
        writer = df.coalesce(num_partitions)
    opts = dict(properties or {})
    opts["batchsize"] = str(batch_size)
    writer.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**opts).save()
