"""Canonical loaders for the driver's test tables.

The reference's "crawler" registers one table per S3 path in a catalog
(README.md:104,117); here the analogous surface is: load a Parquet table from
``{sf_dir}/{name}.parquet`` into a DataFrame with a *canonical* schema, and
optionally register it as a temp view for the SQL API.

Schema canonicalization handled here (and nowhere else, so every query sees
the same shape):

* ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Spark reads it as a
  long (ns since epoch) under ``nanosAsLong``; we convert to a microsecond
  TIMESTAMP_NTZ via integer division — the exact value DuckDB 1.x produces
  when it reads the same file (it truncates ns -> us). This keeps the
  correctness oracle byte-comparable on time columns.
* All other tables pass through untouched (``o_orderdate``/``l_shipdate``
  arrive as TIMESTAMP_NTZ already, matching DuckDB's naive TIMESTAMP).

At 100 TB these loaders are where partition discovery and predicate pushdown
start: they return *lazy* scans (no action is triggered), so Catalyst prunes
columns and pushes filters into the Parquet reader for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (they grow
# sub-linearly or not at all in TPC-H-style data).
BROADCAST_TABLES = ("region", "nation", "supplier")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def canonical_ts_col(ts_type: str, target: str = "timestamp_ntz"):
    """Column expression canonicalizing ``ts`` to microsecond precision.

    The driver's generator has shipped ``ts`` two ways across rounds:
    parquet TIMESTAMP(NANOS) (Spark reads a long under ``nanosAsLong``) and
    plain TIMESTAMP(MICROS) (Spark reads a timestamp directly). Handle both:
    longs are ns since epoch, converted with integer division (a double
    division would lose precision at ~1.7e18 ns magnitudes); timestamps pass
    through with a cast. Under the UTC session timezone the ``timestamp``
    and ``timestamp_ntz`` targets are wall-clock identical — batch loads
    target NTZ (byte-comparable with DuckDB's naive TIMESTAMP), the stream
    source targets TIMESTAMP because watermarks reject NTZ. Any other
    physical type (a generator flip to string/double) fails loudly here
    instead of silently casting to NULLs downstream.

    Shared by ``load_events`` and ``streaming.source.read_events_stream`` so
    the batch twin and the stream can never drift.
    """
    if ts_type == "bigint":  # ns since epoch (nanosAsLong)
        return F.timestamp_micros(F.expr("ts div 1000")).cast(target)
    if ts_type in ("timestamp", "timestamp_ntz"):
        return F.col("ts").cast(target)
    raise TypeError(
        f"events.ts has unexpected physical type {ts_type!r}; expected "
        "bigint (ns-as-long), timestamp or timestamp_ntz"
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` canonicalized to microsecond TIMESTAMP_NTZ — the
    exact value DuckDB 1.x reads from the same file (it truncates ns->us),
    keeping the correctness oracle byte-comparable on time columns."""
    configure(spark)
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    return raw.withColumn(
        "ts", canonical_ts_col(dict(raw.dtypes)["ts"], "timestamp_ntz")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` sees the same
    canonical schemas the DataFrame API does."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
