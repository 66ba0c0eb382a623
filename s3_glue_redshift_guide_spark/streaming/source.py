"""Streaming read of the events table (test/demo source).

In production the source is Kafka/Kinesis or a growing file prefix (the
reference's S3 landing zone); here the driver's events parquet stands in.
readStream needs a declared schema, so we sniff the parquet footer with a
zero-action batch read (schema-only, no job) and convert ``ts`` to the same
canonical microsecond value the batch catalog loader produces — batch twin
and stream see byte-identical rows, whether the file stores ns-longs or
native TIMESTAMP(MICROS) (the generator has shipped both across rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import canonical_ts_col, table_path
from ..session import configure


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks require TIMESTAMP (not NTZ); under the UTC session timezone
    # the wall-clock value matches the batch loader's NTZ exactly, and the
    # window transforms cast their outputs to NTZ for oracle parity.
    return raw.withColumn(
        "ts", canonical_ts_col(dict(raw.dtypes)["ts"], "timestamp")
    )
