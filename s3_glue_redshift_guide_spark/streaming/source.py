"""Streaming read of the events table (test/demo source).

In production the source is Kafka/Kinesis or a growing file prefix (the
reference's S3 landing zone); here the driver's events parquet stands in.
The parquet file stores ns timestamps, so the declared schema reads ``ts``
as long (under nanosAsLong) and the stream converts to the same canonical
microsecond TIMESTAMP_NTZ the batch catalog loader produces — batch twin
and stream see byte-identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..session import configure

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns since epoch (nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks require TIMESTAMP (not NTZ); under the UTC session timezone
    # the wall-clock value matches the batch loader's NTZ exactly, and the
    # window transforms cast their outputs to NTZ for oracle parity.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
