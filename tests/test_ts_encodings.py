"""The events generator has shipped ``ts`` as parquet TIMESTAMP(NANOS)
(read as ns-longs under ``nanosAsLong``) in some rounds and TIMESTAMP(MICROS)
in others. Both encodings must canonicalize to the SAME microsecond values
through the batch loader AND the streaming source, so a generator flip can't
silently break the ten event/streaming queries again (round-2 regression).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from s3_glue_redshift_guide_spark.catalog import (
    canonical_ts_col,
    load_events,
    table_path,
)
from s3_glue_redshift_guide_spark.streaming.source import read_events_stream

from .conftest import SF_SMOKE

ENCODINGS = ("ns", "us")


def _reencoded_dir(tmp_path, unit: str) -> str:
    """Copy the smoke events table re-encoded with ts as timestamp[unit].

    pyarrow writes timestamp[ns] as parquet TIMESTAMP(NANOS), which Spark
    surfaces as a ns-long under ``nanosAsLong``; timestamp[us] round-trips
    as TIMESTAMP(MICROS) -> TIMESTAMP_NTZ.
    """
    t = pq.read_table(table_path(SF_SMOKE, "events"))
    i = t.schema.get_field_index("ts")
    t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp(unit)))
    d = tmp_path / f"events_{unit}"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _stream_rows(spark, sf_dir, tmp_path, tag):
    df = read_events_stream(spark, sf_dir)
    q = (
        df.writeStream.format("memory")
        .queryName(f"enc_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r["event_id"], r["ts"]) for r in spark.sql(f"SELECT * FROM enc_{tag}").collect()
    )


@pytest.mark.parametrize("unit", ENCODINGS)
def test_batch_loader_canonicalizes_both_encodings(spark, tmp_path, unit):
    want = sorted(
        (r["event_id"], r["ts"])
        for r in load_events(spark, SF_SMOKE).select("event_id", "ts").collect()
    )
    got_dir = _reencoded_dir(tmp_path, unit)
    df = load_events(spark, got_dir)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted((r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect())
    assert got == want


@pytest.mark.parametrize("unit", ENCODINGS)
def test_stream_source_matches_batch_for_both_encodings(spark, tmp_path, unit):
    sf_dir = _reencoded_dir(tmp_path, unit)
    got = _stream_rows(spark, sf_dir, tmp_path, unit)
    want = sorted(
        (r["event_id"], r["ts"])
        for r in load_events(spark, sf_dir).select("event_id", "ts").collect()
    )
    # stream ts is TIMESTAMP, batch is NTZ: same wall clock under UTC session tz
    assert [(i, ts.replace(tzinfo=None)) for i, ts in got] == want


def test_unexpected_ts_type_fails_loudly():
    with pytest.raises(TypeError, match="unexpected physical type"):
        canonical_ts_col("string")
