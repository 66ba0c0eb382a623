"""Driver-checkable REAL streaming runs (T5/T7/T10 evidence).

The `ev_*` event queries verify the streaming transforms through their
batch twins (identical plans minus state). The two queries here run the
actual Structured Streaming machinery inside the query callable — a
``readStream`` over the events parquet driven to completion with
``availableNow`` into a memory sink — and return the sink's contents as a
batch DataFrame, so the driver's oracle compare covers the stateful
execution path itself: watermark bookkeeping + stream-stream interval join
state (T10, which requires two-sided watermarks — T5), and the
applyInPandasWithState sessionizer (T7).

Determinism: availableNow over a static directory processes everything in
one micro-batch per source, so watermarks never drop rows (nothing is late
relative to a single batch) and the stateful sessionizer sees each key's
full, event-time-sorted history — output is a pure function of the input
files, which is what lets a SQL oracle exist at all. The late-arrival /
multi-batch behaviors stay covered by tests/test_streaming.py, where the
batch boundaries are controlled.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming.joins import interval_join_stream
from ..streaming.source import read_events_stream
from ..streaming.stateful import sessionize_stream
from .registry import query


def _drain_capped(df: DataFrame, tag: str, n_drains: int) -> DataFrame:
    """Drain an ADMISSION-CAPPED stream: under the Python-source
    availableNow fallback each start processes ONE capped batch, so a
    capped backlog drains by looping starts on the SAME checkpoint
    (the production catch-up shape). foreachBatch is the sink — the
    memory sink cannot recover from a checkpoint, foreachBatch can —
    and each epoch's rows accumulate driver-side (the same
    materialization the memory sink performs)."""
    ck = tempfile.mkdtemp(prefix=f"spark_ckpt_{tag}_")
    rows: list = []

    def _collect(batch_df: DataFrame, epoch_id: int) -> None:
        rows.extend(batch_df.collect())

    for _ in range(n_drains):
        q = (
            df.writeStream.foreachBatch(_collect)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return df.sparkSession.createDataFrame(rows, df.schema)


def _drain(df: DataFrame, tag: str) -> DataFrame:
    """Run a streaming frame to completion (availableNow) into a uniquely
    named memory sink; return the sink's contents."""
    name = f"strm_{tag}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix=f"spark_ckpt_{tag}_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@query(
    "ev_stream_interval_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id
    FROM events c JOIN events b
      ON b.user_id = c.user_id
     AND c.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= c.ts AND b.ts < c.ts + INTERVAL '10 minutes'
    """,
)
def ev_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join, executed AS A STREAM (T10, with the
    two-sided watermarks T5 requires): click->purchase attribution within
    10 minutes per user. The watermark + event-time bound let the state
    store evict buffered rows at the watermark horizon — state is bounded
    by (horizon x arrival rate) at any stream length, the property that
    makes this runnable on an unbounded production stream."""
    stream = read_events_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = stream.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    joined = interval_join_stream(
        clicks, buys, "user_id", "click_ts", "buy_ts", 0, 600
    )
    return _drain(joined, "ij").select("user_id", "click_id", "buy_id")


@query(
    "ev_stream_stateful_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 200
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), stats AS (
      SELECT user_id, sid,
             min(ts)             AS session_start,
             max(ts)             AS session_end,
             count(*)            AS n_events,
             round(sum(value),2) AS value_total
      FROM sessions GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events, value_total
    FROM stats
    WHERE sid < (SELECT max(sid) FROM stats s2 WHERE s2.user_id = stats.user_id)
    """,
)
def ev_stream_stateful_sessions(spark, sf_dir):
    """Custom stateful per-key processing, executed AS A STREAM (T7): the
    applyInPandasWithState gap sessionizer emits one row per CLOSED session
    (a session closes when the next event arrives more than the 5-minute
    gap later); each key's final session stays open in state at
    end-of-input. The oracle re-derives sessions with lag + running sum and
    keeps every session except each user's last — exactly the closed set.
    The user_id bound keeps the per-key Python path inside the gate budget
    at any scale factor (state per key is four scalars either way)."""
    stream = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 200)
    sessions = sessionize_stream(stream, gap_seconds=300)
    return _drain(sessions, "sess").select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        "value_total",
    )


@query(
    "ev_stream_dedup_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def ev_stream_dedup_watermark(spark, sf_dir):
    """Streaming dedup executed AS A STREAM via
    ``dropDuplicatesWithinWatermark`` (the Spark-3.5+ T6 operator): one
    surviving row per (user_id, event_type) key, with state entries
    expiring once the watermark passes ``event_ts + delay`` — unlike plain
    dropDuplicates-with-watermark, the key set itself is evicted, so state
    is bounded by (watermark horizon x key arrival rate) on an unbounded
    stream regardless of total key cardinality. Output projects ONLY the
    dedup keys, so the result is a pure function of the input (which
    duplicate row survives is an arrival-order artifact and is never
    exposed). availableNow processes everything in one micro-batch
    (watermark 0 during it), so exactly one row per key emits — the
    DISTINCT oracle."""
    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_type", "ts"
    )
    deduped = (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    return _drain(deduped, "ddw").select("user_id", "event_type")


@query(
    "src_stream_datasource",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderkey < 500
    """,
)
def src_stream_datasource(spark, sf_dir):
    """The snapshot log as a real Structured Streaming SOURCE through the
    Spark-4 Python DataSource API (`sources/pyds.py::SnapshotStreamReader`):
    ``spark.readStream.format("pysnapshot")`` treats VERSION NUMBERS as
    stream offsets — each micro-batch covers the versions committed since
    the checkpointed offset, its partitions are exactly the files those
    commits added (file-parallel executor reads, zero tasks when nothing
    is new), and exactly-once delivery comes from the engine's own
    offset/commit protocol rather than any consumer-side cursor. Two
    commits land before the availableNow run; the sink must hold exactly
    their union — the Delta-streaming-source shape for incremental
    lakehouse consumption (exactly-once across RESTARTS is pinned by
    tests/test_pyds.py with a persisted checkpoint)."""
    from ..catalog import load_table
    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="spark_strmds_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 499)).coalesce(1)
    )
    register_snapshot_source(spark)
    stream = (
        spark.readStream.format("pysnapshot")
        .schema("o_orderkey bigint")
        .option("root", t.root)
        .load()
    )
    return _drain(stream, "pysnap")


@query(
    "src_stream_change_feed",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey < 200)
    SELECT o_orderkey, price, 'insert' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM base
    UNION ALL
    SELECT o_orderkey, price, 'delete', 2 FROM base
    WHERE o_orderkey % 50 = 0
    UNION ALL
    SELECT o_orderkey, price, 'delete', 3 FROM base WHERE o_orderkey = 7
    UNION ALL
    SELECT o_orderkey, 0.00, 'insert', 3 FROM base WHERE o_orderkey = 7
    UNION ALL
    -- the batch per-commit feed (read_change_feed) replays the exact
    -- same multiset: every expected row appears twice in the result
    SELECT o_orderkey, price, 'insert' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM base
    UNION ALL
    SELECT o_orderkey, price, 'delete', 2 FROM base
    WHERE o_orderkey % 50 = 0
    UNION ALL
    SELECT o_orderkey, price, 'delete', 3 FROM base WHERE o_orderkey = 7
    UNION ALL
    SELECT o_orderkey, 0.00, 'insert', 3 FROM base WHERE o_orderkey = 7
    """,
)
def src_stream_change_feed(spark, sf_dir):
    """STREAMING change data feed through the registered connector (T19,
    Delta's ``readChangeFeed`` stream shape): a real ``readStream`` over
    the snapshot log where offsets are version numbers and each batch
    emits ROW-LEVEL changes — v1's append arrives as inserts, v2's
    deletion-vector DELETE as exactly the tombstoned pre-images (read
    straight from the sidecar diff, never a table diff), and v3's
    merge-on-read UPDATE as its delete/insert pair in one commit
    (``pyds.py::SnapshotChangeFeedStreamReader``). Every partition is an
    independent per-file executor read, so the feed costs O(churn) per
    poll; availableNow drains the backlog — in CAPPED 1-version
    micro-batches (maxVersionsPerTrigger admission control, T20) — and
    the memory sink must hold the exact multiset the SQL replay
    predicts; the batch per-commit feed (``read_change_feed``) is
    unioned in and must replay it identically."""
    from ..catalog import load_table
    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="spark_cdfstrm_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 200).coalesce(1))
    t.delete_where(F.col("o_orderkey") % 50 == 0)      # v2: DV delete
    t.update_where(F.col("o_orderkey") == 7, {"price": F.lit(0.0)})
    register_snapshot_source(spark)
    stream = (
        spark.readStream.format("pysnapshot")
        .schema(
            "o_orderkey bigint, price double, _change_type string, "
            "_commit_version bigint"
        )
        .option("root", t.root)
        .option("readChangeFeed", "true")
        # ADMISSION CONTROL under driver proof: the 3-version backlog
        # must drain in capped 1-version micro-batches (availableNow
        # loops until latestOffset stops advancing) and still deliver
        # the identical multiset — bootstrap on an existing table never
        # needs one all-of-history epoch
        .option("maxVersionsPerTrigger", "1")
        .load()
    )
    # round-9: the fresh-start admission fix makes the cap REAL under
    # the availableNow fallback — one capped batch per start, so the
    # 3-version backlog drains as three 1-version epochs on one
    # checkpoint (previously the first batch was silently uncapped)
    streamed = _drain_capped(
        stream, "cdf", t.current_version()
    ).select("o_orderkey", "price", "_change_type", "_commit_version")
    # the BATCH per-commit feed (SnapshotTable.read_change_feed) must
    # replay the exact same multiset — unioned in, so the oracle checks
    # both the streaming and the table-level CDF APIs in one row
    feed = t.read_change_feed(0).select(
        "o_orderkey", "price", "_change_type", "_commit_version"
    )
    return streamed.unionAll(feed)


@query(
    "ev_stream_outer_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id
    FROM events c LEFT JOIN events b
      ON b.user_id = c.user_id
     AND b.event_type = 'purchase'
     AND b.ts >= c.ts AND b.ts < c.ts + INTERVAL '10 minutes'
    WHERE c.event_type = 'click' AND c.user_id < 120
    """,
)
def ev_stream_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join, executed AS A STREAM
    (T10's outer half): clicks with no purchase within 10 minutes must
    emit with a NULL buy — the attribution-gap feed. Outer results may
    only emit once the GLOBAL watermark (the MIN across both sides)
    closes a left row's window, so this runs the real multi-trigger
    protocol an unbounded pipeline lives by: the corpus lands first,
    then far-future heartbeat events on BOTH sides advance the
    watermark, and a final trigger runs eviction — exactly how
    production streams flush outer state (idle-source heartbeats /
    Delta's watermark advancement). Three ``availableNow`` runs against
    ONE checkpoint chain the triggers; results accumulate via
    ``foreachBatch`` because outer rows surface across epochs. State
    stays bounded by (watermark horizon x arrival rate) at any stream
    length; value-exact against the batch LEFT JOIN."""
    import datetime as dt
    import os
    import tempfile

    from ..catalog import load_table
    from ..streaming.joins import interval_join_stream

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    src = tempfile.mkdtemp(prefix="spark_outer_src_")
    ck = tempfile.mkdtemp(prefix="spark_outer_ck_")
    corpus = ev.filter(
        F.col("user_id") < 120
    )
    corpus.write.mode("overwrite").parquet(os.path.join(src, "b0"))
    max_ts = corpus.agg(F.max("ts")).collect()[0][0]

    def sentinel(i: int, hours: int) -> None:
        far = max_ts + dt.timedelta(hours=hours)
        spark.createDataFrame(
            [(-1, far, "click", -1), (-1, far, "purchase", -1)],
            "user_id long, ts timestamp, event_type string, "
            "event_id long",
        ).write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))

    raw = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string, "
            "event_id long"
        )
        .parquet(os.path.join(src, "b*"))
    )
    clicks = raw.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = raw.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    joined = interval_join_stream(
        clicks, buys, "user_id", "click_ts", "buy_ts", 0, 600,
        watermark="30 minutes", how="leftOuter",
    ).select("user_id", "click_id", "buy_id")

    out: list[tuple] = []

    def sink(df, _epoch) -> None:
        out.extend(
            (r["user_id"], r["click_id"], r["buy_id"])
            for r in df.collect()
        )

    def run() -> None:
        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()  # corpus lands; windows still open
    sentinel(1, 2)
    run()  # watermark advances past every corpus window
    sentinel(2, 4)
    run()  # eviction trigger: unmatched clicks emit with NULL
    rows = [r for r in out if r[0] >= 0]  # drop heartbeat sentinels
    return spark.createDataFrame(
        rows, "user_id long, click_id long, buy_id long"
    )


@query(
    "ev_stream_full_outer_join",
    oracle="""
    SELECT coalesce(c.user_id, b.user_id) AS user_id,
           c.event_id AS click_id,
           b.event_id AS buy_id
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'click' AND user_id < 120) c
    FULL JOIN (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase' AND user_id < 120) b
      ON b.user_id = c.user_id
     AND b.ts >= c.ts AND b.ts < c.ts + INTERVAL '10 minutes'
    """,
)
def ev_stream_full_outer_join(spark, sf_dir):
    """Stream-stream FULL OUTER interval join, executed AS A STREAM
    (T23, T21's two-sided completion): clicks with no purchase within
    10 minutes emit with a NULL buy AND purchases never attributed to
    a click emit with a NULL click — both preserved sets of the
    attribution audit in one feed. The right-preserved rows carry a
    NULL left key, so the join surfaces ``coalesce(l.key, r.key)``
    (the one piece leftOuter never needs). Same real multi-trigger
    watermark-eviction protocol as T21: corpus first, then far-future
    heartbeats on both sides, then the eviction trigger; results
    accumulate across epochs via foreachBatch. State bounded by
    (watermark horizon x arrival rate); value-exact against the batch
    FULL JOIN."""
    import datetime as dt
    import os
    import tempfile

    from ..catalog import load_table
    from ..streaming.joins import interval_join_stream

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    src = tempfile.mkdtemp(prefix="spark_fouter_src_")
    ck = tempfile.mkdtemp(prefix="spark_fouter_ck_")
    corpus = ev.filter(F.col("user_id") < 120)
    corpus.write.mode("overwrite").parquet(os.path.join(src, "b0"))
    max_ts = corpus.agg(F.max("ts")).collect()[0][0]

    def sentinel(i: int, hours: int) -> None:
        far = max_ts + dt.timedelta(hours=hours)
        spark.createDataFrame(
            [(-1, far, "click", -1), (-1, far, "purchase", -1)],
            "user_id long, ts timestamp, event_type string, "
            "event_id long",
        ).write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))

    raw = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string, "
            "event_id long"
        )
        .parquet(os.path.join(src, "b*"))
    )
    clicks = raw.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = raw.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    joined = interval_join_stream(
        clicks, buys, "user_id", "click_ts", "buy_ts", 0, 600,
        watermark="30 minutes", how="fullOuter",
    ).select("user_id", "click_id", "buy_id")

    out: list[tuple] = []

    def sink(df, _epoch) -> None:
        out.extend(
            (r["user_id"], r["click_id"], r["buy_id"])
            for r in df.collect()
        )

    def run() -> None:
        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()  # corpus lands; windows still open
    sentinel(1, 2)
    run()  # watermark advances past every corpus window
    sentinel(2, 4)
    run()  # eviction: unmatched rows on BOTH sides emit with NULLs
    rows = [r for r in out if r[0] is not None and r[0] >= 0]
    return spark.createDataFrame(
        rows, "user_id long, click_id long, buy_id long"
    )


@query(
    "sink_sql_merge_stream",
    oracle="""
    SELECT k, status, src, 1 AS replay_noop FROM (
      SELECT o_orderkey AS k, o_orderstatus AS status, 'B1' AS src
      FROM orders WHERE o_orderkey < 1000
      UNION ALL
      SELECT o_orderkey, 'U2', 'B2' FROM orders
      WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
    """,
)
def sink_sql_merge_stream(spark, sf_dir):
    """Streaming sink through the WAREHOUSE-SQL surface (round 8,
    VERDICT-r7 directive #7): a real 2-epoch file-source stream drives
    a parameterized ``MERGE INTO`` statement per micro-batch through
    ``snapshot_sql`` (``streaming/sql_sink.py``) — the reference's
    "load the warehouse over SQL" posture in streaming mode. Epoch 2's
    keys collide with epoch 1's on [1000, 2000): the MERGE's matched
    branch must win (epoch-ordered upsert). A FORCED REPLAY of the
    last epoch (Structured Streaming redelivers the final batch after
    every restart) is then applied by hand: the banked txn watermark
    detects it and the table version must NOT move — exactly-once
    visible state, the same idempotence contract as the staged-COPY
    sink, now for SQL MERGE."""
    import os as _os

    from ..catalog import load_table as _lt
    from ..sources.snapshots import SnapshotTable
    from ..streaming.sql_sink import foreach_batch_merge_sql

    o = _lt(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="spark_sqlmerge_stream_")
    inbox = _os.path.join(base, "inbox")
    ckpt = _os.path.join(base, "ckpt")
    root = _os.path.join(base, "table")
    _os.makedirs(inbox)
    batch1 = o.filter(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.lit("B1").alias("src"),
    )
    batch2 = o.filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.lit("U2").alias("status"),
        F.lit("B2").alias("src"),
    )
    sink = foreach_batch_merge_sql(
        root,
        f"MERGE INTO pysnapshot.`{root}` AS t "
        "USING {batch} AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET status = s.status, src = s.src "
        "WHEN NOT MATCHED THEN INSERT *",
        app_id="sqlmerge_demo",
    )

    def _drain_once() -> None:
        q = (
            spark.readStream.schema(batch1.schema)
            .parquet(inbox)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1.coalesce(1).write.mode("append").parquet(inbox)
    _drain_once()
    batch2.coalesce(1).write.mode("append").parquet(inbox)
    _drain_once()
    t = SnapshotTable(spark, root)
    v_before = t.current_version()
    sink(batch2, 1)  # forced replay of the final epoch
    replay_noop = int(t.current_version() == v_before)
    return t.read().select(
        "k", "status", "src", F.lit(replay_noop).alias("replay_noop")
    )
