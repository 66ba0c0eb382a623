"""Sink-side semantics exposed as oracle-checked queries.

The staged COPY / warehouse upsert machinery (sinks/upsert.py,
sinks/warehouse_copy.py) is exercised end-to-end in pytest (it needs a
warehouse connection); the MERGE *semantics* — SCD1 "updates win on key
collision, latest version wins within the batch" — are engine-side pure
DataFrame logic, so they register here with a plain SQL oracle.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..sinks.upsert import merge_dataframes
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "sink_scd1_merge",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 2000),
    upd AS (
      SELECT o_orderkey, 'U2' AS o_orderstatus FROM orders
      WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
    SELECT o_orderkey, o_orderstatus FROM target
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM upd
    """,
)
def sink_scd1_merge(spark, sf_dir):
    """SCD1 MERGE semantics (reference's warehouse-load UPSERT path): the
    updates batch deliberately carries TWO rows per key (versions 1 and 2,
    the reprocessed-partition case); version_col dedup keeps v2, the
    anti-join drops collided target rows, updates insert. Output is the
    post-merge table — one row per key, updates win, latest version wins."""
    o = _t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", "o_orderstatus", F.lit(0).alias("v")
    )
    base = o.filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000)
    ).select("o_orderkey")
    updates = base.select(
        "o_orderkey", F.lit("U1").alias("o_orderstatus"), F.lit(1).alias("v")
    ).unionByName(
        base.select(
            "o_orderkey", F.lit("U2").alias("o_orderstatus"), F.lit(2).alias("v")
        )
    )
    merged = merge_dataframes(target, updates, ["o_orderkey"], version_col="v")
    return merged.select("o_orderkey", "o_orderstatus")


@query(
    "sink_bucketed_readback",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)        AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           8 AS n_buckets, 1 AS all_sorted, 0 AS split_keys
    FROM orders
    """,
)
def sink_bucketed_readback(spark, sf_dir):
    """Bucketed+sorted parquet sink round-trip (SURVEY §2 S11/O2): write
    ``orders`` bucketed by ``o_orderkey`` into 8 sorted buckets, read the
    table back, and emit derived facts the oracle can mirror from the source
    table: total rows and key-sum (content survived the round trip), bucket
    count parsed from the physical file names (layout is exactly 8 buckets),
    a per-file sortedness flag (``sortBy`` held on disk) and the number of
    keys spanning >1 bucket (bucketing is disjoint — the precondition for
    shuffle-free co-located joins, asserted separately in
    ``tests/test_bucketing.py``). Sortedness is judged on the parquet
    ``_metadata.row_index`` hidden column — the row's position WITHIN its
    file — which is stable however FileSourceScan bin-packs or splits the
    files into read partitions (``monotonically_increasing_id`` is not:
    a file bigger than ``maxPartitionBytes`` splits into several read
    partitions whose ordering follows bin-packing, not file offset).

    Scale note: the frame is repartitioned on the bucket column before the
    write — Spark's ``repartition(n, col)`` and its native bucketing use the
    same murmur3-pmod mapping, so every task owns exactly one bucket and
    writes exactly ONE file: no task-count × bucket-count small-file blowup
    at 1000 executors."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tbl = f"sink_bucket_rt_{uuid.uuid4().hex[:8]}"
    path = tempfile.mkdtemp(prefix="spark_bucket_rt_")
    (
        o.repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(tbl)
    )
    t = spark.table(tbl).select(
        "o_orderkey",
        # bucket id is encoded in the file name: part-00000-<uuid>_00003.c000
        F.regexp_extract(F.input_file_name(), r"_(\d{5})\.c000", 1).alias("bucket"),
        F.input_file_name().alias("f"),
        F.col("_metadata.row_index").alias("ridx"),
    )
    # row_index is the row's offset within its parquet file — split-stable,
    # so lag() over it detects any out-of-order neighbour within a file
    # even when a file spans several read partitions
    w = Window.partitionBy("f").orderBy("ridx")
    rows = t.withColumn("prev", F.lag("o_orderkey").over(w))
    facts = rows.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.countDistinct("bucket").cast("int").alias("n_buckets"),
        (
            F.sum(F.when(F.col("prev") > F.col("o_orderkey"), 1).otherwise(0)) == 0
        )
        .cast("int")
        .alias("all_sorted"),
    )
    split = (
        t.groupBy("o_orderkey")
        .agg(F.countDistinct("bucket").alias("nb"))
        .agg(F.sum((F.col("nb") > 1).cast("int")).cast("int").alias("split_keys"))
    )
    return facts.crossJoin(split).select(
        "n_rows", "key_sum", "n_buckets", "all_sorted", "split_keys"
    )


# ----------------------------------------------------------------- S8 ----
@query(
    "sink_jdbc_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def sink_jdbc_roundtrip(spark, sf_dir):
    """JDBC sink with auto table creation (S8), driven end-to-end in-gate:
    ``nation`` written through ``sinks/jdbc.py::write_jdbc`` into an
    embedded Derby database (in the Spark JVM classpath — the sandbox's
    warehouse stand-in, same JDBC writer path as a Redshift URL), then
    read back over JDBC. ``overwrite`` must create the table from the
    DataFrame schema; values must survive the hop. ``num_partitions=2``
    exercises the connection cap (a 1000-executor cluster must not open
    1000 warehouse connections)."""
    from ..sinks.jdbc import write_jdbc

    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    url = f"jdbc:derby:memory:sinkq_{uuid.uuid4().hex[:8]};create=true"
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(n, url, "nation_rt", mode="overwrite", properties=props,
               num_partitions=2)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_rt")
        .options(**props)
        .load()
    )
    return back.select(
        F.col("n_nationkey").cast("int"),
        "n_name",
        F.col("n_regionkey").cast("int"),
    )


# ----------------------------------------------------------- T9 + MERGE --
@query(
    "sink_scd1_stream",
    oracle="""
    SELECT o_orderkey, o_orderstatus, 'B1' AS src
    FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, 'U2' AS o_orderstatus, 'B2' AS src
    FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000
    """,
)
def sink_scd1_stream(spark, sf_dir):
    """Streaming SCD1 upsert, executed AS A STREAM (T9 foreachBatch + the
    MERGE path): two REAL micro-batches with conflicting keys flow through
    ``UpsertWriter.foreach_batch_upsert`` into a DuckDB warehouse (the
    Redshift stand-in — staged parquet + one DELETE USING + INSERT
    transaction per epoch, no rows through the driver). Batch order is
    pinned by the file-source bookmark: file 1 lands, the stream drains
    (availableNow); file 2 lands, the stream resumes from the SAME
    checkpoint and processes only the new file. Keys [1000, 2000) collide
    across batches — the updates batch must win, proving epoch-ordered
    upsert (and, because a retried epoch re-upserts the same keys,
    exactly-once visible state)."""
    import os

    import duckdb

    from ..sinks.upsert import DuckDBUpsertWarehouse, UpsertWriter

    o = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="spark_scd1_stream_")
    inbox, ckpt = os.path.join(base, "inbox"), os.path.join(base, "ckpt")
    os.makedirs(inbox)

    batch1 = o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", "o_orderstatus", F.lit("B1").alias("src")
    )
    batch2 = o.filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000)
    ).select(
        "o_orderkey", F.lit("U2").alias("o_orderstatus"),
        F.lit("B2").alias("src")
    )

    con = duckdb.connect()
    writer = UpsertWriter(
        os.path.join(base, "staging"), DuckDBUpsertWarehouse(con)
    )
    sink = writer.foreach_batch_upsert("orders_scd1", ["o_orderkey"])

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

    pdf = con.sql(
        "SELECT o_orderkey, o_orderstatus, src FROM orders_scd1"
    ).df()
    return spark.createDataFrame(pdf).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus", "src"
    )


# ------------------------------------------------------------- Z-ORDER ---
from ..operators.zorder import sql_z_query, write_zordered, z_order_key  # noqa: E402


@query(
    "sink_zorder_layout",
    oracle=sql_z_query("orders", "o_custkey", "o_orderkey"),
)
def sink_zorder_layout(spark, sf_dir):
    """Z-order layout round trip (the multi-column-pruning sink): orders
    written along the Morton curve of (o_custkey, o_orderkey) via
    ``operators/zorder.py::write_zordered`` (range-normalize both columns,
    range-partition + sort on the interleaved key), read back, and every
    row's z-value recomputed — the oracle mirrors the normalization and
    bit-spreading arithmetic in SQL, so round-trip fidelity AND the
    Morton transform are hash-checked bit-exact. The pruning payoff
    (files admitting a filter value in EITHER dimension shrink from
    all-files to a curve-local subset) is asserted on footer-stat ranges
    in tests/test_zorder.py."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    path = tempfile.mkdtemp(prefix="spark_zorder_")
    write_zordered(o, path, "o_custkey", "o_orderkey", n_files=8)
    back = spark.read.parquet(path)
    return z_order_key(back, "o_custkey", "o_orderkey").select(
        "o_orderkey", "o_custkey", F.col("__z").alias("zval")
    )


# ------------------------------------------------------------ CDC / SCD2 --
@query(
    "sink_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS v, 'I' AS op, o_orderstatus AS status
      FROM orders WHERE o_orderkey < 2000
      UNION ALL
      SELECT o_orderkey, 2, 'U', 'UU' FROM orders
      WHERE o_orderkey >= 1000 AND o_orderkey < 1500
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL FROM orders
      WHERE o_orderkey >= 500 AND o_orderkey < 1000
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL FROM orders
      WHERE o_orderkey >= 1200 AND o_orderkey < 1300),
    latest AS (
      SELECT k, op, status,
             row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
      FROM log)
    SELECT k AS o_orderkey, status AS o_orderstatus
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def sink_cdc_apply(spark, sf_dir):
    """CDC log compaction (the step before every warehouse merge): an
    insert/update/delete log synthesized from orders — inserts for keys
    <2000, v2 updates for [1000,1500), v3 deletes for [500,1000) and
    [1200,1300) — collapses to final state via one per-key window over
    the LOG (never the target table). Deletes must erase keys even when
    an update preceded them; updates must win over their inserts."""
    from ..sinks.upsert import apply_cdc

    o = load_table(spark, sf_dir, "orders")

    def slice_(lo, hi, v, op, status):
        s = o.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).select(
            F.col("o_orderkey").alias("k"),
            F.lit(v).alias("v"),
            F.lit(op).alias("op"),
            status.alias("status"),
        )
        return s

    log = (
        slice_(0, 2000, 1, "I", F.col("o_orderstatus"))
        .unionByName(slice_(1000, 1500, 2, "U", F.lit("UU")))
        .unionByName(slice_(500, 1000, 3, "D", F.lit(None).cast("string")))
        .unionByName(slice_(1200, 1300, 3, "D", F.lit(None).cast("string")))
    )
    return apply_cdc(log, ["k"], "v").select(
        F.col("k").alias("o_orderkey"), F.col("status").alias("o_orderstatus")
    )


@query(
    "sink_scd2_history",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS v, o_orderstatus AS status
      FROM orders WHERE o_orderkey < 1500
      UNION ALL
      SELECT o_orderkey, 2, 'S2' FROM orders
      WHERE o_orderkey >= 500 AND o_orderkey < 1500
      UNION ALL
      SELECT o_orderkey, 3, 'S3' FROM orders
      WHERE o_orderkey >= 1000 AND o_orderkey < 1500)
    SELECT k AS o_orderkey, status AS o_orderstatus,
           v AS valid_from,
           lead(v) OVER (PARTITION BY k ORDER BY v) AS valid_to,
           CAST(lead(v) OVER (PARTITION BY k ORDER BY v) IS NULL AS INTEGER)
             AS is_current
    FROM log
    """,
)
def sink_scd2_history(spark, sf_dir):
    """SCD type-2 history build: a three-wave versioned change log turns
    into validity intervals — valid_from/valid_to chain per key with
    exactly one current row (one window pass per key; the
    dimension-history table every warehouse load maintains). Keys <500
    have one version, [500,1000) two, [1000,1500) three."""
    from ..sinks.upsert import scd2_history

    o = load_table(spark, sf_dir, "orders")

    def wave(lo, hi, v, status):
        return o.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).select(
            F.col("o_orderkey").alias("k"),
            F.lit(v).alias("v"),
            status.alias("status"),
        )

    log = (
        wave(0, 1500, 1, F.col("o_orderstatus"))
        .unionByName(wave(500, 1500, 2, F.lit("S2")))
        .unionByName(wave(1000, 1500, 3, F.lit("S3")))
    )
    return scd2_history(log, ["k"], "v").select(
        F.col("k").alias("o_orderkey"),
        F.col("status").alias("o_orderstatus"),
        F.col("valid_from"),
        F.col("valid_to"),
        F.col("is_current"),
    )


@query(
    "join_scd2_pointintime",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS v, o_orderstatus AS status
      FROM orders WHERE o_orderkey < 1500
      UNION ALL
      SELECT o_orderkey, 2, 'S2' FROM orders
      WHERE o_orderkey >= 500 AND o_orderkey < 1500
      UNION ALL
      SELECT o_orderkey, 3, 'S3' FROM orders
      WHERE o_orderkey >= 1000 AND o_orderkey < 1500),
    hist AS (
      SELECT k, v AS valid_from,
             lead(v) OVER (PARTITION BY k ORDER BY v) AS valid_to,
             status
      FROM log),
    probes AS (
      SELECT o_orderkey AS k, 1 + o_orderkey % 3 AS as_of
      FROM orders WHERE o_orderkey < 1500)
    SELECT p.k AS o_orderkey, p.as_of,
           h.status AS o_orderstatus, h.valid_from
    FROM probes p JOIN hist h
      ON p.k = h.k AND p.as_of >= h.valid_from
     AND (h.valid_to IS NULL OR p.as_of < h.valid_to)
    """,
)
def join_scd2_pointintime(spark, sf_dir):
    """SCD2 point-in-time lookup (the READ path of the SCD2 story): the
    same three-wave change log as ``sink_scd2_history`` becomes validity
    intervals, and a probe set asking "what was the status at version
    1/2/3?" (as_of = 1 + key % 3) joins against them — an equi-join on
    the dimension key with the interval test as a residual filter, so
    per-key fan-out is the SCD depth (<= 3 here) and the plan never
    nested-loops. Probes at as_of 2-3 for keys that only ever had v1 must
    resolve to the v1 row (open-ended current interval); every probe key
    resolves to EXACTLY one version — uniqueness is implied by the
    value-hash gate (row count == probe count)."""
    from ..sinks.upsert import scd2_history, scd2_pointintime

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1500)

    def wave(lo, hi, v, status):
        return o.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        ).select(
            F.col("o_orderkey").alias("k"),
            F.lit(v).alias("v"),
            status.alias("status"),
        )

    log = (
        wave(0, 1500, 1, F.col("o_orderstatus"))
        .unionByName(wave(500, 1500, 2, F.lit("S2")))
        .unionByName(wave(1000, 1500, 3, F.lit("S3")))
    )
    hist = scd2_history(log, ["k"], "v").select(
        "k", "valid_from", "valid_to", "status"
    )
    probes = o.select(
        F.col("o_orderkey").alias("k"),
        (F.lit(1) + F.col("o_orderkey") % 3).cast("int").alias("as_of"),
    )
    return scd2_pointintime(hist, probes, ["k"], "as_of").select(
        F.col("k").alias("o_orderkey"),
        "as_of",
        F.col("status").alias("o_orderstatus"),
        "valid_from",
    )


# -------------------------------------- streaming → snapshot table -----
@query(
    "sink_snapshot_stream",
    oracle="""
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderkey < 800) AS v1_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderkey < 1600) AS v2_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM orders
            WHERE o_orderkey < 1600) AS v2_sum,
           CAST(2 AS BIGINT) AS n_versions
    """,
)
def sink_snapshot_stream(spark, sf_dir):
    """Streaming lakehouse ingest (T9 composed with the snapshot layer):
    each micro-batch commits as ONE atomic snapshot version — foreachBatch
    calls ``SnapshotTable.commit_append``, so readers see whole batches or
    nothing, and every historical batch boundary stays addressable by
    version. Two real micro-batches flow through a file-source stream
    (epoch order pinned by the checkpoint bookmark, as in
    ``sink_scd1_stream``); the facts pin per-version row counts, the
    final content sum, and the version count — time travel to v1 returns
    exactly batch 1 even after batch 2 landed."""
    import os

    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="spark_snapstream_")
    inbox, ckpt = os.path.join(base, "inbox"), os.path.join(base, "ckpt")
    os.makedirs(inbox)
    table = SnapshotTable(spark, os.path.join(base, "table"))

    batch1 = o.filter(F.col("o_orderkey") < 800).select("o_orderkey")
    batch2 = o.filter(
        (F.col("o_orderkey") >= 800) & (F.col("o_orderkey") < 1600)
    ).select("o_orderkey")

    def commit_batch(df, _epoch):
        table.commit_append(df)

    def _drain_once() -> None:
        q = (
            spark.readStream.schema(batch1.schema)
            .parquet(inbox)
            .writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1.coalesce(1).write.mode("append").parquet(inbox)
    _drain_once()
    batch2.coalesce(1).write.mode("append").parquet(inbox)
    _drain_once()

    return (
        table.read(1)
        .agg(F.count(F.lit(1)).alias("v1_rows"))
        .crossJoin(
            table.read(2).agg(
                F.count(F.lit(1)).alias("v2_rows"),
                F.sum("o_orderkey").cast("long").alias("v2_sum"),
            )
        )
        .withColumn(
            "n_versions", F.lit(table.current_version()).cast("long")
        )
    )


@query(
    "sink_snapshot_merge",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey >= 600 AND o_orderkey < 700 THEN 'UU'
                ELSE o_orderstatus END AS status
    FROM orders
    WHERE o_orderkey < 2000
      AND NOT (o_orderkey >= 1200 AND o_orderkey < 1300)
    UNION ALL
    SELECT o_orderkey, 'NEW' FROM orders
    WHERE o_orderkey >= 2000 AND o_orderkey < 2100
    """,
)
def sink_snapshot_merge(spark, sf_dir):
    """Full MERGE into the snapshot table (the Delta MERGE shape, composed
    from this repo's parts): the seed lands as four key-range files; a
    CDC log (updates [600,700), deletes [1200,1300), inserts [2000,2100))
    locates its affected files through the per-file min/max index — an
    interval join of LOG KEYS against FILE RANGES, pure metadata — and
    only those two files rewrite through ``apply_cdc`` (base rows ride as
    version-0 inserts, the log wins per key, winning deletes erase);
    inserts land in the new commit's files. The two untouched files keep
    byte identity (asserted in tests/test_snapshots.py). Work is
    O(affected files + log), never O(table); the oracle re-derives the
    final table state row-for-row."""
    from ..operators.dataskip import file_stats_index
    from ..sinks.upsert import apply_cdc
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("status")
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="spark_snapmerge_"))
    for lo in range(0, 2000, 500):
        t.commit_append(
            o.filter((F.col("k") >= lo) & (F.col("k") < lo + 500)).coalesce(1)
        )

    def slice_(lo, hi, v, op, status):
        return o.filter((F.col("k") >= lo) & (F.col("k") < hi)).select(
            "k", F.lit(v).alias("v"), F.lit(op).alias("op"),
            status.alias("status"),
        )

    log = (
        slice_(600, 700, 1, "U", F.lit("UU"))
        .unionByName(slice_(1200, 1300, 1, "D", F.lit(None).cast("string")))
        .unionByName(slice_(2000, 2100, 1, "I", F.lit("NEW")))
    )

    # affected files: interval join of log keys x per-file key ranges —
    # metadata scale (|files| rows), exactly Delta's touched-file pass
    index = file_stats_index(t.read(), ["k"])
    hit = (
        log.select("k")
        .join(
            F.broadcast(index.select("file", "min_k", "max_k")),
            (F.col("k") >= F.col("min_k")) & (F.col("k") <= F.col("max_k")),
        )
        .select("file")
        .distinct()
    )
    affected = [r["file"].removeprefix("file://") for r in hit.collect()]

    base_rows = (
        spark.read.parquet(*affected)
        .select("k", F.lit(0).alias("v"), F.lit("I").alias("op"), "status")
        if affected
        else log.limit(0)
    )
    merged = apply_cdc(base_rows.unionByName(log), ["k"], "v").select(
        "k", "status"
    )
    t.commit_replace(affected, merged)
    return t.read().select(F.col("k").alias("o_orderkey"), "status")


@query(
    "sink_snapshot_optimize",
    oracle="""
    SELECT CAST(9 AS BIGINT) AS n_files_before,
           CAST(8 AS BIGINT) AS n_small,
           CAST(2 AS BIGINT) AS n_files_after,
           CAST(1 AS BIGINT) AS n_untouched,
           CAST(count(*) AS BIGINT) AS rows_after,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    """,
)
def sink_snapshot_optimize(spark, sf_dir):
    """Transactional OPTIMIZE of a snapshot table (Delta's
    compaction-as-a-commit): eight drip-fed small commits (~0.5% of
    orders each, the streaming-ingest pathology) plus one large commit;
    ``optimize_small_files`` plans from file-size METADATA alone,
    bin-packs only the eight small files, and swaps them in ONE
    commit_replace — the large file keeps byte identity (asserted via
    manifest intersection) and the pre-OPTIMIZE version stays readable.
    The size threshold derives from the observed sizes (midpoint), so the
    small/large split is scale-factor independent. Row content after =
    exactly the full orders table, value-checked."""
    import os as _os

    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="spark_snapopt_"))
    small_pred = (F.col("o_orderkey") % 100) < 4
    for i in range(8):
        t.commit_append(
            o.filter(small_pred & (F.col("o_orderkey") % 8 == i)).coalesce(1)
        )
    t.commit_append(o.filter(~small_pred).coalesce(1))
    before = t._load_manifest(t.current_version())
    sizes = [_os.path.getsize(f) for f in before]
    threshold = (min(sizes) + max(sizes)) // 2
    facts = t.optimize_small_files(threshold, target_bytes=1 << 30)
    after = set(t._load_manifest(facts["version"]))
    n_untouched = len(set(before) & after)
    return t.read().agg(
        F.lit(facts["n_files_before"]).cast("long").alias("n_files_before"),
        F.lit(facts["n_small"]).cast("long").alias("n_small"),
        F.lit(facts["n_files_after"]).cast("long").alias("n_files_after"),
        F.lit(n_untouched).cast("long").alias("n_untouched"),
        F.count(F.lit(1)).alias("rows_after"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


# ------------------- merge-on-read UPDATE (DV + reinsert) --------------
@query(
    "sink_snapshot_update_mor",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey < 600
    """,
)
def sink_snapshot_update_mor(spark, sf_dir):
    """UPDATE as ONE merge-on-read commit
    (``sources/snapshots.py::update_where``): matched rows tombstone via
    a deletion-vector sidecar AND their post-images land in the commit's
    new files — a single atomic manifest publish, so readers see pre- or
    post-state, never a torn mix. This completes the DV write family:
    DELETE (``src_deletion_vector``), UPDATE (here), with copy-on-write
    MERGE (``sink_snapshot_merge``) as the bulk path. Cost is O(matched
    rows) sidecar + a write of only the matched rows; at 100 TB a
    10%-of-one-file UPDATE stops costing a full file rewrite. The +1000.0
    assignment is IEEE-exact at these magnitudes, so the row-level oracle
    (CASE over the source) is bit-exact. Untouched base files keep byte
    identity (asserted in tests/test_snapshots.py); history keeps the
    pre-images and the change feed reports the delete/insert pair."""
    from ..sources.snapshots import SnapshotTable

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="spark_mor_upd_"))
    for lo, hi in ((0, 199), (200, 399), (400, 599)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    t.update_where(
        F.col("o_orderkey") % 10 == 3,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1000.0)},
    )
    return t.read().select("o_orderkey", "o_totalprice")


@query(
    "sink_connector_clustered_write",
    oracle="""
    WITH laid AS (
      SELECT n_nationkey, n_name, n_regionkey FROM nation)
    SELECT (SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT) FROM laid)
             AS n_files,
           1 AS stats_tight, 1 AS pruned_to_one,
           (SELECT CAST(count(*) AS BIGINT) FROM laid
             WHERE n_regionkey = 2) AS n_rows_region2,
           (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM laid
             WHERE n_regionkey = 2) AS key_sum_region2
    """,
)
def sink_connector_clustered_write(spark, sf_dir):
    """Write-side CLUSTERING through the connector (the layout control a
    large ingest needs on its FIRST write, not a separate OPTIMIZE pass
    later): ``.option("splitBy", col)`` makes each task emit one file
    PER DISTINCT VALUE of the column — here nation pre-repartitioned by
    region lands as exactly one file per region, every file's banked
    zone-map range for the split column collapses to a point
    (``stats_tight``: min == max in every file's manifest stats), and a
    region-equality read through the connector plans ONE partition
    (``pruned_to_one``, via the reader's own pushFilters→partitions
    planner). At 100 TB: ingest clustering is free at write time —
    vectorized pyarrow batch splits, no extra shuffle beyond the
    repartition the writer already does — where a post-hoc OPTIMIZE
    rewrite costs a full pass over the data
    (`sources/pyds.py::SnapshotDataWriter._split_batches`)."""
    from pyspark.sql.datasource import EqualTo

    from ..sources.pyds import (
        SnapshotManifestReader,
        register_snapshot_source,
    )
    from ..sources.snapshots import SnapshotTable, load_manifest

    register_snapshot_source(spark)
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    root = tempfile.mkdtemp(prefix="spark_splitby_")
    (
        n.repartition("n_regionkey")
        .write.format("pysnapshot")
        .option("root", root)
        .option("statsCols", "n_regionkey")
        .option("splitBy", "n_regionkey")
        .mode("append")
        .save()
    )
    t = SnapshotTable(spark, root)
    m = load_manifest(root, t.current_version())
    tight = int(
        all(
            st.get("n_regionkey")
            and st["n_regionkey"][0] == st["n_regionkey"][1]
            for st in m["stats"].values()
        )
    )
    r = SnapshotManifestReader({"root": root})
    r.pushFilters([EqualTo(("n_regionkey",), 2)])
    pruned = int(len(r.partitions()) == 1)
    got = (
        spark.read.format("pysnapshot")
        .option("root", root)
        .load()
        .where("n_regionkey = 2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").cast("long").alias("s"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [(len(m["files"]), tight, pruned, got["n"], got["s"])],
        "n_files bigint, stats_tight int, pruned_to_one int, "
        "n_rows_region2 bigint, key_sum_region2 bigint",
    )


@query(
    "sink_snapshot_merge_mor",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey < 400),
    s AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) - 500
               AS price_cents
      FROM orders WHERE o_orderkey BETWEEN 200 AND 599)
    SELECT o_orderkey, price_cents FROM t
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
    UNION ALL
    SELECT t.o_orderkey, s.price_cents FROM t JOIN s USING (o_orderkey)
    WHERE t.o_orderkey % 10 <> 0
    UNION ALL
    SELECT o_orderkey, price_cents FROM s
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM t)
    """,
)
def sink_snapshot_merge_mor(spark, sf_dir):
    """Three-branch MERGE INTO as ONE merge-on-read commit (Delta's
    MERGE executed with deletion vectors, `snapshots.py::merge_mor`):
    matched rows divisible by 10 DELETE, other matched rows UPDATE to
    the source's discounted price (integer cents — double rounding
    tie-breaks diverge between engines), unmatched source rows INSERT — all
    three branches land in a single atomic manifest (tombstone sidecar
    + post-image/insert files), so a reader sees the whole merge or
    none of it, and the pre-merge snapshot remains readable (time
    travel = the audit trail). Cost is O(matched + inserted rows);
    copy-on-write MERGE would rewrite every FILE containing a match —
    at 100 TB the difference between KBs of sidecar and rewriting the
    table. The oracle reconstructs the exact post-merge multiset with
    anti/inner/anti joins."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="spark_mmor_"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    t.commit_append(
        o.filter(F.col("o_orderkey") < 400)
        .select("o_orderkey", cents.alias("price_cents"))
        .coalesce(1)
    )
    src = (
        o.filter(F.col("o_orderkey").between(200, 599))
        .select(
            "o_orderkey", (cents - 500).alias("price_cents")
        )
    )
    t.merge_mor(
        src,
        on=["o_orderkey"],
        when_matched_update={
            "price_cents": F.col("__src_price_cents")
        },
        when_matched_delete=F.col("o_orderkey") % 10 == 0,
    )
    return t.read()


# ---------------- MERGE as full SYNC (NOT MATCHED BY SOURCE) ------------
@query(
    "sink_merge_sync",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0
                THEN round(o_totalprice + 1000.0, 2)
                ELSE round(o_totalprice, 2) END AS total
    FROM orders WHERE o_orderkey < 700 AND o_orderkey % 3 <> 0
    """,
)
def sink_merge_sync(spark, sf_dir):
    """MERGE with WHEN NOT MATCHED BY SOURCE THEN DELETE
    (``snapshots.py::merge_mor(when_not_matched_by_source_delete=...)``)
    — the branch that turns MERGE into a full table SYNC: after one
    atomic merge-on-read commit the target is EXACTLY the source
    (matched rows update, fresh rows insert, rows the source no longer
    carries tombstone). The canonical replication shape: mirror an
    operational table into the lake from a daily full extract without
    a truncate-and-reload. The extra branch costs ONE anti-join on the
    merge keys — the same shuffle family the merge already pays — and
    the deletes are deletion vectors, so no data file rewrites.
    Value-exact: target read-back vs the oracle's reconstruction."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="spark_merge_sync_")
    )
    # target: everything under 1000
    t.commit_append(
        o.filter(F.col("o_orderkey") < 1000).coalesce(2)
    )
    # source: the new truth — only keys < 700 with o%3 != 0 survive,
    # even keys arrive with bumped prices
    src = (
        o.filter(
            (F.col("o_orderkey") < 700)
            & (F.col("o_orderkey") % 3 != 0)
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 2 == 0,
                F.col("o_totalprice") + 1000.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    t.merge_mor(
        src,
        on=["o_orderkey"],
        when_matched_update={
            "o_totalprice": F.col("__src_o_totalprice")
        },
        when_not_matched_by_source_delete=True,
    )
    return t.read().select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("total"),
    )


# --------------- connector write onto a partition-spec'd table ---------
@query(
    "sink_connector_spec_write",
    oracle="""
    WITH s AS (SELECT o_orderkey, o_orderstatus FROM orders
               WHERE o_orderkey < 800)
    SELECT (SELECT CAST(count(DISTINCT o_orderstatus) AS INT) FROM s)
             AS n_files,
           1 AS segments_ok, 1 AS pruned_to_one, 1 AS spec_carried,
           (SELECT CAST(count(*) AS BIGINT) FROM s
             WHERE o_orderstatus = 'F') AS rows_f,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM s
             WHERE o_orderstatus = 'F') AS key_sum_f,
           (SELECT CAST(count(*) AS BIGINT) FROM s) AS head_rows
    """,
)
def sink_connector_spec_write(spark, sf_dir):
    """Connector writes onto a PARTITION-SPEC'D table (the ingest
    surface a Spark user reaches first — ``df.write.format(
    "pysnapshot")`` — composed with the table's layout contract): the
    writer reads the spec back from the manifest at construction and
    fans each Arrow batch out per live partition tuple through the
    splitBy batch-split machinery — vectorized dictionary-encode +
    filter, Python per DISTINCT TUPLE never per row — landing shards
    under the same ``__part_<col>=<value>/`` segments
    ``SnapshotTable._write_files`` produces. Facts pin the whole
    contract: one file per status (``n_files``, the frame arrives
    repartitioned on the spec column), every path segment decodes to
    the rows' actual value (``segments_ok``), the CONNECTOR'S OWN
    planning-time path pruning plans exactly one partition for a
    pushed status equality (``pruned_to_one``), and the spec itself
    carries through the connector commit (``spec_carried``). At 100 TB
    the partition fan-out is the no-extra-shuffle path: layout rides
    the repartition the ingest already does, and a spec changed
    concurrently conflicts at commit instead of publishing a
    spec-violating layout (`sources/pyds.py::_partition_batches`)."""
    from pyspark.sql.datasource import EqualTo

    from ..sources.pyds import (
        SnapshotManifestReader,
        register_snapshot_source,
    )
    from ..sources.snapshots import (
        SnapshotTable,
        load_manifest,
        partition_values_from_path,
    )

    register_snapshot_source(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).filter(F.col("o_orderkey") < 800)
    root = tempfile.mkdtemp(prefix="spark_specwrite_")
    t = SnapshotTable(spark, root)
    t.set_partition_spec(["o_orderstatus"])
    (
        o.repartition("o_orderstatus")
        .write.format("pysnapshot")
        .option("root", root)
        .mode("append")
        .save()
    )
    m = load_manifest(root, t.current_version())
    segs = [partition_values_from_path(f) for f in m["files"]]
    segments_ok = int(
        all("o_orderstatus" in pv for pv in segs)
        and all(
            spark.read.parquet(f)
            .filter(
                F.col("o_orderstatus")
                != pv["o_orderstatus"]
            )
            .limit(1)
            .count()
            == 0
            for f, pv in zip(m["files"], segs)
        )
    )
    r = SnapshotManifestReader({"root": root})
    r.pushFilters([EqualTo(("o_orderstatus",), "F")])
    pruned_to_one = int(len(r.partitions()) == 1)
    spec_carried = int(
        (m.get("partition_spec") or []) == ["o_orderstatus"]
    )
    got = (
        spark.read.format("pysnapshot")
        .option("root", root)
        .load()
        .where("o_orderstatus = 'F'")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("long").alias("s"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [
            (
                len(m["files"]),
                segments_ok,
                pruned_to_one,
                spec_carried,
                got["n"],
                got["s"],
                t.read().count(),
            )
        ],
        "n_files int, segments_ok int, pruned_to_one int, "
        "spec_carried int, rows_f bigint, key_sum_f bigint, "
        "head_rows bigint",
    )


@query(
    "sink_connector_transform_write",
    oracle="""
    SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS total_rows,
           CAST((SELECT count(*) FROM events
                 WHERE ts >= TIMESTAMP '2024-01-05'
                   AND ts <  TIMESTAMP '2024-01-06') AS BIGINT)
             AS rows_day,
           CAST((SELECT count(*) FROM events WHERE user_id = 42)
                 AS BIGINT) AS rows_user,
           1 AS all_files_compliant, 1 AS hash_parity
    """,
)
def sink_connector_transform_write(spark, sf_dir):
    """Connector writes onto a TRANSFORM-spec'd table (S61's write
    side): ``df.write.format('pysnapshot')`` onto a
    day(ts) + bucket(user_id, 8) table derives partition values in the
    Arrow task through pure-Python twins — an EXACT Murmur3_x86_32
    replica for bucket (parity-tested against F.hash), naive-UTC
    strftime for day — and lands the same ``__part_day_ts=`` /
    ``__part_bucket_user_id_8=`` segments the engine writes, so
    engine-side pruning and the connector's own planning prune
    connector-written files identically. Facts prove: every landed
    file is spec-compliant, a day probe and a bucket probe both
    shrink the file set without losing rows, and the bucket segment
    of every surviving file equals Spark's own pmod(hash(lit), 8)."""
    import datetime as _dt
    import tempfile as _tf

    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable

    register_snapshot_source(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_ctw_"))
    t.set_partition_spec(["day(ts)", "bucket(user_id, 8)"])
    (
        ev.repartition(8, "user_id")
        .write.format("pysnapshot")
        .option("root", t.root)
        .mode("append")
        .save()
    )
    total_rows = t.read().count()
    files = [r["path"] for r in t.files().collect()]
    compliant = int(
        bool(files)
        and all(
            "__part_day_ts=" in p and "__part_bucket_user_id_8=" in p
            for p in files
        )
    )
    day = _dt.datetime(2024, 1, 5)
    day_files = t.partition_pruned_files({"ts": day})
    rows_day = (
        t.read_partition({"ts": day})
        .filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-06").cast("timestamp_ntz"))
        )
        .count()
    )
    user_files = t.partition_pruned_files({"user_id": 42})
    rows_user = (
        t.read_partition({"user_id": 42})
        .filter(F.col("user_id") == 42)
        .count()
    )
    bucket = (
        spark.range(1)
        .select(
            F.pmod(F.hash(F.lit(42).cast("bigint")), F.lit(8))
        )
        .collect()[0][0]
    )
    hash_parity = int(
        0 < len(user_files) < len(files)
        and 0 < len(day_files) < len(files)
        and all(
            f"__part_bucket_user_id_8={bucket}" in p
            for p in user_files
        )
    )
    return spark.createDataFrame(
        [(total_rows, rows_day, rows_user, compliant, hash_parity)],
        "total_rows long, rows_day long, rows_user long, "
        "all_files_compliant int, hash_parity int",
    )


@query(
    "sink_auto_compact",
    oracle="""
    WITH src AS (SELECT o_orderkey AS k FROM orders
                 WHERE o_orderkey < 450)
    SELECT 1 AS final_files, 2 AS n_optimize_commits,
           CAST((SELECT count(*) FROM src) AS BIGINT) AS n_rows,
           CAST((SELECT sum(k) FROM src) AS BIGINT) AS sum_k,
           1 AS day_a_compacted, 2 AS day_b_untouched,
           9 AS unarmed_files
    """,
)
def sink_auto_compact(spark, sf_dir):
    """autoCompact (round 8, the ``auto.compact`` table property —
    Delta's autoCompact): after each append, any partition the append
    TOUCHED that holds >= ``auto.compact.min.files`` files under
    ``auto.compact.small.bytes`` compacts synchronously as one
    ordinary OPTIMIZE commit (rows identical, old versions keep the
    old layout, CDF empty by carry-forward cancellation). Nine tiny
    appends under min.files=5 leave ONE visible file with exactly two
    OPTIMIZE commits in the history (fragmentation crosses the
    threshold twice); the same nine appends on an UNARMED table leave
    nine files — small files are THE operational scale-killer a 100 TB
    ingest pipeline must keep ahead of, and the trigger reads only
    manifest-banked sizes (zero stat calls on the hot append path).
    The partitioned variant proves SCOPE: four appends to day A
    compact A to one file while day B's two under-threshold files are
    never rewritten (``sources/snapshots.py::_maybe_auto_compact``)."""
    import tempfile as _tf

    from ..sources.snapshots import (
        SnapshotTable,
        load_manifest,
        partition_values_from_path,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    ).filter(F.col("k") < 450)
    # nine 50-key slices, one file each
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_ac_"))
    t.commit_append(o.filter(F.col("k") < 50).coalesce(1))
    t.set_tblproperties(
        {"auto.compact": "true", "auto.compact.min.files": "5"}
    )
    for i in range(1, 9):
        t.commit_append(
            o.filter(
                (F.col("k") >= i * 50) & (F.col("k") < (i + 1) * 50)
            ).coalesce(1)
        )
    d = t.detail()
    ops = [r["operation"] for r in t.history().collect()]
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("s"),
    ).collect()[0]
    # unarmed control: the same appends just fragment
    t2 = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_ac0_"))
    for i in range(9):
        t2.commit_append(
            o.filter(
                (F.col("k") >= i * 50) & (F.col("k") < (i + 1) * 50)
            ).coalesce(1)
        )
    # partitioned scope: day A compacts, day B untouched
    tp = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_acp_"))
    tp.create_table(
        "k BIGINT, day STRING",
        partition_by=["day"],
        properties={
            "auto.compact": "true",
            "auto.compact.min.files": "4",
        },
    )
    def batch(lo, day):
        return spark.range(lo, lo + 3).select(
            F.col("id").alias("k"), F.lit(day).alias("day")
        ).coalesce(1)
    for i in range(4):
        tp.commit_append(batch(i * 10, "A"))
    tp.commit_append(batch(100, "B"))
    tp.commit_append(batch(110, "B"))
    per: dict = {}
    for f in load_manifest(tp.root, tp.current_version())["files"]:
        per.setdefault(
            partition_values_from_path(f).get("day"), []
        ).append(f)
    return spark.createDataFrame(
        [
            (
                d["n_files"],
                sum(1 for op in ops if op == "OPTIMIZE"),
                agg["n"],
                agg["s"],
                len(per.get("A", [])),
                len(per.get("B", [])),
                t2.detail()["n_files"],
            )
        ],
        "final_files int, n_optimize_commits int, n_rows bigint, "
        "sum_k bigint, day_a_compacted int, day_b_untouched int, "
        "unarmed_files int",
    )


@query(
    "sink_replace_where",
    oracle="""
    WITH base AS (SELECT o_orderkey AS k, o_orderkey % 4 AS grp
                  FROM orders WHERE o_orderkey < 400),
    repl AS (SELECT o_orderkey + 10000 AS k, CAST(2 AS BIGINT) AS grp
             FROM orders WHERE o_orderkey < 50)
    SELECT k, grp, 1 AS outside_rejected, 1 AS single_commit,
           1 AS history_labeled,
           CAST((SELECT count(*) FROM base) AS BIGINT) AS v1_rows
    FROM (SELECT k, grp FROM base WHERE grp <> 2
          UNION ALL SELECT k, grp FROM repl)
    """,
)
def sink_replace_where(spark, sf_dir):
    """``INSERT INTO ... REPLACE WHERE`` (round 8 — Delta's
    replaceWhere): atomically replace exactly the rows matching the
    predicate with the query result, in ONE merge-on-read commit
    (tombstones + new files, single manifest — readers see the old
    window or the new one, never a mix). The daily
    partition-re-materialization shape: O(matched rows) sidecar + the
    new rows' write, untouched files never move. An incoming row
    OUTSIDE the predicate window is rejected before anything stages
    (``outside_rejected``) — the replace cannot write outside the
    window it clears. ``single_commit`` pins version +1 for the whole
    replace; v1 still time-travels to the pre-replace state
    (``sources/snapshots.py::replace_where``)."""
    import tempfile as _tf

    from ..sql_dml import snapshot_sql
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 4).alias("grp"),
    ).filter(F.col("k") < 400)
    root = _tf.mkdtemp(prefix="spark_replwhere_")
    t = SnapshotTable(spark, root)
    t.commit_append(o.repartition(2))
    v1_rows = t.read(1).count()
    # an out-of-window row must abort before anything stages
    try:
        t.replace_where(
            F.col("grp") == 2,
            spark.sql(
                "SELECT CAST(1 AS BIGINT) AS k, CAST(3 AS BIGINT) AS grp"
            ),
        )
        outside_rejected = 0
    except ValueError:
        outside_rejected = int(t.current_version() == 1)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "rw_orders"
    )
    v = snapshot_sql(
        spark,
        f"INSERT INTO pysnapshot.`{root}` REPLACE WHERE grp = 2 "
        "SELECT o_orderkey + 10000, 2 FROM rw_orders "
        "WHERE o_orderkey < 50",
    )
    single_commit = int(v == 2)
    ops = [r["operation"] for r in t.history().collect()]
    history_labeled = int(ops[0] == "REPLACE WHERE")  # newest first
    return t.read().select(
        "k",
        "grp",
        F.lit(outside_rejected).alias("outside_rejected"),
        F.lit(single_commit).alias("single_commit"),
        F.lit(history_labeled).alias("history_labeled"),
        F.lit(v1_rows).alias("v1_rows"),
    )


from ..operators.zorder import (  # noqa: E402
    sql_z_query_n,
    write_zordered_n,
    z_order_key_n,
)


@query(
    "sink_zorder_n_layout",
    oracle=sql_z_query_n(
        "(SELECT o_orderkey, o_custkey, o_orderkey % 97 AS o_bucket "
        "FROM orders)",
        ["o_orderkey", "o_custkey", "o_bucket"],
    ),
)
def sink_zorder_n_layout(spark, sf_dir):
    """N-column Z-order layout (round 8 — Delta's multi-column
    OPTIMIZE ZORDER BY): three columns interleave with the generic
    N-way bit placement (21 bits each at N=3;
    ``operators/zorder.py::z_value_n`` — the 2-D case stays on the
    doubling-steps fast path, bit-parity pinned), the write
    range-partitions + sorts on the key so each file owns a contiguous
    3-D curve segment, and the oracle mirrors normalization + bit
    placement in SQL — round-trip fidelity AND the transform are
    hash-checked bit-exact. Footer-stat pruning on EVERY clustered
    dimension is asserted in tests/test_zorder_n.py."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_orderkey") % 97).alias("o_bucket"),
    )
    path = tempfile.mkdtemp(prefix="spark_zorder_n_")
    write_zordered_n(
        o, path, ["o_orderkey", "o_custkey", "o_bucket"], n_files=8
    )
    back = spark.read.parquet(path)
    return z_order_key_n(
        back, ["o_orderkey", "o_custkey", "o_bucket"]
    ).select(
        "o_orderkey", "o_custkey", "o_bucket", F.col("__z").alias("zval")
    )


# ---------- S65 end-to-end: MERGE file skipping on a clustered table ----
@query(
    "sink_merge_file_skipping",
    oracle="""
    WITH b AS (SELECT max(o_orderkey) / 8.0 AS cut FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(CASE WHEN o_orderkey <= (SELECT cut FROM b)
                                    AND o_orderkey % 10 = 0
                               THEN o_totalprice + 1000.0
                               ELSE o_totalprice END), 2) AS DOUBLE)
               AS sum_price,
           8 AS files_total, 1 AS files_scanned
    FROM orders
    """,
)
def sink_merge_file_skipping(spark, sf_dir):
    """MERGE file skipping engaged END-TO-END (SURVEY §2 S65 /
    VERDICT-r8 directive #3 — the case the feature exists for): the
    target is built KEY-CLUSTERED — eight commits, each one file
    owning a disjoint ``o_orderkey`` range with footer stats banked —
    and the MERGE source's keys all fall in the FIRST range, so the
    source-hull zone prune (``sources/snapshots.py::merge_mor``,
    Delta's MERGE file pruning) provably excludes 7 of 8 files from
    the staged scan: ``files_scanned = 1`` comes from the engine's own
    MERGE_METRICS, and the row counts/sums prove the skipped files'
    rows survived untouched while the hull's matched rows took the
    update. At 100 TB this is a MERGE touching 0.1% of the key space
    reading ~0.1% of the table instead of all of it. The r8 bench
    banked this mechanism only hypothetically (source spanning every
    file → 8/8 scanned); this row pins the engaged path at the
    driver."""
    import time as _time

    from ..sources.snapshots import MERGE_METRICS, SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    cut = mx / 8.0
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="merge_skip_"))
    for i in range(8):
        lo, hi = i * cut, (i + 1) * cut
        part = o.filter(
            (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
            if i
            else (F.col("o_orderkey") <= hi)
        )
        t.commit_append(part.coalesce(1), stats_cols=["o_orderkey"])
    src = o.filter(
        (F.col("o_orderkey") <= cut) & (F.col("o_orderkey") % 10 == 0)
    ).select("o_orderkey")
    t0 = _time.perf_counter()
    t.merge_mor(
        src,
        on=["o_orderkey"],
        when_matched_update={
            "o_totalprice": F.col("o_totalprice") + 1000.0
        },
        insert_not_matched=False,
    )
    _ = _time.perf_counter() - t0  # wall-clock recorded in BENCH_NOTES
    scanned = int(MERGE_METRICS["files_scanned"])
    total = int(MERGE_METRICS["files_total"])
    return t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.lit(total).cast("int").alias("files_total"),
        F.lit(scanned).cast("int").alias("files_scanned"),
    )
