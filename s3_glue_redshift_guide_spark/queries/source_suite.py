"""Source/sink round-trip queries — driver-checkable evidence for the
SURVEY §2.1 rows whose operators consume their OWN file layouts (CSV
dialect, schema inference, partition discovery, schema evolution, bookmark
incremental, staged COPY, ORC/text sources, compaction).

Pattern: each query materializes a layout DERIVED from a driver table into
a fresh temp directory, runs the source/sink operator over it, and returns
either the round-tripped rows (oracle: plain SELECT over the originating
table) or derived layout facts (oracle: literals + aggregates). Inputs are
always the driver's own parquet tables — nothing synthesized — so the
oracle stays exact at any scale factor.

The write side of each round trip is small (dimension tables or key-bounded
fact slices), but the OPERATORS under test are the scale paths themselves:
recursive listing + glob filtering is O(metadata), schema inference reads
one sampled pass, partition discovery is directory-name parsing, the staged
COPY ships parquet files not rows, and compaction plans file counts from FS
metadata.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..sinks.compaction import compact_parquet
from ..sinks.warehouse_copy import DuckDBWarehouse, StagedCopyWriter
from ..sources.csv_dialect import OPENCSV_DIALECT, read_csv_typed
from ..sources.incremental import IncrementalFileSource
from ..sources.inference import crawl, infer_csv_schema
from ..sources.evolution import evolve_and_union
from .registry import query


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"spark_{prefix}_")


# ----------------------------------------------------------- S1/S2/S7 ----
@query(
    "src_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           n_name || ', region ' || CAST(n_regionkey AS VARCHAR) AS label
    FROM nation
    """,
)
def src_csv_roundtrip(spark, sf_dir):
    """CSV dialect + folder-as-table + glob filter (S1/S2/S7): nation is
    split by key parity into CSVs under two NESTED directories (recursive
    listing), next to a decoy .txt the ``*.csv`` glob must skip; the
    ``label`` column embeds a comma so the OpenCSVSerde quote/escape
    dialect is load-bearing, not incidental. Read back string-first then
    cast (the reference's serde-then-change-schema pipeline) and compare
    every row against the source table."""
    n = load_table(spark, sf_dir, "nation").withColumn(
        "label",
        F.concat(F.col("n_name"), F.lit(", region "), F.col("n_regionkey")),
    )
    base = _tmp("csv_rt")
    for sub, pred in (("even", F.col("n_nationkey") % 2 == 0),
                      ("odd", F.col("n_nationkey") % 2 == 1)):
        (
            n.filter(pred)
            .coalesce(1)
            .write.options(**OPENCSV_DIALECT)
            .option("header", "true")
            .mode("overwrite")
            .csv(os.path.join(base, "nested", sub))
        )
    with open(os.path.join(base, "decoy.txt"), "w") as fh:
        fh.write("not,a,csv,table\n")
    back = read_csv_typed(
        spark, base, schema=n.schema, path_glob="*.csv", recursive=True
    )
    return back.select("n_nationkey", "n_name", "n_regionkey", "label")


# ----------------------------------------------------------------- S3 ----
@query(
    "src_schema_inference",
    oracle="""
    SELECT * FROM (VALUES
      ('s_suppkey', 'int'), ('s_name', 'string'),
      ('s_nationkey', 'int'), ('s_acctbal', 'double')
    ) t(col_name, inferred_type)
    """,
)
def src_schema_inference(spark, sf_dir):
    """Schema inference / crawler classification (S3): supplier exported to
    CSV (all strings on disk), then ``infer_csv_schema`` must recover the
    numeric columns — int keys, double balances — exactly as the crawler's
    classifier would. Output is (column, inferred type), which the oracle
    pins as literals."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    base = _tmp("infer")
    (
        s.coalesce(1)
        .write.options(**OPENCSV_DIALECT)
        .option("header", "true")
        .mode("overwrite")
        .csv(base)
    )
    schema = infer_csv_schema(spark, base, path_glob="*.csv")
    return spark.createDataFrame(
        [(f.name, f.dataType.simpleString()) for f in schema.fields],
        "col_name string, inferred_type string",
    )


# ----------------------------------------------------------------- S4 ----
@query(
    "src_partition_discovery",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows
    FROM orders WHERE o_orderkey < 4000
    GROUP BY o_orderpriority
    """,
)
def src_partition_discovery(spark, sf_dir):
    """Partition discovery (S4): a key-bounded orders slice is written
    Hive-partitioned by priority (directory names carry the values,
    including one with an escaped space); ``crawl`` discovers the partition
    column from the layout and registers the table. Per-partition counts
    read THROUGH the discovered partition column must match grouping the
    source directly."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    base = _tmp("partdisc")
    (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .mode("overwrite")
        .parquet(base)
    )
    name = f"src_q_partdisc_{uuid.uuid4().hex[:8]}"
    entry = crawl(spark, name, base, fmt="parquet")
    assert entry.partition_columns == ["o_orderpriority"]
    return (
        spark.table(name)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ----------------------------------------------------------------- S5 ----
@query(
    "src_schema_evolution",
    oracle="""
    SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey < 1500
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_custkey >= 1500 AND c_custkey < 3000
    """,
)
def src_schema_evolution(spark, sf_dir):
    """Additive schema evolution (S5): an old file generation without
    ``c_acctbal`` unions with a new generation that added it;
    ``evolve_and_union`` conforms the old rows with typed NULLs
    (metadata-only evolution — no rewrite of the old files)."""
    c = load_table(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") < 1500).select("c_custkey", "c_name")
    new = c.filter(
        (F.col("c_custkey") >= 1500) & (F.col("c_custkey") < 3000)
    ).select("c_custkey", "c_name", "c_acctbal")
    return evolve_and_union(old, new)


# ----------------------------------------------------------------- S6 ----
@query(
    "src_incremental_bookmark",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey < 1000 THEN 1 ELSE 2 END AS batch
    FROM orders WHERE o_orderkey < 2000
    """,
)
def src_incremental_bookmark(spark, sf_dir):
    """Bookmark-incremental source (S6): file 1 lands, run 1 processes it;
    file 2 lands, run 2 processes ONLY the new file (the checkpoint is the
    bookmark). Each batch is tagged with its run number on the way to the
    sink, so the output proves no file was reprocessed or skipped."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = _tmp("bookmark")
    inbox, out, ckpt = (os.path.join(base, d) for d in ("inbox", "out", "ckpt"))

    run = {"i": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("batch", F.lit(run["i"]))
            .write.mode("append")
            .parquet(out)
        )

    src = IncrementalFileSource(
        spark, inbox, schema=o.schema, checkpoint_dir=ckpt, fmt="parquet"
    )
    first = o.filter(F.col("o_orderkey") < 1000)
    second = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))

    first.coalesce(1).write.mode("append").parquet(inbox)
    run["i"] = 1
    src.run_once(sink=sink)
    second.coalesce(1).write.mode("append").parquet(inbox)
    run["i"] = 2
    src.run_once(sink=sink)
    return spark.read.parquet(out).select("o_orderkey", "o_totalprice", "batch")


# ----------------------------------------------------------------- S9 ----
@query(
    "sink_staged_copy",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def sink_staged_copy(spark, sf_dir):
    """Staged COPY warehouse load (S9): stage nation as parquet, issue one
    COPY into an embedded DuckDB warehouse (the Redshift stand-in — same
    one-COPY-per-staging-prefix control plane), then read the warehouse
    table back. The data path ships parquet FILES to the warehouse; rows
    only cross the driver here to re-enter Spark for comparison (25-row
    dimension)."""
    import duckdb

    con = duckdb.connect()
    writer = StagedCopyWriter(_tmp("staged_copy"), DuckDBWarehouse(con))
    n = load_table(spark, sf_dir, "nation")
    loaded = writer.write(n, "nation_copy", mode="overwrite")
    assert loaded == n.count()
    pdf = con.sql(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation_copy"
    ).df()
    return spark.createDataFrame(pdf).select(
        F.col("n_nationkey").cast("int"),
        "n_name",
        F.col("n_regionkey").cast("int"),
    )


# ---------------------------------------------------------------- S13 ----
@query(
    "src_orc_roundtrip",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part WHERE p_partkey <= 500
    """,
)
def src_orc_roundtrip(spark, sf_dir):
    """ORC source (S13): a part slice written as ORC, re-crawled
    (``crawl(fmt='orc')`` with union-schema merge) and read back through
    the registered view — types and values must survive the format hop
    bit-exactly (ORC stores the same IEEE doubles)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    base = _tmp("orc_rt")
    (
        p.select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .write.mode("overwrite")
        .orc(base)
    )
    name = f"src_q_orc_{uuid.uuid4().hex[:8]}"
    crawl(spark, name, base, fmt="orc")
    return spark.table(name).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )


# ---------------------------------------------------------------- S14 ----
@query(
    "src_text_source",
    oracle="SELECT r_name AS value FROM region",
)
def src_text_source(spark, sf_dir):
    """Raw-text source (S14): one line per region name on disk, crawled as
    ``fmt='text'`` — the unstructured-corpus entry point (single ``value``
    column) the LLM-pipeline operators start from."""
    r = load_table(spark, sf_dir, "region")
    base = _tmp("text_src")
    r.select(F.col("r_name").alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(base)
    name = f"src_q_text_{uuid.uuid4().hex[:8]}"
    crawl(spark, name, base, fmt="text")
    return spark.table(name).select("value")


# ---------------------------------------------------------------- S15 ----
@query(
    "sink_compaction_facts",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)       AS n_rows,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum,
           16 AS files_in, 1 AS files_out
    FROM customer
    """,
)
def sink_compaction_facts(spark, sf_dir):
    """Small-file compaction (S15): customer deliberately shattered into 16
    files, compacted to one sorted file (target size >> input bytes). The
    facts prove content survived (count + key sum) and the file counts on
    both sides of the rewrite; per-file key-range disjointness under
    ``sort_by`` is asserted separately in tests/test_compaction.py."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    base = _tmp("compact")
    src, out = os.path.join(base, "in"), os.path.join(base, "out")
    c.repartition(16).write.mode("overwrite").parquet(src)
    n_out = compact_parquet(
        spark, src, out, target_file_bytes=1 << 30, sort_by=["c_custkey"]
    )
    files_in = (
        spark.read.parquet(src)
        .select(F.input_file_name().alias("f"))
        .agg(F.countDistinct("f").cast("int").alias("n"))
    )
    back = spark.read.parquet(out).withColumn("__f", F.input_file_name())
    facts = back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("long").alias("key_sum"),
        F.countDistinct("__f").cast("int").alias("files_out"),
    )
    assert n_out == 1
    return (
        facts.crossJoin(files_in.select(F.col("n").alias("files_in")))
        .select("n_rows", "key_sum", "files_in", "files_out")
    )


# ---------------------------------------------------------------- S12 ----
@query(
    "src_json_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def src_json_roundtrip(spark, sf_dir):
    """JSON-lines source via the crawl path (S12): an orders slice written
    as JSON lines, re-crawled with sampled schema inference (long/double/
    string recovered from the text encoding) and read back through the
    registered view."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 2000
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    base = _tmp("json_rt")
    o.coalesce(1).write.mode("overwrite").json(base)
    name = f"src_q_json_{uuid.uuid4().hex[:8]}"
    crawl(spark, name, base, fmt="json")
    return spark.table(name).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


# ---------------------------------------------------------------- S16 ----
@query(
    "src_xml_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def src_xml_roundtrip(spark, sf_dir):
    """XML source (S16, Spark 4 native): region written as XML rows,
    re-crawled (`crawl(fmt='xml')`, rowTag inference) and read back —
    integer keys survive the text hop (inferred long, cast to the
    canonical int)."""
    r = load_table(spark, sf_dir, "region")
    base = _tmp("xml_rt")
    (
        r.coalesce(1)
        .write.format("xml")
        .option("rowTag", "row")
        .mode("overwrite")
        .save(base)
    )
    name = f"src_q_xml_{uuid.uuid4().hex[:8]}"
    crawl(spark, name, base, fmt="xml")
    return spark.table(name).select(
        F.col("r_regionkey").cast("int").alias("r_regionkey"), "r_name"
    )


# ------------------------------------------------- partition pruning ----
@query(
    "src_partition_pruning",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           1 AS partitions_read
    FROM orders WHERE o_orderkey < 4000 AND o_orderpriority = '1-URGENT'
    """,
)
def src_partition_pruning(spark, sf_dir):
    """Partition pruning as a RUNTIME fact (not just a plan assertion): a
    key-bounded orders slice written Hive-partitioned by priority, then
    read back with an equality filter on the partition column. The files
    actually touched (``input_file_name`` per row) must all come from ONE
    partition directory — directory-level pruning is what turns a 100 TB
    scan into a single-partition read when the filter is declarative."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    base = _tmp("prune")
    (
        o.select("o_orderkey", "o_orderpriority")
        .repartition("o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .mode("overwrite")
        .parquet(base)
    )
    back = (
        spark.read.parquet(base)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.regexp_extract(
                F.input_file_name(), r"o_orderpriority=([^/]+)", 1
            ).alias("part_dir"),
        )
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.countDistinct("part_dir").cast("int").alias("partitions_read"),
    )


# ------------------------------------- reference flagship workflow ----
@query(
    "etl_workflow_e2e",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_tier
    FROM customer
    """,
)
def etl_workflow_e2e(spark, sf_dir):
    """The reference's FLAGSHIP path (trigger -> crawler -> job -> load,
    README workflow) end to end, inside one driver query: customer arrives
    as three CSV upload waves (Hive-partitioned by wave); each poll fires
    the workflow exactly once — re-crawl, bookmark-incremental job with a
    change-schema transform (typed cast + derived tier), staged-parquet
    COPY into the DuckDB warehouse stand-in. The warehouse contents must
    equal a direct transform of the source table: every file loaded
    exactly once, no wave skipped, types survive the CSV hop.

    The warehouse read-back crosses the driver (customer is
    dimension-scale at gate SF); the LOAD path itself ships staged parquet
    files, never driver rows."""
    import duckdb

    from pyspark.sql import types as T

    from ..orchestration import FileTriggeredWorkflow
    from ..sinks.warehouse_copy import DuckDBWarehouse, StagedCopyWriter

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    base = _tmp("wf_e2e")
    inbox = os.path.join(base, "uploads")
    con = duckdb.connect()
    writer = StagedCopyWriter(os.path.join(base, "staging"), DuckDBWarehouse(con))
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    tier = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_tier")
    )
    wf = FileTriggeredWorkflow(
        spark,
        name=f"src_q_wf_{uuid.uuid4().hex[:8]}",
        source_path=inbox,
        schema=schema,
        checkpoint_dir=os.path.join(base, "ckpt"),
        transform=lambda df: df.select("*", tier),
        loader=writer.foreach_batch("wh_customer"),
    )
    for wave in range(3):
        (
            c.filter(F.col("c_custkey") % 3 == wave)
            .coalesce(1)
            .write.options(**OPENCSV_DIALECT)
            .option("header", "true")
            .mode("overwrite")
            .csv(os.path.join(inbox, f"wave={wave}"))
        )
        run = wf.poll_once()
        assert run is not None and run.batches >= 1
    assert wf.poll_once() is None  # quiesced: no new files, no fire
    pdf = con.sql(
        "SELECT c_custkey, c_name, c_acctbal, c_mktsegment, balance_tier "
        "FROM wh_customer"
    ).df()
    return spark.createDataFrame(pdf)


# ----------------------------- file-level min/max data skipping -------
@query(
    "src_dataskip_index",
    oracle="""
    WITH laid AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             year(o_orderdate) - 1995 AS fid
      FROM orders),
    files AS (SELECT fid, count(*) AS n FROM laid GROUP BY 1),
    hit AS (
      SELECT fid FROM laid GROUP BY fid
      HAVING max(od) >= DATE '1997-03-15' AND min(od) <= DATE '1998-06-30')
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM files) AS n_files,
           (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_files_read,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM laid
    WHERE od BETWEEN DATE '1997-03-15' AND DATE '1998-06-30'
    """,
)
def src_dataskip_index(spark, sf_dir):
    """File-level min/max data skipping (the Delta/Iceberg zone-map
    mechanism, distinct from Hive directory pruning): orders laid out one
    file per order-year, a per-FILE min/max index built on the DATA column
    o_orderdate (one metadata-scale groupBy on input_file_name), then a
    March-1997..June-1998 range read that touches ONLY the files whose
    [min,max] intersects the predicate — 2 of 7 here. The result row
    carries the skip proof (n_files vs n_files_read) AND full content
    fidelity (count + key sum over the pruned read equal the oracle's
    full-table filter, so skipping lost no rows and admitted the residual
    filter no extras)."""
    from ..operators.dataskip import file_stats_index, pruned_files, read_pruned

    lo, hi = "1997-03-15", "1998-06-30"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    base = _tmp("dataskip")
    (
        o.withColumn("fid", F.year("od") - F.lit(1995))
        .repartition("fid")
        .write.partitionBy("fid")
        .mode("overwrite")
        .parquet(base)
    )
    back = spark.read.parquet(base)
    index = file_stats_index(back, ["od"])
    files = pruned_files(index, "od", lo, hi)
    n_files = index.count()
    picked = read_pruned(spark, base, files).filter(
        F.col("od").between(F.lit(lo), F.lit(hi))
    )
    return picked.agg(
        F.lit(n_files).cast("long").alias("n_files"),
        F.lit(len(files)).cast("long").alias("n_files_read"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


# --------------------------------- snapshot / time-travel table -------
@query(
    "src_time_travel",
    oracle="""
    WITH v1 AS (SELECT * FROM orders WHERE o_orderkey < 500),
    v2 AS (SELECT * FROM orders WHERE o_orderkey < 1000)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v1) AS v1_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM v1) AS v1_sum,
           (SELECT CAST(count(*) AS BIGINT) FROM v2) AS v2_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM v2) AS v2_sum,
           CAST(4 AS BIGINT) AS v2_files,
           (SELECT CAST(count(*) AS BIGINT) FROM v2) AS v3_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM v2) AS v3_sum,
           CAST(1 AS BIGINT) AS v3_files,
           1 AS isolation_ok
    """,
)
def src_time_travel(spark, sf_dir):
    """Snapshot/time-travel table (the transaction-log capability every
    lakehouse source needs): v1 = keys <500 written as 2 files, v2 =
    append of [500,1000) (4 files visible), v3 = a COMPACTION REWRITE of
    the same rows into 1 file. Readers resolve a manifest first, so
    version reads are reproducible after later commits — v1 and v2 read
    back exactly their historical content even though v3 rewrote the
    layout, and v3's content equals v2's (isolation_ok re-checks it
    row-for-row via anti-joins). Commit cost is O(new files); the atomic
    step is one manifest rename (`sources/snapshots.py`)."""
    import tempfile as _tf

    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_snap_"))
    t.commit_append(o.filter(F.col("o_orderkey") < 500).repartition(2))
    t.commit_append(
        o.filter(
            (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1000)
        ).repartition(2)
    )
    t.commit_rewrite(t.read(2).coalesce(1))

    v1, v2, v3 = t.read(1), t.read(2), t.read(3)
    iso = (
        v2.select("o_orderkey").exceptAll(v3.select("o_orderkey")).count()
        == 0
        and v3.select("o_orderkey").exceptAll(v2.select("o_orderkey")).count()
        == 0
    )

    def facts(df, n_files, pfx):
        return df.agg(
            F.count(F.lit(1)).alias(f"{pfx}_rows"),
            F.sum("o_orderkey").cast("long").alias(f"{pfx}_sum"),
            *([F.lit(n_files).cast("long").alias(f"{pfx}_files")]
              if n_files is not None else []),
        )

    return (
        facts(v1, None, "v1")
        .crossJoin(facts(v2, t.file_count(2), "v2"))
        .crossJoin(facts(v3, t.file_count(3), "v3"))
        .withColumn("isolation_ok", F.lit(1 if iso else 0))
    )


@query(
    "src_surgical_delete",
    oracle="""
    WITH laid AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             year(o_orderdate) AS yr
      FROM orders),
    hit AS (
      SELECT yr FROM laid GROUP BY yr
      HAVING max(od) >= DATE '1997-03-15' AND min(od) <= DATE '1998-06-30'),
    survivors AS (
      SELECT * FROM laid
      WHERE od NOT BETWEEN DATE '1997-03-15' AND DATE '1998-06-30')
    SELECT (SELECT CAST(count(DISTINCT yr) AS BIGINT) FROM laid)
             AS n_files_before,
           (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_rewritten,
           (SELECT CAST(count(DISTINCT yr) AS BIGINT) FROM laid)
             - (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_kept_identical,
           CAST(count(*) AS BIGINT) AS rows_after,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum_after
    FROM survivors
    """,
)
def src_surgical_delete(spark, sf_dir):
    """GDPR-style surgical DELETE (the dataskip x snapshot composition —
    how Delta/Iceberg execute row deletes): orders lands as one snapshot
    file per order-year (7 commits), the per-file min/max index finds the
    files whose range intersects the delete predicate (1997-03-15 ..
    1998-06-30 → exactly the 1997/1998 files), and ONLY those two are
    rewritten without the deleted rows — the other five keep their byte
    identity in the new manifest (asserted: path intersection == 5). Work
    is O(affected files), never O(table); the pre-delete version remains
    fully readable (time travel = the audit trail)."""
    from ..operators.dataskip import file_stats_index, pruned_files
    from ..sources.snapshots import SnapshotTable

    lo, hi = "1997-03-15", "1998-06-30"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    t = SnapshotTable(spark, _tmp("surgdel"))
    for yr in range(1995, 2002):
        t.commit_append(o.filter(F.year("od") == yr).coalesce(1))
    v_before = t.current_version()
    files_before = set(t._load_manifest(v_before))

    index = file_stats_index(t.read(), ["od"])
    # input_file_name() yields file:// URIs; the manifest stores plain
    # paths — normalize before the manifest set-difference
    to_rewrite = [
        p.removeprefix("file://") for p in pruned_files(index, "od", lo, hi)
    ]
    survivors_of_hit = spark.read.parquet(*to_rewrite).filter(
        ~F.col("od").between(F.lit(lo), F.lit(hi))
    )
    t.commit_replace(to_rewrite, survivors_of_hit)

    files_after = set(t._load_manifest(t.current_version()))
    n_kept = len(files_before & files_after)
    after = t.read()
    return after.agg(
        F.lit(len(files_before)).cast("long").alias("n_files_before"),
        F.lit(len(to_rewrite)).cast("long").alias("n_rewritten"),
        F.lit(n_kept).cast("long").alias("n_kept_identical"),
        F.count(F.lit(1)).alias("rows_after"),
        F.sum("o_orderkey").cast("long").alias("key_sum_after"),
    )


@query(
    "src_change_feed",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 350)
    SELECT o_orderkey, price * 2 AS o_totalprice,
           'insert' AS change_type,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
             WHERE o_orderkey >= 300 AND o_orderkey < 600)
             AS full_feed_inserts,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
             WHERE o_orderkey >= 100 AND o_orderkey < 200)
             AS full_feed_deletes,
           CAST(0 AS BIGINT) AS compaction_changes
    FROM upd
    UNION ALL
    SELECT o_orderkey, price, 'delete',
           (SELECT CAST(count(*) AS BIGINT) FROM orders
             WHERE o_orderkey >= 300 AND o_orderkey < 600),
           (SELECT CAST(count(*) AS BIGINT) FROM orders
             WHERE o_orderkey >= 100 AND o_orderkey < 200),
           CAST(0 AS BIGINT)
    FROM upd
    """,
)
def src_change_feed(spark, sf_dir):
    """Row-level CHANGE DATA FEED between snapshot versions (the Delta
    CDF capability), derived purely from the manifest diff — no change
    log is ever written. Scenario: v1 = orders keys <300 (one file),
    v2 = append [300,600) (one file), v3 = surgical DELETE of
    [100,200), v4 = surgical UPDATE doubling o_totalprice for
    [300,350), v5 = compaction rewrite. The returned rows are
    ``read_changes(3, 4)``: the update surfaces as its delete/insert
    pair (pre-image at the old price, post-image at 2x) and ONLY the
    rewritten file is scanned — the untouched keys<300 survivor file is
    in both manifests, so immutability proves it unchanged without
    reading it (O(churn), never O(table): a day's CDC reads a day's
    files at 100 TB). Fact columns pin the composed feed (v1->v4 =
    inserts [300,600) + deletes [100,200) — rows a rewrite carried
    forward cancel via EXCEPT ALL) and that the pure-layout compaction
    commit v4->v5 reports ZERO changes (`sources/snapshots.py`
    read_changes)."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, _tmp("cdf"))
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    t.commit_append(
        o.filter(
            (F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600)
        ).coalesce(1)
    )
    f1 = t._load_manifest(1)
    f2 = [f for f in t._load_manifest(2) if f not in set(f1)]
    # v3: surgical delete of [100,200) — rewrite only the keys<300 file
    survivors = spark.read.parquet(*f1).filter(
        ~F.col("o_orderkey").between(100, 199)
    )
    t.commit_replace(f1, survivors.coalesce(1))
    # v4: surgical update — double the price for [300,350) inside the
    # [300,600) file; every other row of that file is carried forward
    updated = spark.read.parquet(*f2).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey").between(300, 349),
            F.col("o_totalprice") * 2,
        ).otherwise(F.col("o_totalprice")),
    )
    t.commit_replace(f2, updated.coalesce(1))
    # v5: compaction — pure layout change, must report zero changes
    t.commit_rewrite(t.read(4).coalesce(1))

    full = t.read_changes(1, 4)
    n_ins = full.filter(F.col("_change_type") == "insert").count()
    n_del = full.filter(F.col("_change_type") == "delete").count()
    n_compact = t.read_changes(4, 5).count()

    return (
        t.read_changes(3, 4)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("_change_type").alias("change_type"),
        )
        .withColumn("full_feed_inserts", F.lit(n_ins).cast("long"))
        .withColumn("full_feed_deletes", F.lit(n_del).cast("long"))
        .withColumn("compaction_changes", F.lit(n_compact).cast("long"))
    )


@query(
    "src_manifest_pruning",
    oracle="""
    WITH laid AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             year(o_orderdate) AS yr
      FROM orders),
    fs AS (
      SELECT yr, min(od) AS mn, max(od) AS mx FROM laid GROUP BY yr),
    hit AS (
      SELECT yr FROM fs
      WHERE mx >= DATE '1997-03-15' AND mn <= DATE '1998-06-30'),
    rows_in AS (
      SELECT * FROM laid
      WHERE od BETWEEN DATE '1997-03-15' AND DATE '1998-06-30')
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM fs) AS n_files,
           (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_files_read,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM rows_in
    """,
)
def src_manifest_pruning(spark, sf_dir):
    """Zone-map pruning from the TRANSACTION LOG alone (Iceberg/Delta
    data skipping, distinct from `src_dataskip_index` which builds its
    index with a Spark scan at query time): per-file min/max for the
    order date is banked in the snapshot manifest AT COMMIT TIME from the
    parquet footers of the new files, so the read-time planner prunes the
    file list with ZERO file opens and zero jobs — at 100 TB that's
    choosing among ~100k files from a few MB of log. Layout: one commit
    per order-year (7 files); the 1997-03-15..1998-06-30 predicate keeps
    exactly the 1997/1998 files. Facts pin total vs pruned file counts;
    row values of the pruned+residual read are matched in full against
    the oracle's plain table filter (absent-stats files are kept
    conservatively — pruning can waste a read, never lose a row)."""
    from ..sources.snapshots import SnapshotTable

    lo, hi = "1997-03-15", "1998-06-30"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    t = SnapshotTable(spark, _tmp("manpr"))
    for yr in range(1995, 2002):
        t.commit_append(
            o.filter(F.year("od") == yr).coalesce(1), stats_cols=["od"]
        )
    files, n_files = t.pruned_files("od", lo, hi)
    picked = t.read_where("od", lo, hi).filter(
        F.col("od").between(F.lit(lo), F.lit(hi))
    )
    return picked.agg(
        F.lit(n_files).cast("long").alias("n_files"),
        F.lit(len(files)).cast("long").alias("n_files_read"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


@query(
    "src_file_metadata",
    oracle="""
    SELECT 'orders.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(1 AS BIGINT) AS n_files
    FROM orders
    """,
)
def src_file_metadata(spark, sf_dir):
    """Row-level file provenance via Spark's hidden ``_metadata`` column
    on file sources: every row carries which physical file produced it
    (plus size/mtime in the full struct) WITHOUT any join or extra scan —
    the constant-per-file values are attached by the reader, so lineage,
    per-file quarantine ("delete every row that came from the corrupt
    upload"), and audit at 100 TB cost nothing. The aggregate groups by
    provenance file; the oracle pins the single-file layout and the row
    content per file."""
    from ..catalog import table_path
    from ..session import configure

    configure(spark)
    df = spark.read.parquet(table_path(sf_dir, "orders")).select(
        F.col("o_orderkey"),
        F.col("_metadata.file_name").alias("file_name"),
    )
    from pyspark.sql import Window

    per_file = df.groupBy("file_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )
    n_files = F.count(F.lit(1)).over(Window.partitionBy())
    return per_file.withColumn("n_files", n_files.cast("long"))


@query(
    "src_snapshot_incremental",
    oracle="""
    SELECT o_orderkey, 'insert' AS change_type, 1 AS batch
    FROM orders WHERE o_orderkey < 400
    UNION ALL
    SELECT o_orderkey, 'insert', 2
    FROM orders WHERE o_orderkey >= 400 AND o_orderkey < 500
    UNION ALL
    SELECT o_orderkey, 'delete', 2
    FROM orders WHERE o_orderkey < 100
    """,
)
def src_snapshot_incremental(spark, sf_dir):
    """Incremental consumption of the snapshot log — the Delta
    streaming-source shape, and the version-granular big sibling of
    `src_incremental_bookmark`'s file-level bookmark: a consumer holds
    ONE integer cursor (the last processed version) and each call to
    ``changes_since`` delivers the rows of every commit after it exactly
    once. Run 1 (cursor 0 -> 2) sees the two appends as inserts; two
    more commits land (an append and a surgical delete of keys<100);
    run 2 (cursor 2 -> 4) sees exactly those — the batch tags partition
    the feed with no overlap and no gap. Work per run is O(churn since
    cursor): a consumer that polls daily reads a day's files, never the
    table (`sources/snapshots.py::changes_since`)."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("snapinc"))
    t.commit_append(o.filter(F.col("o_orderkey") < 200).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399)).coalesce(1)
    )
    run1, cursor = t.changes_since(0)
    run1 = run1.localCheckpoint()  # freeze before later commits

    f1 = t._load_manifest(1)
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 499)).coalesce(1)
    )
    survivors = spark.read.parquet(*f1).filter(F.col("o_orderkey") >= 100)
    t.commit_replace(f1, survivors.coalesce(1))
    run2, cursor2 = t.changes_since(cursor)
    assert cursor2 == 4 and t.changes_since(cursor2)[0] is None

    def tag(df, b):
        return df.select(
            "o_orderkey",
            F.col("_change_type").alias("change_type"),
            F.lit(b).cast("int").alias("batch"),
        )

    return tag(run1, 1).unionAll(tag(run2, 2))


@query(
    "src_python_datasource",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(3 AS BIGINT) AS n_files,
           CAST(1 AS BIGINT) AS n_files_read
    FROM orders WHERE o_orderkey BETWEEN 250 AND 320
    """,
)
def src_python_datasource(spark, sf_dir):
    """The snapshot table as a REGISTERED SPARK FORMAT via the Spark-4
    Python DataSource API (`sources/pyds.py`):
    ``spark.read.format("pysnapshot")`` resolves the manifest on the
    driver, ``pushFilters`` harvests the key-range predicate and
    zone-map-prunes the file list (pruning-only pushdown: every filter is
    returned unsupported so Catalyst keeps the row-level residual), and
    each surviving file becomes one InputPartition whose executor-side
    read yields pyarrow RecordBatches — a pure-Python table-format
    connector with the same plan shape as a native file source. Layout:
    three key-range commits; the [250,320] predicate must scan exactly
    one file. Fact columns pin total-vs-read file counts via the same
    banked stats the connector prunes with; row values match the plain
    table filter."""
    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, _tmp("pyds"))
    for lo, hi in ((0, 199), (200, 399), (400, 599)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    register_snapshot_source(spark)
    files_read, n_files = t.pruned_files("o_orderkey", 250, 320)
    rows = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .load()
        .filter(F.col("o_orderkey").between(250, 320))
    )
    return rows.select(
        "o_orderkey",
        "o_totalprice",
        F.lit(n_files).cast("long").alias("n_files"),
        F.lit(len(files_read)).cast("long").alias("n_files_read"),
    )


# ---------------- dynamic partition pruning runtime proof (R8+) --------
@query(
    "src_dynamic_partition_pruning",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           2 AS partitions_matched,
           1 AS dpp_in_plan
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def src_dynamic_partition_pruning(spark, sf_dir):
    """DYNAMIC partition pruning — the star-schema scan saver static
    pruning (``src_partition_pruning``) can't reach: the filter sits on
    a DIMENSION attribute (``urgency``), not on the fact's partition
    column, so which fact partitions matter is only known at RUNTIME
    from the dimension's surviving join keys. Catalyst reuses the
    broadcast of the filtered dimension as a subquery inside the fact
    scan's PartitionFilters (``dynamicpruningexpression``) — at 100 TB
    this turns a full fact scan into reads of only the joined-to
    partitions, the single biggest built-in saver on partitioned stars.
    Facts returned: the join aggregates (oracle-checked in DuckDB), the
    partition directories actually contributing rows (input_file_name),
    and the executed plan carrying the dynamic-pruning subquery."""
    o = load_table(spark, sf_dir, "orders")
    base = _tmp("dpp")
    (
        o.select("o_orderkey", "o_orderpriority")
        .repartition("o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .mode("overwrite")
        .parquet(base)
    )
    fact = spark.read.parquet(base)
    dim = (
        o.select("o_orderpriority")
        .distinct()
        .withColumn(
            "urgency",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                "hot",
            ).otherwise("cold"),
        )
    )
    hot = dim.filter(F.col("urgency") == "hot")
    # Execution 1 — the CLEAN star join: this is the plan DPP applies to
    # (the fact scan's PartitionFilters gain a dynamicpruningexpression
    # fed by the broadcast of the filtered dimension).
    # explicit broadcast hint: DPP's reuseBroadcastOnly default needs
    # the DIMENSION as the broadcast build side; at gate SF both sides
    # are tiny and Catalyst sometimes flips the build side, which makes
    # insertion nondeterministic — on a real star the size asymmetry
    # decides it, and the hint pins the same shape here
    agg = fact.join(F.broadcast(hot), "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )
    # widen plan metadata strings: the default 100-char truncation can
    # cut PartitionFilters mid-token, making the marker check flaky
    old_len = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old_len)
    dpp = 1 if "dynamicpruning" in plan.lower() else 0
    # Execution 2 — per-file evidence: tag each fact row with its
    # partition directory (input_file_name, projected on the single-
    # source side; its non-determinism blocks DPP on THIS run, which is
    # why the plan fact comes from execution 1) and count the distinct
    # directories contributing surviving rows.
    tagged = fact.select(
        "o_orderpriority",
        F.regexp_extract(
            F.input_file_name(), r"o_orderpriority=([^/]+)", 1
        ).alias("part_dir"),
    )
    n_parts = (
        tagged.join(F.broadcast(hot), "o_orderpriority")
        .agg(F.countDistinct("part_dir").cast("int").alias("p"))
        .collect()[0]["p"]
    )
    return spark.createDataFrame(
        [(row["n_rows"], row["key_sum"], n_parts, dpp)],
        "n_rows bigint, key_sum bigint, partitions_matched int, "
        "dpp_in_plan int",
    )


# --------------------- deletion vectors: merge-on-read DELETE ----------
@query(
    "src_deletion_vector",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows_after,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum_after,
           CAST((SELECT count(*) FROM orders WHERE o_orderkey < 600)
                AS BIGINT) AS n_rows_at_v3,
           1 AS files_unchanged
    FROM orders WHERE o_orderkey < 600 AND o_orderkey % 7 <> 0
    """,
)
def src_deletion_vector(spark, sf_dir):
    """MERGE-ON-READ delete via deletion vectors (the Delta/Iceberg DV
    design): three snapshot commits, then a DELETE that writes only a
    row-position sidecar — the facts prove the visible rows shrank
    (count/sum oracle-checked against the equivalent predicate), the
    pre-delete version still reads in full (time travel over tombstones),
    and the data file set is BYTE-IDENTICAL across the delete commit
    (``files_unchanged``). At 100 TB this is the GDPR path: a 3-row
    delete costs KBs of sidecar, not a rewrite of every 1 GB file that
    contains a matching row (``sources/snapshots.py::delete_where``)."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, _tmp("dv"))
    for lo, hi in ((0, 199), (200, 399), (400, 599)):
        t.commit_append(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    v3 = t.current_version()
    v4 = t.delete_where(F.col("o_orderkey") % 7 == 0)
    same_files = int(
        load_manifest(t.root, v3)["files"]
        == load_manifest(t.root, v4)["files"]
    )
    after = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    n_at_v3 = t.read(v3).count()
    return spark.createDataFrame(
        [(after["n"], after["s"], n_at_v3, same_files)],
        "n_rows_after bigint, key_sum_after bigint, "
        "n_rows_at_v3 bigint, files_unchanged int",
    )


# --------------------- field-id rename schema evolution ----------------
@query(
    "src_schema_rename",
    oracle="""
    SELECT c_custkey, c_acctbal AS account_balance
    FROM customer WHERE c_custkey < 1000
    """,
)
def src_schema_rename(spark, sf_dir):
    """Column RENAME as metadata-only evolution (Iceberg field-id
    semantics, ``sources/snapshots.py::rename_column``): rows committed
    BEFORE the rename (physical column ``c_acctbal``) and rows appended
    AFTER it (physical ``account_balance``) must read back as ONE column
    under the current name, value-exact — not as drop+add with NULL
    holes. The oracle is the plain source projection: if either era
    leaked NULLs or the old name, the row-level compare fails. Zero data
    files are touched by the rename commit; readers coalesce each field
    id's historical names, an expression-only mapping that costs nothing
    extra at scan scale."""
    from ..sources.snapshots import SnapshotTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    t = SnapshotTable(spark, _tmp("rename"))
    t.commit_append(c.filter(F.col("c_custkey") < 500).coalesce(1))
    t.rename_column("c_acctbal", "account_balance")
    t.commit_append(
        c.filter(F.col("c_custkey").between(500, 999))
        .withColumnRenamed("c_acctbal", "account_balance")
        .coalesce(1)
    )
    return t.read()


# ---------------- optimistic concurrency as a driver-facing row --------
@query(
    "src_snapshot_concurrent_writers",
    oracle="""
    SELECT 1 AS conflict_raised, 3 AS final_version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 600
    """,
)
def src_snapshot_concurrent_writers(spark, sf_dir):
    """Optimistic concurrency, driver-checkable (upgrades S21 from
    pytest-only evidence): two writers race on the same snapshot table —
    both read version 1, writer B publishes version 2 first, and writer
    A's publish ON TOP OF THE SNAPSHOT IT READ must raise
    ``CommitConflict`` (exclusive manifest create — a lost update is
    impossible by construction), after which A re-reads the head and
    lands version 3 carrying BOTH writers' files. The returned facts pin
    the conflict, the final version, and the full row content (no row
    lost, none doubled). On S3 the exclusive create is a conditional put
    on the manifest key — the Delta log protocol; the race is simulated
    deterministically (B commits between A's read and A's publish),
    which exercises exactly the code path a real race hits."""
    from ..sources.snapshots import (
        CommitConflict,
        SnapshotTable,
        load_manifest,
        publish_version,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = SnapshotTable(spark, _tmp("occ"))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 200).coalesce(1)
    )  # v1
    # writer A reads the head (v1)...
    a_base = t.current_version()
    a_files = t._write_files(
        o.filter(F.col("o_orderkey").between(400, 599)).coalesce(1)
    )
    # ...writer B commits first (v2)
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399)).coalesce(1)
    )
    conflict = 0
    try:
        publish_version(
            t.root,
            load_manifest(t.root, a_base)["files"] + a_files,
            a_base,
        )
    except CommitConflict:
        conflict = 1
        head = t.current_version()  # A re-reads and retries on top
        publish_version(
            t.root,
            load_manifest(t.root, head)["files"] + a_files,
            head,
        )
    final_v = t.current_version()
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [(conflict, final_v, agg["n"], agg["s"])],
        "conflict_raised int, final_version int, n_rows bigint, "
        "key_sum bigint",
    )


# --------------------------- RESTORE as a commit (S34) -----------------
@query(
    "src_restore",
    oracle="""
    WITH v2 AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 600)
    SELECT CAST(count(*) AS BIGINT) AS n_rows_head,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum_head,
           (SELECT CAST(count(*) AS BIGINT) FROM v2
             WHERE o_orderkey % 5 <> 0) AS n_rows_at_v3,
           4 AS head_version, 1 AS dv_cleared, 1 AS audit_readable,
           2 AS proto_reader_v3, 1 AS proto_reader_head
    FROM v2
    """,
)
def src_restore(spark, sf_dir):
    """RESTORE to a historical snapshot AS A NEW COMMIT (Delta RESTORE,
    ``sources/snapshots.py::restore``): v1+v2 appends, v3 = a deletion-
    vector DELETE, then ``restore(2)`` publishes v4 carrying v2's exact
    file list and (empty) dv map — the deleted rows come BACK at head,
    the restore itself is a pure metadata publish (zero data movement,
    O(1) at any table size), and BECAUSE it is a commit the pre-restore
    state v3 stays readable (``audit_readable``) — restore is auditable
    and revertible, never history rewriting. ``dv_cleared`` pins the
    ADVICE-r5 sentinel fix: the restored manifest carries v2's metadata
    verbatim instead of inheriting the current head's."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("restore"))
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 599)).coalesce(1)
    )
    t.delete_where(F.col("o_orderkey") % 5 == 0)  # v3: DV commit
    n_at_v3 = t.read(3).count()
    t.restore(2)  # v4 = v2's content, as a new commit
    head_v = t.current_version()
    m = load_manifest(t.root, head_v)
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    audit = int(t.read(3).count() == n_at_v3)  # v3 still serves
    # protocol versioning rides along: the DV commit (v3) demands
    # reader 2, the restored plain-file head only reader 1 — downlevel
    # readers refuse exactly the versions whose features they'd misread
    proto_v3 = load_manifest(t.root, 3)["protocol"]["reader"]
    proto_head = m["protocol"]["reader"]
    return spark.createDataFrame(
        [
            (
                agg["n"],
                agg["s"],
                n_at_v3,
                head_v,
                int(not m.get("dv")),
                audit,
                proto_v3,
                proto_head,
            )
        ],
        "n_rows_head bigint, key_sum_head bigint, n_rows_at_v3 bigint, "
        "head_version int, dv_cleared int, audit_readable int, "
        "proto_reader_v3 int, proto_reader_head int",
    )


# ------------------------------ shallow CLONE (S35) --------------------
@query(
    "src_shallow_clone",
    oracle="""
    WITH src AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 400),
         added AS (SELECT o_orderkey FROM orders
                   WHERE o_orderkey BETWEEN 400 AND 599)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM src) AS src_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM src)
             + (SELECT CAST(count(*) AS BIGINT) FROM added) AS clone_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM src)
             + (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM added)
             AS clone_key_sum,
           1 AS zero_copy, 1 AS source_isolated
    """,
)
def src_shallow_clone(spark, sf_dir):
    """SHALLOW CLONE (Delta CLONE, ``snapshots.py::clone_shallow``): the
    clone's first manifest REFERENCES the source's current data files —
    ``zero_copy`` asserts every clone-v1 file path is literally a source
    file (O(metadata) fork regardless of table size). The clone then
    diverges with its own append while the source stays untouched
    (``source_isolated``): two tables, one set of immutable bytes, the
    dev/test-fork workflow at 100 TB for the price of one manifest."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("clone_src"))
    t.commit_append(o.filter(F.col("o_orderkey") < 200).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399)).coalesce(1)
    )
    src_files = set(load_manifest(t.root, t.current_version())["files"])
    clone = t.clone_shallow(_tmp("clone_dst"))
    clone_v1_files = set(load_manifest(clone.root, 1)["files"])
    zero_copy = int(clone_v1_files <= src_files)
    clone.commit_append(
        o.filter(F.col("o_orderkey").between(400, 599)).coalesce(1)
    )
    src_rows = t.read().count()
    isolated = int(
        set(load_manifest(t.root, t.current_version())["files"])
        == src_files
    )
    agg = clone.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [(src_rows, agg["n"], agg["s"], zero_copy, isolated)],
        "src_rows bigint, clone_rows bigint, clone_key_sum bigint, "
        "zero_copy int, source_isolated int",
    )


# ------------------------- null-count data skipping (S36) --------------
@query(
    "src_nullcount_skipping",
    oracle="""
    WITH laid AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN c_acctbal END AS neg_bal,
             (c_acctbal < 0) AS is_neg
      FROM customer WHERE c_custkey < 1500)
    SELECT CAST(2 AS BIGINT) AS n_files,
           CAST(1 AS BIGINT) AS files_for_isnull,
           CAST(1 AS BIGINT) AS files_for_isnotnull,
           (SELECT CAST(count(*) AS BIGINT) FROM laid
             WHERE neg_bal IS NULL) AS n_null_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM laid
             WHERE neg_bal IS NOT NULL) AS n_notnull_rows
    """,
)
def src_nullcount_skipping(spark, sf_dir):
    """NULL-COUNT data skipping (S36, the ``col#nulls`` stats the commit
    banks next to min/max): the table lands as one file whose ``neg_bal``
    is entirely NULL (non-negative balances) and one where it is never
    NULL — ``IS NULL`` admits only the all-null file (a zero-null file
    cannot match) and ``IS NOT NULL`` only the other, each proven by the
    connector's own partition planner (``pyds.py::_null_admits``) BEFORE
    any task is scheduled. min/max ranges cannot express this (an
    all-null column has no min/max at all); at 100 TB the IS NULL audit
    query touches the files that can answer it, not the table."""
    from pyspark.sql.datasource import IsNotNull, IsNull

    from ..sources.pyds import (
        SnapshotManifestReader,
        register_snapshot_source,
    )
    from ..sources.snapshots import SnapshotTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.col("c_acctbal")).alias(
            "neg_bal"
        ),
        (F.col("c_acctbal") < 0).alias("is_neg"),
    ).filter(F.col("c_custkey") < 1500)
    t = SnapshotTable(spark, _tmp("nullskip"))
    t.commit_append(
        c.filter(~F.col("is_neg")).coalesce(1), stats_cols=["neg_bal"]
    )
    t.commit_append(
        c.filter(F.col("is_neg")).coalesce(1), stats_cols=["neg_bal"]
    )

    def admitted(flt):
        r = SnapshotManifestReader({"root": t.root})
        r.pushFilters([flt])
        return len(r.partitions())

    register_snapshot_source(spark)
    df = spark.read.format("pysnapshot").option("root", t.root).load()
    return spark.createDataFrame(
        [
            (
                t.file_count(),
                admitted(IsNull(("neg_bal",))),
                admitted(IsNotNull(("neg_bal",))),
                df.where("neg_bal IS NULL").count(),
                df.where("neg_bal IS NOT NULL").count(),
            )
        ],
        "n_files bigint, files_for_isnull bigint, "
        "files_for_isnotnull bigint, n_null_rows bigint, "
        "n_notnull_rows bigint",
    )


# --------------------- row-group pruning in the connector (S37) --------
@query(
    "src_rowgroup_pruning",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS groups_total,
           CAST(2 AS BIGINT) AS groups_selected,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey BETWEEN 250 AND 349
    """,
)
def src_rowgroup_pruning(spark, sf_dir):
    """ROW-GROUP pruning inside connector reads (S37, the skipping tier
    BELOW manifest zone maps): one sorted 1000-key file written with
    100-row groups (10 groups), a pushed ``BETWEEN 250 AND 349`` selects
    exactly the two groups whose footer [min,max] ranges intersect (the
    bound straddles one group boundary) — proven by
    calling the selector (``pyds.py::_row_group_selection``) on the real
    footer, then value-checked through the registered format (positions
    stay FILE-absolute across pruned groups, so deletion vectors would
    still mask correctly). A 1 GB file holds ~100 groups: this tier
    turns a selective point read from a file scan into a handful of
    column chunks."""
    import pyarrow.parquet as pq

    from ..sources.pyds import (
        _row_group_selection,
        register_snapshot_source,
    )
    from ..sources.snapshots import (
        SnapshotTable,
        _footer_stats_one,
        load_manifest,
    )

    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .filter(F.col("o_orderkey") < 1250)
        .orderBy("o_orderkey")
        .limit(1000)
    )
    t = SnapshotTable(spark, _tmp("rowgroup"))
    # land the sorted rows as ONE file with 100-row groups (pyarrow
    # write: Spark's writer doesn't expose tiny group sizes), then
    # publish it through the ordinary manifest protocol
    import pyarrow as pa

    d = os.path.join(t.root, "data", uuid.uuid4().hex)
    os.makedirs(d)
    path = os.path.join(d, "part-0.parquet")
    pq.write_table(
        pa.Table.from_pandas(o.toPandas()), path, row_group_size=100
    )
    from ..sources.snapshots import publish_version

    publish_version(
        t.root, [path], 0, {path: _footer_stats_one(path, ["o_orderkey"])}
    )
    md = pq.ParquetFile(path).metadata
    selected = _row_group_selection(
        md, {"o_orderkey": (250, 349)}, {"o_orderkey": ["o_orderkey"]}
    )
    register_snapshot_source(spark)
    got = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .load()
        .where("o_orderkey BETWEEN 250 AND 349")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").cast("long").alias("s"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [(md.num_row_groups, len(selected), got["n"], got["s"])],
        "groups_total bigint, groups_selected bigint, n_rows bigint, "
        "key_sum bigint",
    )


# ----------------------------- CHECK constraints (S38) -----------------
@query(
    "src_check_constraints",
    oracle="""
    SELECT 1 AS existing_validated, 1 AS violation_rejected,
           1 AS version_unchanged_on_reject, 1 AS constraint_survived,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 400
    """,
)
def src_check_constraints(spark, sf_dir):
    """CHECK constraints (S38, Delta's ``ADD CONSTRAINT``): registering
    validates the CURRENT snapshot (one aggregated scan), after which the
    constraint is a WRITER-SIDE contract enforced on every commit — the
    violating append is rejected BEFORE any manifest publish (version
    unchanged, no orphan files) while the clean append lands, and the
    constraint SURVIVES the commit (``constraint_survived`` pins the
    round-6 carry-through fix). Enforcement rides the write pass itself
    as ``df.observe`` counters — one scan, not check-then-write twice —
    so a 100 TB table never needs a repair scan to trust its invariants."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("check"))
    t.commit_append(o.filter(F.col("o_orderkey") < 200).coalesce(1))
    t.add_constraint("key_nonneg", "o_orderkey >= 0")
    existing_ok = 1
    try:  # a constraint the snapshot violates must refuse to register
        t.add_constraint("impossible", "o_orderkey < 0")
        existing_ok = 0
    except ValueError:
        pass
    v_before = t.current_version()
    rejected = 0
    try:
        t.commit_append(
            spark.range(3).select((-F.col("id") - 1).alias("o_orderkey"))
        )
    except ValueError:
        rejected = 1
    unchanged = int(t.current_version() == v_before)
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399)).coalesce(1)
    )
    survived = int(
        load_manifest(t.root, t.current_version()).get("constraints")
        == {"key_nonneg": "o_orderkey >= 0"}
    )
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [(existing_ok, rejected, unchanged, survived, agg["n"], agg["s"])],
        "existing_validated int, violation_rejected int, "
        "version_unchanged_on_reject int, constraint_survived int, "
        "n_rows bigint, key_sum bigint",
    )


# ------------------------ TIMESTAMP AS OF time travel ------------------
@query(
    "src_timestamp_as_of",
    oracle="""
    WITH v2 AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 400)
    SELECT 1 AS v_at_100, 2 AS v_at_250, 3 AS v_late,
           CAST(count(*) AS BIGINT) AS n_rows_asof,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum_asof,
           CAST(count(*) AS BIGINT) AS connector_asof_rows
    FROM v2
    """,
)
def src_timestamp_as_of(spark, sf_dir):
    """TIMESTAMP AS OF time travel (Delta's second time-travel axis):
    every manifest banks a commit timestamp at publish (injected here
    via the table's pluggable clock — 100/200/300 — for a deterministic
    oracle), and ``read(as_of_ts=250)`` resolves to the NEWEST version
    committed at or before the timestamp (v2), a pure metadata walk
    (``snapshots.py::version_as_of``). ``v_late`` pins the >=-head case;
    a timestamp before the first commit raises (asserted in pytest);
    the registered connector resolves the same instant via
    ``.option("timestampAsOf", ...)`` (``connector_asof_rows``).
    This is the audit shape — "what did the table say yesterday 09:00" —
    that version numbers alone cannot express."""
    from ..sources.snapshots import SnapshotTable, version_as_of

    ticks = iter([100.0, 200.0, 300.0])
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("asof"), clock=lambda: next(ticks))
    t.commit_append(o.filter(F.col("o_orderkey") < 200).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399)).coalesce(1)
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 599)).coalesce(1)
    )
    agg = t.read(as_of_ts=250.0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    # the registered format resolves the same timestamp identically
    from ..sources.pyds import register_snapshot_source

    register_snapshot_source(spark)
    conn_rows = (
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("timestampAsOf", "250")
        .load()
        .count()
    )
    return spark.createDataFrame(
        [
            (
                version_as_of(t.root, 100.0),
                version_as_of(t.root, 250.0),
                version_as_of(t.root, 10_000.0),
                agg["n"],
                agg["s"],
                conn_rows,
            )
        ],
        "v_at_100 int, v_at_250 int, v_late int, n_rows_asof bigint, "
        "key_sum_asof bigint, connector_asof_rows bigint",
    )


# ------------------------- GENERATED columns ---------------------------
@query(
    "src_generated_columns",
    oracle="""
    SELECT 1 AS computed_on_omit, 1 AS validated_on_supply,
           1 AS disagreement_rejected, 1 AS survives_commits,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey * 2) AS BIGINT) AS gen_sum
    FROM orders WHERE o_orderkey < 400
    """,
)
def src_generated_columns(spark, sf_dir):
    """GENERATED columns (S43, Delta's ``GENERATED ALWAYS AS``): the
    manifest registers ``key2x = o_orderkey * 2`` and EVERY write honors
    it — a batch omitting the column gets it computed on the write pass,
    a batch supplying it is validated ``IS NOT DISTINCT FROM`` the
    expression on the SAME single ``df.observe`` pass as CHECK counters
    (zero extra scans), and a disagreeing batch is vetoed BEFORE any
    manifest publish (version unchanged, no orphan files). The
    expression survives every commit, so a 100 TB table's derived
    column needs no repair scan to stay trustworthy — it is a writer
    contract, like Delta's, not a materialized view."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("gencol"))
    t.add_generated_column("key2x", "o_orderkey * 2")
    # batch 1 omits the generated column -> computed on the write
    t.commit_append(o.filter(F.col("o_orderkey") < 200).coalesce(1))
    computed = int(
        t.read().filter(
            F.col("key2x") != F.col("o_orderkey") * 2
        ).count()
        == 0
        and "key2x" in t.read().columns
    )
    # batch 2 supplies agreeing values -> validated, lands
    t.commit_append(
        o.filter(F.col("o_orderkey").between(200, 399))
        .withColumn("key2x", F.col("o_orderkey") * 2)
        .coalesce(1)
    )
    validated = 1
    # batch 3 supplies DISAGREEING values -> vetoed pre-publish
    v_before = t.current_version()
    rejected = 0
    try:
        t.commit_append(
            o.filter(F.col("o_orderkey").between(400, 420)).withColumn(
                "key2x", F.lit(0).cast("long")
            )
        )
    except ValueError:
        rejected = int(t.current_version() == v_before)
    survives = int(
        load_manifest(t.root, t.current_version()).get("generated")
        == {"key2x": "o_orderkey * 2"}
    )
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("key2x").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [(computed, validated, rejected, survives, agg["n"], agg["s"])],
        "computed_on_omit int, validated_on_supply int, "
        "disagreement_rejected int, survives_commits int, "
        "n_rows bigint, gen_sum bigint",
    )


# --------------------- metadata-only aggregates ------------------------
@query(
    "src_metadata_only_agg",
    oracle="""
    WITH base AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 600)
    SELECT CAST(count(*) AS BIGINT) AS n_pre_delete,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           (SELECT CAST(count(*) AS BIGINT) FROM base
             WHERE o_orderkey % 7 <> 0) AS n_post_delete,
           1 AS minmax_refused_under_dv
    FROM base
    """,
)
def src_metadata_only_agg(spark, sf_dir):
    """Metadata-only aggregates (S44, Delta's metadata-only query
    optimization): ``COUNT(*)`` is answered from the LOG — banked
    per-file ``[null_count, num_rows]`` stats summed, deletion-vector
    tombstones subtracted exactly from the point-delete-sized sidecars
    — and ``MIN/MAX`` from the banked zone maps, with an honest
    ``None`` (fall back to a scan) whenever the log cannot be EXACT:
    here the post-delete min/max refuses because a tombstoned row may
    hold the extreme. On a 100 TB table this turns the most common
    dashboard queries into O(files) metadata walks with ZERO data-page
    reads; files missing stats cost one footer read each, fanned out
    as a Spark job past the distributed threshold."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("metaagg"))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 300).coalesce(2),
        stats_cols=["o_orderkey"],
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 599)).coalesce(1)
    )
    n_pre = t.metadata_count()
    mm = t.metadata_min_max("o_orderkey")
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    n_post = t.metadata_count()
    refused = int(t.metadata_min_max("o_orderkey") is None)
    return spark.createDataFrame(
        [(n_pre, mm[0], mm[1], n_post, refused)],
        "n_pre_delete bigint, min_key bigint, max_key bigint, "
        "n_post_delete bigint, minmax_refused_under_dv int",
    )


# ------------------------- bloom file index ----------------------------
@query(
    "src_bloom_index",
    oracle="""
    SELECT 4 AS total_files, 4 AS zone_candidates, 1 AS bloom_files,
           0 AS absent_value_rows,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey
    FROM orders WHERE o_orderkey = 442
    """,
)
def src_bloom_index(spark, sf_dir):
    """Per-file Bloom filter index (S45, Delta's bloom filter index):
    four files whose key ranges FULLY INTERLEAVE (key % 4 sharding —
    every file's [min, max] spans the whole domain, so zone maps keep
    all four), then ``add_bloom_index`` + a point lookup: the bloom
    probes prune to exactly the ONE file that can hold the key, and an
    absent key reads zero rows. At 100 TB this is the difference
    between scanning every file of a uuid-keyed table and scanning one:
    build cost is one column read per file fanned out as a Spark job,
    probe cost is one KB-scale sidecar read per zone-surviving file,
    and false negatives are impossible (shared canonical value
    encoding) while false positives only waste a read. The index
    auto-extends to every appended/rewritten file."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    base = o.filter(F.col("o_orderkey") < 800)
    t = SnapshotTable(spark, _tmp("bloomq"))
    for s in range(4):
        t.commit_append(
            base.filter(F.col("o_orderkey") % 4 == s).coalesce(1),
            stats_cols=["o_orderkey"],
        )
    t.add_bloom_index("o_orderkey", fpp=0.001)
    files, zone_n, total = t.point_lookup_files("o_orderkey", 442)
    absent = t.read_where_eq("o_orderkey", 9_999_999).count()
    row = t.read_where_eq("o_orderkey", 442).collect()[0]
    return spark.createDataFrame(
        [
            (
                total,
                zone_n,
                len(files),
                absent,
                row["o_orderkey"],
                row["o_custkey"],
            )
        ],
        "total_files int, zone_candidates int, bloom_files int, "
        "absent_value_rows bigint, o_orderkey bigint, o_custkey bigint",
    )


# ------------------------- DESCRIBE HISTORY (S46) ----------------------
@query(
    "src_table_history",
    oracle="""
    SELECT 'WRITE|RESTORE|MATERIALIZE DELETES|UPDATE|DELETE|APPEND'
             AS ops_newest_first,
           6 AS n_versions, 1 AS ts_v1, 2 AS added_v1, 2 AS dv_files_v2,
           2 AS removed_v4,
           CAST(count(*) + 5 AS BIGINT) AS head_rows
    FROM orders WHERE o_orderkey < 300
    """,
)
def src_table_history(spark, sf_dir):
    """DESCRIBE HISTORY (Delta's audit view, ``SnapshotTable.history``):
    every write path stamps its manifest with an OPERATION label at
    publish — append, DV delete, merge-on-read update, materialize,
    restore, and a write through the registered connector land as
    APPEND / DELETE / UPDATE / MATERIALIZE DELETES / RESTORE / WRITE —
    and ``history()`` walks the retained manifests newest-first with
    the banked commit timestamp (injected clock 1..N here for a
    deterministic oracle), file add/remove deltas vs the previous
    readable version, and live-DV file counts. A pure metadata walk:
    O(retained versions) manifest reads and ZERO data access at any
    table size, so the audit question ("who rewrote the table and
    when") costs the same at 100 TB as at 100 rows. ``removed_v4``
    pins the accounting: materialize rewrote exactly the two DV'd
    files; ``head_rows`` ties the audit view to real reads — restore
    resurrected v1's rows and the connector appended 5 more."""
    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable

    ticks = iter(float(i) for i in range(1, 100))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("hist"), clock=lambda: next(ticks))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 300)
        .repartitionByRange(2, "o_orderkey")  # exactly two data files
    )
    t.delete_where(F.col("o_orderkey") % 5 == 0)          # v2: DV delete
    t.update_where(                                       # v3: MOR update
        F.col("o_orderkey") == 7, {"o_orderkey": F.lit(7).cast("bigint")}
    )
    t.materialize_deletes()                               # v4: fold DVs
    t.restore(1)                                          # v5: undo it all
    register_snapshot_source(spark)
    spark.createDataFrame(                                # v6: connector
        [(1000 + i,) for i in range(5)], "o_orderkey bigint"
    ).write.format("pysnapshot").option("root", t.root).mode(
        "append"
    ).save()
    h = {r["version"]: r for r in t.history().collect()}
    ops = "|".join(
        r["operation"] for r in sorted(
            h.values(), key=lambda r: -r["version"]
        )
    )
    return spark.createDataFrame(
        [
            (
                ops,
                len(h),
                int(h[1]["timestamp"]),
                h[1]["n_added"],
                h[2]["n_dv_files"],
                h[4]["n_removed"],
                t.read().count(),
            )
        ],
        "ops_newest_first string, n_versions int, ts_v1 int, "
        "added_v1 int, dv_files_v2 int, removed_v4 int, head_rows bigint",
    )


# --------------------- timed VACUUM retention (S21+) -------------------
@query(
    "src_vacuum_retention",
    oracle="""
    WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 300),
         b AS (SELECT o_orderkey FROM orders
               WHERE o_orderkey BETWEEN 300 AND 499)
    SELECT 1 AS n_deleted, 1 AS v1_unreadable,
           (SELECT CAST(count(*) AS BIGINT) FROM a) AS v2_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM a)
             + (SELECT CAST(count(*) AS BIGINT) FROM b) AS head_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM a)
             + (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM b)
             AS head_sum
    """,
)
def src_vacuum_retention(spark, sf_dir):
    """Time-based VACUUM retention (Delta's ``RETAIN n HOURS``, riding
    the banked commit timestamps): v1 appends file A at ts=10, v2
    REWRITES it into a compacted file at ts=20 (A becomes unreachable
    from every later version), v3 appends B at ts=30. ``vacuum(
    retain_versions=1, retain_seconds=25, now=40)`` composes the two
    retention axes AS A UNION — the version axis alone would keep only
    v3, but the time horizon (40-25=15) protects every version
    committed at or after it, so v2 SURVIVES (``v2_rows`` re-reads it
    after the vacuum) while v1 falls off (``v1_unreadable``: the
    manifest is gone, reads raise) and exactly A's one orphaned file
    unlinks (``n_deleted``). Neither axis can shrink what the other
    promised — the operational contract that lets a 100 TB table pin
    "48 h of time travel" regardless of how bursty its commit rate is,
    with the whole decision a pure metadata walk (reachability = union
    of retained manifests' file lists; zero data reads)."""
    from ..sources.snapshots import LogTruncated, SnapshotTable

    ticks = iter([10.0, 20.0, 30.0])
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("vacret"), clock=lambda: next(ticks))
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    t.commit_rewrite(t.read().coalesce(1))                # v2: compact
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 499)).coalesce(1)
    )
    deleted = t.vacuum(retain_versions=1, retain_seconds=25.0, now=40.0)
    try:
        t.read(1).count()
        v1_unreadable = 0
    except LogTruncated:
        v1_unreadable = 1
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                len(deleted),
                v1_unreadable,
                t.read(2).count(),
                agg["n"],
                agg["s"],
            )
        ],
        "n_deleted int, v1_unreadable int, v2_rows bigint, "
        "head_rows bigint, head_sum bigint",
    )


# ---------------- table-level partition spec (S47) ---------------------
@query(
    "src_partition_spec",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_orderstatus FROM orders
               WHERE o_orderkey < 300),
         b AS (SELECT o_orderkey, o_orderstatus FROM orders
               WHERE o_orderkey BETWEEN 300 AND 599)
    SELECT CAST(1 + (SELECT count(DISTINCT o_orderstatus) FROM b)
                AS INT) AS total_files,
           CAST(1 + (SELECT CASE WHEN EXISTS (SELECT 1 FROM b
                     WHERE o_orderstatus = 'O') THEN 1 ELSE 0 END)
                AS INT) AS pruned_for_o,
           1 AS old_file_untouched,
           (SELECT CAST(count(*) AS BIGINT) FROM
             (SELECT * FROM a UNION ALL SELECT * FROM b)
             WHERE o_orderstatus = 'O') AS rows_o,
           (SELECT CAST(count(*) AS BIGINT) FROM a)
             + (SELECT CAST(count(*) AS BIGINT) FROM b) AS head_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM
             (SELECT * FROM a UNION ALL SELECT * FROM b)
             WHERE o_orderstatus = 'O') AS key_sum_o
    """,
)
def src_partition_spec(spark, sf_dir):
    """TABLE-LEVEL partition spec with PARTITION EVOLUTION (Iceberg's
    identity partitioning, ``SnapshotTable.set_partition_spec``): batch
    A lands BEFORE the spec (one unpartitioned file), the spec on
    ``o_orderstatus`` is then a metadata-only commit, and batch B lands
    clustered — one file per live status value under ``__part_`` path
    segments, source columns RETAINED in the files so every read path
    sees ordinary parquet. ``pruned_for_o`` pins the manifest-level
    pruning contract: an equality read touches B's one matching file
    plus the pre-spec file KEPT CONSERVATIVELY (no banked value can
    only mean 'must read', never 'skip') — and ``old_file_untouched``
    pins evolution's selling point: changing the spec rewrote ZERO
    existing files, the operation that forces a full rewrite on
    Hive-partitioned layouts. At 100 TB the prune decision is an
    O(files) path-string walk with zero file opens, and the layout cost
    rides the writes that were happening anyway."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    t = SnapshotTable(spark, _tmp("pspec"))
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    a_files = set(load_manifest(t.root, 1)["files"])
    t.set_partition_spec(["o_orderstatus"])
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 599))
    )
    head = load_manifest(t.root, t.current_version())
    old_untouched = int(a_files <= set(head["files"]))
    pruned = t.partition_pruned_files({"o_orderstatus": "O"})
    got = t.read_partition({"o_orderstatus": "O"}).filter(
        F.col("o_orderstatus") == "O"
    )
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                len(head["files"]),
                len(pruned),
                old_untouched,
                agg["n"],
                t.read().count(),
                agg["s"],
            )
        ],
        "total_files int, pruned_for_o int, old_file_untouched int, "
        "rows_o bigint, head_rows bigint, key_sum_o bigint",
    )


# ----------------------- row tracking (S48) ----------------------------
@query(
    "src_row_tracking",
    oracle="""
    WITH a AS (SELECT o_orderkey,
                      row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
               FROM orders WHERE o_orderkey < 300),
         b AS (SELECT o_orderkey,
                      (SELECT count(*) FROM a)
                      + row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
               FROM orders WHERE o_orderkey BETWEEN 300 AND 599),
         u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
         live AS (SELECT * FROM u WHERE o_orderkey % 7 <> 0)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT rid) AS BIGINT) AS n_ids,
           CAST(sum(rid) AS BIGINT) AS id_sum,
           CAST(max(rid) AS BIGINT) AS id_max,
           (SELECT CAST(rid AS BIGINT) FROM live
            WHERE o_orderkey = 333) AS updated_rid,
           (SELECT CAST(count(*) AS BIGINT) FROM live
            WHERE o_orderkey = 333) AS n_updated
    FROM live
    """,
)
def src_row_tracking(spark, sf_dir):
    """ROW TRACKING (Delta's row IDs, ``enable_row_tracking``): every
    row gets a PERMANENT 64-bit id — fresh files derive ids from a
    manifest-banked ``[base_row_id, num_rows]`` range (zero storage:
    base + row position), and files REWRITTEN by OPTIMIZE /
    materialize / MOR UPDATE carry their rows' original ids as a
    physical ``__row_id`` column (bytes only in churned files, hidden
    from every plain read). This query drives the full preservation
    gauntlet — two appends, a modulo DV delete, a compacting OPTIMIZE,
    then an UPDATE — and checks the surviving id SET and the updated
    row's identity against the oracle's purely positional replay: any
    drift in assignment or preservation breaks ``id_sum`` exactly. At
    100 TB the id plumbing is metadata-scale — a broadcast of O(files)
    (path, base) rows resolves ids for fresh files, and only rewritten
    rows ever pay id bytes."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    t = SnapshotTable(spark, _tmp("rowtrack"))
    t.enable_row_tracking()
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 599)).coalesce(1)
    )
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    t.optimize_small_files(10**9, 10**9)       # preserving rewrite
    t.update_where(
        F.col("o_orderkey") == 333,
        {"o_orderstatus": F.lit("U")},
    )
    ids = t.read_with_row_ids()
    return ids.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("_row_id").alias("n_ids"),
        F.sum("_row_id").cast("long").alias("id_sum"),
        F.max("_row_id").cast("long").alias("id_max"),
        F.max(
            F.when(F.col("o_orderkey") == 333, F.col("_row_id"))
        ).cast("long").alias("updated_rid"),
        F.sum(
            F.when(F.col("o_orderstatus") == "U", 1).otherwise(0)
        ).cast("long").alias("n_updated"),
    )


# ------------- ANALYZE / NDV column statistics (C3) ---------------------
@query(
    "stats_ndv_estimate",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_custkey AS custkey FROM orders
               WHERE o_orderkey < 2000),
         c AS (SELECT c_custkey AS custkey FROM customer)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM o) AS left_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS right_rows,
           (SELECT CAST(count(DISTINCT custkey) AS BIGINT) FROM o)
               AS ndv_l_exact,
           (SELECT CAST(count(DISTINCT custkey) AS BIGINT) FROM c)
               AS ndv_r_exact,
           (SELECT CAST(count(*) AS BIGINT)
            FROM o JOIN c USING (custkey)) AS join_rows,
           true AS ndv_l_in_tol,
           true AS ndv_r_in_tol,
           true AS est_in_tol
    """,
)
def stats_ndv_estimate(spark, sf_dir):
    """ANALYZE column statistics (AWS Glue column statistics / Redshift
    ANALYZE): ``analyze_columns`` banks a MERGEABLE Datasketches HLL
    sketch per (file, column) in run-scoped sidecars — table NDV is a
    union of O(files) KB-scale sketch rows with ZERO data reads, and a
    re-run after new commits sketches only the uncovered files. The
    estimator then prices the equi-join the classic CBO way:
    ``|L|*|R| / max(ndv)`` — here the FK shape makes the estimate land
    on the true join size, and the derived-fact oracle checks the HLL
    estimates against exact distinct counts within the sketch's
    advertised error (2^12 registers, ~1.6% RSE; 5 pct gate). At 100 TB
    the whole planning walk — row counts from banked stats, NDVs from
    sketch unions — touches metadata only."""
    from ..operators.advisor import estimate_equi_join_rows
    from ..sources.snapshots import SnapshotTable

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", F.col("o_custkey").alias("custkey"))
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    lt = SnapshotTable(spark, _tmp("ndvl"))
    rt = SnapshotTable(spark, _tmp("ndvr"))
    lt.commit_append(o)
    rt.commit_append(c)
    lt.analyze_columns(["custkey"])
    rt.analyze_columns(["custkey"])
    adv = estimate_equi_join_rows(spark, lt.root, rt.root, "custkey")
    exact_l = o.select("custkey").distinct().count()
    exact_r = c.select("custkey").distinct().count()
    join_rows = o.join(c, "custkey").count()

    def in_tol(est, exact, tol):
        return (
            est is not None
            and exact > 0
            and abs(est - exact) <= tol * exact
        )

    return spark.createDataFrame(
        [
            (
                adv["left_rows"],
                adv["right_rows"],
                exact_l,
                exact_r,
                join_rows,
                in_tol(adv["left_ndv"], exact_l, 0.05),
                in_tol(adv["right_ndv"], exact_r, 0.05),
                in_tol(adv["estimated_rows"], join_rows, 0.10),
            )
        ],
        "left_rows bigint, right_rows bigint, ndv_l_exact bigint, "
        "ndv_r_exact bigint, join_rows bigint, ndv_l_in_tol boolean, "
        "ndv_r_in_tol boolean, est_in_tol boolean",
    )


# ----------------------- COPY INTO (S49) -------------------------------
@query(
    "src_copy_into",
    oracle="""
    WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 900)
    SELECT CAST(2 AS INT) AS first_ingested,
           CAST(1 AS INT) AS second_ingested,
           CAST(1 AS INT) AS second_skipped,
           CAST(3 AS INT) AS replay_skipped,
           (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM u) AS key_sum
    """,
)
def src_copy_into(spark, sf_dir):
    """COPY INTO (Redshift COPY / Delta COPY INTO): idempotent
    FILE-LEVEL ingestion from a landing prefix — each source file loads
    exactly once per table lifetime; overlapping re-runs skip already-
    ingested files and a full replay is a no-op commit-wise. The
    ingested-source ledger rides the manifest like the streaming txn
    map (survives interleaved commits; a concurrent copy of the same
    source CONFLICTS instead of double-loading), and the load flows
    through the normal append path so constraints / generated columns /
    partition specs / row-id ranges all apply. The final table must be
    row- and sum-exact the union of the three distinct landing files —
    any double-load or lost file breaks ``n_rows``/``key_sum``. At
    100 TB this is the bookmark-free daily ingest: O(new files) work,
    O(ingested files) metadata."""
    import glob as _glob

    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    land = _tmp("copyland")
    for name, lo, hi in (
        ("a", 0, 299), ("b", 300, 599), ("c", 600, 899)
    ):
        o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(
            1
        ).write.parquet(os.path.join(land, name))
    fa, fb, fc = (
        sorted(
            _glob.glob(os.path.join(land, n, "*.parquet"))
        )
        for n in ("a", "b", "c")
    )
    t = SnapshotTable(spark, _tmp("copytab"))
    r1 = t.copy_into(fa + fb)
    r2 = t.copy_into(fb + fc)
    r3 = t.copy_into(fa + fb + fc)
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                r1["n_ingested"],
                r2["n_ingested"],
                r2["n_skipped"],
                r3["n_skipped"],
                agg["n"],
                agg["s"],
            )
        ],
        "first_ingested int, second_ingested int, second_skipped int, "
        "replay_skipped int, n_rows bigint, key_sum bigint",
    )


# ----------------------- type widening (S50) ----------------------------
@query(
    "src_type_widening",
    oracle="""
    WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 600)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u
            WHERE o_orderkey % 5 <> 0) AS n_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM u
            WHERE o_orderkey % 5 <> 0) AS key_sum,
           CAST(1 AS INT) AS widened_to_bigint,
           CAST(1 AS INT) AS zero_files_rewritten
    """,
)
def src_type_widening(spark, sf_dir):
    """TYPE WIDENING (Delta's type widening): ``widen_column`` moves a
    column UP within its family (int -> bigint here) as a METADATA-ONLY
    commit — ``zero_files_rewritten`` pins that the int32-era files
    keep byte identity, and the read path switches from a mergeSchema
    footer union (which CRASHES on mixed-width files) to an explicit
    wider schema that upcasts old files at scan time. The query then
    drives a merge-on-read DELETE spanning BOTH width eras, so the
    deletion-vector position join, the explicit-schema read, and the
    width upcast all compose — ``n_rows``/``key_sum`` are exact against
    the oracle. At 100 TB the widen costs one manifest; the
    alternative (rewrite every file to the new width) is the full-
    table-rewrite this feature exists to avoid."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders")
    t = SnapshotTable(spark, _tmp("widen"))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 300)
        .select(F.col("o_orderkey").cast("int").alias("k"))
        .coalesce(1)
    )
    pre_files = set(load_manifest(t.root, t.current_version())["files"])
    t.widen_column("k", "bigint")
    untouched = int(
        set(load_manifest(t.root, t.current_version())["files"])
        == pre_files
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 599))
        .select(F.col("o_orderkey").cast("bigint").alias("k"))
        .coalesce(1)
    )
    t.delete_where(F.col("k") % 5 == 0)
    got = t.read()
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                agg["n"],
                agg["s"],
                int(dict(got.dtypes)["k"] == "bigint"),
                untouched,
            )
        ],
        "n_rows bigint, key_sum bigint, widened_to_bigint int, "
        "zero_files_rewritten int",
    )


# ------------------- branches / tags / write-audit-publish (S51) -------
@query(
    "src_branch_wap",
    oracle="""
    WITH base AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 600),
         staged AS (SELECT o_orderkey FROM orders
                    WHERE o_orderkey BETWEEN 600 AND 899
                      AND o_orderkey % 7 <> 0),
         post AS (SELECT o_orderkey FROM orders
                  WHERE o_orderkey BETWEEN 900 AND 999),
         tagv AS (SELECT * FROM base UNION ALL SELECT * FROM staged)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM tagv) AS n_at_tag,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM tagv)
             AS key_sum_at_tag,
           (SELECT CAST(count(*) AS BIGINT) FROM tagv)
             + (SELECT CAST(count(*) AS BIGINT) FROM post) AS n_at_head,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM tagv)
             + (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM post)
             AS key_sum_at_head,
           1 AS main_isolated_during_audit, 1 AS ff_labeled,
           1 AS tag_pinned_through_vacuum, 1 AS connector_ref_read
    """,
)
def src_branch_wap(spark, sf_dir):
    """Branches + tags + WRITE-AUDIT-PUBLISH (Iceberg refs,
    ``sources/snapshots.py::create_branch/fast_forward/create_tag``).
    The production ingest gate: stage the day's load on a branch (its
    manifest log lives under ``_branches/wap``, data shared by absolute
    path — an O(metadata) fork at any table size), run the audit THERE
    (here: a DV DELETE scrubbing bad rows plus a null/negative check),
    then FAST-FORWARD main to the branch head as one atomic commit —
    consumers of main never see un-audited rows
    (``main_isolated_during_audit``). The published snapshot is TAGGED,
    and the tag pins it through a VACUUM whose version window would
    otherwise collect it (``tag_pinned_through_vacuum``) — the release
    stays time-travel-readable for as long as the tag lives. Fork and
    fast-forward copy manifests VERBATIM, so every metadata family (the
    branch's deletion vectors here) survives the publish by
    construction."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("branch_wap"))
    t.commit_append(o.filter(F.col("o_orderkey") < 600).coalesce(1))
    n_base = t.read().count()

    # WRITE: stage the new batch on a branch
    t.create_branch("wap")
    b = t.branch("wap")
    b.commit_append(
        o.filter(F.col("o_orderkey").between(600, 899)).coalesce(1)
    )
    # AUDIT on the branch: scrub rows failing the gate (DV delete),
    # then verify the staged snapshot is clean
    b.delete_where(
        (F.col("o_orderkey") >= 600) & (F.col("o_orderkey") % 7 == 0)
    )
    audit_ok = (
        b.read()
        .where(F.col("o_orderkey").isNull() | (F.col("o_orderkey") < 0))
        .count()
        == 0
    )
    isolated = int(t.read().count() == n_base and audit_ok)

    # PUBLISH: fast-forward main to the audited branch head, tag it
    t.fast_forward("wap")
    t.create_tag("release")
    tag_rows = t.read(tag="release")
    tag_agg = tag_rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]

    # main moves on; the tag pins the release through VACUUM
    t.commit_append(
        o.filter(F.col("o_orderkey").between(900, 999)).coalesce(1)
    )
    t.vacuum(retain_versions=1)
    pinned = int(
        t.read(tag="release").count() == tag_agg["n"]
    )
    ff_labeled = int(
        t.history()
        .where(F.col("operation") == "FAST_FORWARD")
        .count()
        == 1
    )
    head = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    # the engine surface reads refs too: .option("tag", ...) through
    # the registered pysnapshot format resolves the same snapshot
    from ..sources.pyds import register_snapshot_source

    register_snapshot_source(spark)
    conn_ref = int(
        spark.read.format("pysnapshot")
        .options(root=t.root, tag="release")
        .load()
        .count()
        == tag_agg["n"]
    )
    return spark.createDataFrame(
        [
            (
                tag_agg["n"],
                tag_agg["s"],
                head["n"],
                head["s"],
                isolated,
                ff_labeled,
                pinned,
                conn_ref,
            )
        ],
        "n_at_tag bigint, key_sum_at_tag bigint, n_at_head bigint, "
        "key_sum_at_head bigint, main_isolated_during_audit int, "
        "ff_labeled int, tag_pinned_through_vacuum int, "
        "connector_ref_read int",
    )


# ---------------------------- column DEFAULT values (S52) --------------
@query(
    "src_column_defaults",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey < 300 THEN NULL
                WHEN o_orderkey < 600 THEN 'landing'
                ELSE 'manual' END AS ingest_src
    FROM orders WHERE o_orderkey < 800
    """,
)
def src_column_defaults(spark, sf_dir):
    """Column DEFAULT values (SQL DEFAULT / Delta default values,
    ``sources/snapshots.py::add_column_default``): a writer contract
    carried in the manifest like CHECK constraints. Batch 1 predates
    the registration (its rows read NULL through schema merge — the
    ALTER TABLE ADD COLUMN DEFAULT contract: existing rows are never
    rewritten), batch 2 OMITS the column and the write pass computes
    the default (one scan — it rides the same pass as constraint
    observation), batch 3 SUPPLIES the column and keeps its values
    (defaults never overwrite, unlike GENERATED columns). Value-exact
    against the oracle's CASE reconstruction."""
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("defaults"))
    t.commit_append(o.filter(F.col("o_orderkey") < 300).coalesce(1))
    t.add_column_default("ingest_src", "'landing'")
    t.commit_append(
        o.filter(F.col("o_orderkey").between(300, 599)).coalesce(1)
    )
    t.commit_append(
        o.filter(F.col("o_orderkey").between(600, 799))
        .withColumn("ingest_src", F.lit("manual"))
        .coalesce(1)
    )
    return t.read().select("o_orderkey", "ingest_src")


# ---------------- GENERATED ALWAYS AS IDENTITY columns (S53) -----------
@query(
    "src_identity_column",
    oracle="""
    WITH b1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 400),
         b2 AS (SELECT o_orderkey FROM orders
                WHERE o_orderkey BETWEEN 400 AND 699)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM b1)
             + (SELECT CAST(count(*) AS BIGINT) FROM b2) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM b1)
             + (SELECT CAST(count(*) AS BIGINT) FROM b2)
             AS n_distinct_ids,
           1 AS all_aligned, 1 AS all_at_or_above_start,
           1 AS batches_disjoint, 1 AS watermark_is_max
    """,
)
def src_identity_column(spark, sf_dir):
    """Identity columns (Delta GENERATED ALWAYS AS IDENTITY,
    ``sources/snapshots.py::add_identity_column``): appends OMIT the
    column; the engine assigns ``start + k*step`` ids as a pure
    map-side expression over the head's high-water mark
    (``high + step*(1 + monotonically_increasing_id())`` — no shuffle,
    no coordination inside the batch), and the watermark advances at
    the ``_publish`` choke point from the written files' FOOTER MAX
    (O(new files) metadata). The Delta contract exactly: globally
    unique across commits and racing writers, aligned to the
    start/step lattice, gaps allowed — so the facts checked are
    uniqueness (``n_distinct_ids == n_rows``), alignment, the
    batch-2-above-batch-1 watermark ordering, and the banked watermark
    equaling the true max."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("identity"))
    t.add_identity_column("row_id", start=1000, step=3)
    t.commit_append(
        o.filter(F.col("o_orderkey") < 400).repartition(4)
    )
    max_b1 = t.read().agg(F.max("row_id")).collect()[0][0]
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 699)).repartition(3)
    )
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("row_id").alias("nd"),
        F.min(
            F.when((F.col("row_id") - 1000) % 3 == 0, 1).otherwise(0)
        ).alias("aligned"),
        F.min(
            F.when(F.col("row_id") >= 1000, 1).otherwise(0)
        ).alias("above"),
        F.max("row_id").alias("mx"),
    ).collect()[0]
    b2_min = (
        t.read()
        .where(F.col("o_orderkey") >= 400)
        .agg(F.min("row_id"))
        .collect()[0][0]
    )
    wm = load_manifest(t.root, t.current_version())["identity"][
        "row_id"
    ]["high"]
    return spark.createDataFrame(
        [
            (
                agg["n"],
                agg["nd"],
                int(agg["aligned"]),
                int(agg["above"]),
                int(b2_min > max_b1),
                int(wm == agg["mx"]),
            )
        ],
        "n_rows bigint, n_distinct_ids bigint, all_aligned int, "
        "all_at_or_above_start int, batches_disjoint int, "
        "watermark_is_max int",
    )


# ----------------------- strict schema enforcement (S54) ---------------
@query(
    "src_schema_enforcement",
    oracle="""
    WITH base AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 400),
         b2 AS (SELECT o_orderkey FROM orders
                WHERE o_orderkey BETWEEN 400 AND 599)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM base)
             + (SELECT CAST(count(*) AS BIGINT) FROM b2) AS n_rows,
           1 AS strict_rejected_new_col,
           1 AS connector_rejected_new_col,
           1 AS additive_evolved,
           1 AS mode_carried_through_commits
    """,
)
def src_schema_enforcement(spark, sf_dir):
    """Strict schema enforcement (Delta's default-on enforcement vs
    mergeSchema, ``sources/snapshots.py::set_schema_enforcement``): a
    manifest-carried table property. Under ``strict``, a write carrying
    a column the snapshot does not have FAILS — both through
    ``commit_append`` and through the pysnapshot connector (refused at
    writer construction) — so typo'd columns and upstream schema drift
    fail loudly instead of silently widening a 100 TB table; missing
    columns stay legal (they read NULL). Flipping back to ``additive``
    restores the S5 evolution contract, and the mode rides every commit
    like constraints do (``mode_carried_through_commits`` checks the
    head manifest after an ordinary append)."""
    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable, load_manifest

    register_snapshot_source(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("enforce"))
    t.commit_append(o.filter(F.col("o_orderkey") < 400).coalesce(1))
    t.set_schema_enforcement("strict")
    try:
        t.commit_append(
            o.filter(F.col("o_orderkey") < 10)
            .withColumn("typo_col", F.lit(1))
            .coalesce(1)
        )
        rejected = 0
    except ValueError:
        rejected = 1
    try:
        (
            o.filter(F.col("o_orderkey") < 10)
            .withColumn("typo_col", F.lit(1))
            .coalesce(1)
            .write.format("pysnapshot")
            .mode("append")
            .option("root", t.root)
            .save()
        )
        conn_rejected = 0
    except Exception:
        conn_rejected = 1
    # legal append under strict; the mode must survive the commit
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 599)).coalesce(1)
    )
    carried = int(
        load_manifest(t.root, t.current_version()).get("evolution")
        == "strict"
    )
    t.set_schema_enforcement("additive")
    t.commit_append(
        o.filter(F.col("o_orderkey") < 0)
        .withColumn("new_col", F.lit(1))
        .coalesce(1)
    )  # zero rows, but the schema evolves without error
    evolved = 1
    n = t.read().count()
    return spark.createDataFrame(
        [(n, rejected, conn_rejected, evolved, carried)],
        "n_rows bigint, strict_rejected_new_col int, "
        "connector_rejected_new_col int, additive_evolved int, "
        "mode_carried_through_commits int",
    )


# ----------------------------------- DEEP CLONE (S55) ------------------
@query(
    "src_deep_clone",
    oracle="""
    WITH src AS (SELECT o_orderkey FROM orders
                 WHERE o_orderkey < 500 AND o_orderkey % 5 <> 0)
    SELECT CAST(count(*) AS BIGINT) AS clone_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS clone_key_sum,
           1 AS no_shared_paths, 1 AS survives_source_vacuum,
           1 AS tombstones_copied
    FROM src
    """,
)
def src_deep_clone(spark, sf_dir):
    """DEEP CLONE (Delta's CLONE DEEP, ``snapshots.py::clone_deep``):
    the clone references byte COPIES of the source's current files —
    copies fan out as a Spark job over the path list, deletion-vector
    sidecars rewrite with the copy paths (``tombstones_copied``: rows
    the source DELETEd stay deleted in the clone), and the
    shallow-clone caveat disappears: the source is VACUUMed to nothing
    underneath and the clone still reads (``survives_source_vacuum``)
    — the backup/migration shape. ``no_shared_paths`` pins zero
    aliasing with the source."""
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("deep_src"))
    t.commit_append(o.filter(F.col("o_orderkey") < 500).coalesce(2))
    t.delete_where(F.col("o_orderkey") % 5 == 0)
    clone = t.clone_deep(_tmp("deep_dst"))
    ms = load_manifest(t.root, t.current_version())
    mc = load_manifest(clone.root, 1)
    disjoint = int(not set(ms["files"]) & set(mc["files"]))
    # vacuum the source table away entirely; the clone must not notice
    t.commit_replace(ms["files"], o.filter(F.col("o_orderkey") < 0))
    t.vacuum(retain_versions=1)
    agg = clone.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    tomb = int(
        clone.read()
        .where((F.col("o_orderkey") % 5 == 0))
        .count()
        == 0
    )
    return spark.createDataFrame(
        [(agg["n"], agg["s"], disjoint, 1, tomb)],
        "clone_rows bigint, clone_key_sum bigint, no_shared_paths int, "
        "survives_source_vacuum int, tombstones_copied int",
    )


# ------------------- CDF with update pre/post images (S56) -------------
@query(
    "src_cdf_update_images",
    oracle="""
    WITH tgt AS (SELECT o_orderkey, round(o_totalprice, 2) AS price
                 FROM orders WHERE o_orderkey < 600),
         upd AS (SELECT * FROM tgt WHERE o_orderkey % 4 = 1),
         img AS (
           SELECT o_orderkey, price, 'update_preimage' AS change_type
           FROM upd
           UNION ALL
           SELECT o_orderkey, round(price + 500.0, 2),
                  'update_postimage'
           FROM upd
           UNION ALL
           SELECT o_orderkey, price, 'delete' FROM tgt
           WHERE o_orderkey % 4 = 2)
    SELECT o_orderkey, price, change_type, 'batch' AS feed FROM img
    UNION ALL
    SELECT o_orderkey, price, change_type, 'stream' AS feed FROM img
    """,
)
def src_cdf_update_images(spark, sf_dir):
    """Change feed with UPDATE PRE/POST IMAGES
    (``snapshots.py::read_changes_images``, Delta CDF's
    ``update_preimage``/``update_postimage``): the two halves of every
    update are paired on the PERMANENT ROW ID (row tracking), so a CDC
    consumer sees "this is the same row, before and after" instead of
    an anonymous delete+insert — replication into surrogate-keyed
    systems and feature back-outs need exactly this. One commit does an
    MOR UPDATE (+500 on keys %4==1) and one an MOR DELETE (keys %4==2);
    the feed between the bracketing versions must carry the correlated
    image pairs and the plain deletes, and NOTHING for untouched rows.
    Cost is O(churn): only files whose DV set changed scan, and the
    pairing join moves scalar ids.

    The ``stream`` half unions the SAME feed through the connector's
    CDF reader — the per-file partitions the STREAMING reader plans,
    now emitting each row's permanent ``_row_id`` — paired per commit
    by ``pair_update_images`` (the foreachBatch-shaped join an
    always-on CDC consumer runs per epoch at O(epoch churn)). Both
    halves must be value-identical: one pairing semantics, batch and
    stream."""
    from ..sources.pyds import (
        pair_update_images,
        register_snapshot_source,
    )
    from ..sources.snapshots import SnapshotTable

    register_snapshot_source(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    t = SnapshotTable(spark, _tmp("cdf_img"))
    t.enable_row_tracking()
    t.commit_append(
        o.filter(F.col("o_orderkey") < 600).repartition(2)
    )
    v_from = t.current_version()
    t.update_where(
        F.col("o_orderkey") % 4 == 1,
        {"price": F.round(F.col("price") + 500.0, 2)},
    )
    t.delete_where(F.col("o_orderkey") % 4 == 2)
    v_to = t.current_version()
    batch = t.read_changes_images(v_from, v_to).select(
        "o_orderkey",
        "price",
        F.col("_change_type").alias("change_type"),
        F.lit("batch").alias("feed"),
    )
    streamed = pair_update_images(
        spark.read.format("pysnapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", str(v_from))
        .option("endingVersion", str(v_to))
        .load()
    ).select(
        "o_orderkey",
        "price",
        F.col("_change_type").alias("change_type"),
        F.lit("stream").alias("feed"),
    )
    return batch.unionAll(streamed)


# ----------------------- files() / DESCRIBE DETAIL (S57) ---------------
@query(
    "src_table_detail",
    oracle="""
    WITH t AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 800)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM t
            WHERE o_orderkey % 9 <> 0) AS num_rows,
           3 AS n_files, 1 AS sizes_match_stat, 1 AS files_rows_match,
           1 AS dv_file_counted, 1 AS detail_features
    """,
)
def src_table_detail(spark, sf_dir):
    """Metadata tables (Iceberg's ``table.files`` / Delta's DESCRIBE
    DETAIL, ``snapshots.py::files/detail``): the operational surface —
    one row per visible file with banked size, banked row count, and
    live tombstone-sidecar count, plus a one-row table summary whose
    row total subtracts DV tombstones exactly. EVERYTHING answers from
    the manifest: zero file opens at any table size
    (``sizes_match_stat`` cross-checks the banked sizes against the
    filesystem at gate SF; ``files_rows_match`` checks the per-file
    banked row counts sum to the file count ledger; the detail dict
    must report the features actually in force)."""
    import os as _os

    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t = SnapshotTable(spark, _tmp("detail"))
    t.commit_append(
        o.filter(F.col("o_orderkey") < 400).repartition(2),
        stats_cols=["o_orderkey"],
    )
    t.add_constraint("nonneg", "o_orderkey >= 0")
    t.commit_append(
        o.filter(F.col("o_orderkey").between(400, 799)).coalesce(1),
        stats_cols=["o_orderkey"],
    )
    t.delete_where(F.col("o_orderkey") % 9 == 0)
    fdf = t.files().collect()
    sizes_ok = int(
        all(r.size_bytes == _os.path.getsize(r.path) for r in fdf)
    )
    rows_ok = int(
        sum(r.num_rows for r in fdf) == t.read(3).count()
    )  # banked counts are PRE-tombstone physical rows
    dv_ok = int(sum(r.n_dv_sidecars for r in fdf) >= 1)
    d = t.detail()
    features_ok = int(
        d["n_constraints"] == 1
        and d["schema_enforcement"] == "additive"
        and d["n_dv_files"] >= 1
        and d["size_bytes"] == sum(r.size_bytes for r in fdf)
    )
    return spark.createDataFrame(
        [
            (
                d["num_rows"],
                d["n_files"],
                sizes_ok,
                rows_ok,
                dv_ok,
                features_ok,
            )
        ],
        "num_rows bigint, n_files int, sizes_match_stat int, "
        "files_rows_match int, dv_file_counted int, "
        "detail_features int",
    )


# ---------------- manifest-log checkpointing (S58) ---------------------
@query(
    "src_log_checkpoint",
    oracle="""
    WITH s AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 1000)
    SELECT 23 AS n_versions, 0 AS head_metadata_reads,
           1 AS ckpt_reads, 15 AS hist_tail_reads, 1 AS hist_identical,
           13 AS asof_mid, 4 AS post_vacuum_versions,
           (SELECT CAST(count(*) AS BIGINT) FROM s) AS head_rows,
           (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM s) AS head_sum,
           1 AS ckpt_capped, 3 AS asof_below_floor
    """,
)
def src_log_checkpoint(spark, sf_dir):
    """Manifest-log CHECKPOINTING + O(1) head resolution (the Delta
    ``_last_checkpoint`` shape, ``sources/snapshots.py::write_checkpoint``):
    23 commits land checkpoints at v10/v20 and a head pointer, so a
    FRESH table handle resolves the head with ZERO manifest reads and
    zero directory listings (``head_metadata_reads``; the pointer probe
    is O(commits-since-pointer) file stats), ``history()`` serves
    v13..v20 from the checkpoint's capped index — ONE checkpoint
    read plus exactly the 12 below-floor manifests and the 3 tail
    manifests (``hist_tail_reads``=15; with the production window of
    1024 the floor walk is empty and this is 3) — and TIMESTAMP AS OF
    resolves inside the index (``asof_mid``:
    ts=13.5 → v13 without walking 23 manifests). The checkpoint is a
    CACHE: rows must equal the raw full walk bit-for-bit
    (``hist_identical`` re-walks with the pointer removed), and VACUUM
    rebuilds it from the post-sweep log (``post_vacuum_versions``: the
    index never resurrects vacuumed versions). This is what keeps a
    streaming table committing every minute for a year (~500k
    versions) from paying a 500k-file listing on every open — the
    exact problem Delta's checkpoint files exist to solve. Round 8
    adds the HISTORY CAP (``CHECKPOINT_HISTORY_WINDOW``): the
    checkpoint banks only the newest window of history rows so its
    byte size stays FLAT as versions accumulate (run here with the
    window forced to 8, so the v20 checkpoint holds rows 13..20 and
    ``history_floor``=13); rows below the floor come from the
    ordinary manifest walk — ``hist_identical`` now proves the
    stitched (walk + index + tail) history equals the raw full walk
    bit-for-bit, and ``asof_below_floor`` proves TIMESTAMP AS OF
    still resolves targets older than the banked window (ts=3.5 →
    v3, the cold path)."""
    from ..sources import snapshots as _snap
    from ..sources.snapshots import (
        LOG_METRICS,
        SnapshotTable,
        load_checkpoint,
        version_as_of,
    )

    def reset():
        for k in LOG_METRICS:
            LOG_METRICS[k] = 0

    ticks = iter(float(i) for i in range(1, 40))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey").filter(
        F.col("o_orderkey") < 1000
    )
    t = SnapshotTable(spark, _tmp("logckpt"), clock=lambda: next(ticks))
    prev_window = _snap.CHECKPOINT_HISTORY_WINDOW
    _snap.CHECKPOINT_HISTORY_WINDOW = 8
    try:
        for i in range(23):
            t.commit_append(
                o.filter(F.col("o_orderkey") % 23 == i).coalesce(1)
            )
    finally:
        _snap.CHECKPOINT_HISTORY_WINDOW = prev_window
    ck = load_checkpoint(t.root)
    ckpt_capped = int(
        len(ck.get("history", [])) == 8
        and int(ck.get("history_floor")) == 13
    )
    # TIMESTAMP AS OF below the banked window: manifest-walk cold path
    asof_below_floor = version_as_of(t.root, 3.5)
    # 1. fresh handle resolves head from the pointer: zero manifest
    # reads, zero listings (pointer probe = file stats only)
    t2 = SnapshotTable(spark, t.root)
    reset()
    n_versions = t2.current_version()
    head_metadata_reads = (
        LOG_METRICS["manifest_reads"] + LOG_METRICS["listdir_scans"]
    )
    # 2. history: one checkpoint read + the 3 post-checkpoint manifests
    reset()
    with_ck = [tuple(r) for r in t2.history().collect()]
    ckpt_reads = LOG_METRICS["checkpoint_reads"]
    hist_tail_reads = LOG_METRICS["manifest_reads"]
    # 3. the checkpoint is a cache: identical to the raw full walk
    ptr = os.path.join(t.root, "_manifests", "_last_checkpoint.json")
    os.unlink(ptr)
    without_ck = [tuple(r) for r in t2.history().collect()]
    hist_identical = int(with_ck == without_ck)
    # 4. TIMESTAMP AS OF rides the checkpoint's ts index
    asof_mid = version_as_of(t.root, 13.5)
    # 5. VACUUM rebuilds the checkpoint from the post-sweep log
    t.vacuum(retain_versions=4)
    post_vacuum_versions = len(t.history().collect())
    agg = t.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                n_versions,
                head_metadata_reads,
                ckpt_reads,
                hist_tail_reads,
                hist_identical,
                asof_mid,
                post_vacuum_versions,
                agg["n"],
                agg["s"],
                ckpt_capped,
                asof_below_floor,
            )
        ],
        "n_versions int, head_metadata_reads int, ckpt_reads int, "
        "hist_tail_reads int, hist_identical int, asof_mid int, "
        "post_vacuum_versions int, head_rows bigint, head_sum bigint, "
        "ckpt_capped int, asof_below_floor int",
    )


@query(
    "src_partitions_table",
    oracle="""
    SELECT o_orderpriority AS priority,
           2 AS n_files,
           CAST(count(*) AS BIGINT) AS banked_rows,
           1 AS stats_ok
    FROM orders WHERE o_orderkey < 8000
    GROUP BY o_orderpriority
    """,
)
def src_partitions_table(spark, sf_dir):
    """The ``partitions`` metadata table (Iceberg's table.partitions,
    S57's layout-facing sibling): per live partition tuple — visible
    file count, banked byte and row totals, DV-sidecar presence,
    stats coverage — from a PURE manifest walk (zero file opens; the
    totals come from the commit-time stats the manifest already
    banks). Two appends onto a spec'd table land one file per live
    priority each, so every priority reports exactly 2 files and its
    banked row total equals the source's per-priority count, proven
    value-exact against the raw table."""
    import tempfile as _tf

    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_partsmeta_"))
    t.set_partition_spec(["o_orderpriority"])
    t.commit_append(
        o.filter(F.col("o_orderkey") < 4000),
        stats_cols=["o_orderkey"],
    )
    t.commit_append(
        o.filter(
            (F.col("o_orderkey") >= 4000) & (F.col("o_orderkey") < 8000)
        ),
        stats_cols=["o_orderkey"],
    )
    p = t.partitions()
    return p.select(
        F.get_json_object(
            F.col("partition_values"), "$.o_orderpriority"
        ).alias("priority"),
        F.col("n_files").cast("int").alias("n_files"),
        F.col("banked_rows").alias("banked_rows"),
        (
            F.col("stats_complete").cast("int")
            * (F.col("n_dv_sidecars") == 0).cast("int")
        ).alias("stats_ok"),
    )


@query(
    "src_partition_transforms",
    oracle="""
    SELECT CAST((SELECT count(*) FROM events
                 WHERE ts >= TIMESTAMP '2024-01-05'
                   AND ts <  TIMESTAMP '2024-01-06') AS BIGINT)
             AS rows_day,
           CAST((SELECT count(*) FROM events WHERE user_id = 42)
                 AS BIGINT) AS rows_user,
           1 AS day_pruned, 1 AS bucket_pruned, 1 AS hidden
    """,
)
def src_partition_transforms(spark, sf_dir):
    """Iceberg-style HIDDEN PARTITIONING (S61): the partition spec
    carries TRANSFORMS — ``day(ts)`` and ``bucket(user_id, 8)`` here —
    so writes cluster one file per (day, hash-bucket) tuple under
    derived ``__part_day_ts=`` / ``__part_bucket_user_id_8=`` path
    segments while user queries keep predicating on the RAW columns:
    ``partition_pruned_files({'ts': X})`` pushes the literal through
    the exact write-side expression (same engine code path, so Murmur3
    bucketing and date formatting can never disagree between build and
    probe) and prunes to one day's buckets; equality on user_id prunes
    to one bucket per day. Facts prove pruning strictly shrank the
    file set WITHOUT losing rows (superset contract: pruned read +
    residual filter == full read + filter, value-exact)."""
    import datetime as _dt
    import tempfile as _tf

    from ..sources.snapshots import SnapshotTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_hidpart_"))
    t.set_partition_spec(["day(ts)", "bucket(user_id, 8)"])
    t.commit_append(ev)
    n_files = t.file_count()
    day = _dt.datetime(2024, 1, 5)
    day_files = t.partition_pruned_files({"ts": day})
    user_files = t.partition_pruned_files({"user_id": 42})
    rows_day = (
        t.read_partition({"ts": day})
        .filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-06").cast("timestamp_ntz"))
        )
        .count()
    )
    rows_user = (
        t.read_partition({"user_id": 42})
        .filter(F.col("user_id") == 42)
        .count()
    )
    full_day = ev.filter(
        (F.col("ts") >= F.lit("2024-01-05").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-06").cast("timestamp_ntz"))
    ).count()
    full_user = ev.filter(F.col("user_id") == 42).count()
    return spark.createDataFrame(
        [
            (
                rows_day,
                rows_user,
                int(0 < len(day_files) < n_files and rows_day == full_day),
                int(
                    0 < len(user_files) < n_files
                    and rows_user == full_user
                ),
                int("__part_day_ts=" in t.files().collect()[0]["path"]),
            )
        ],
        "rows_day long, rows_user long, day_pruned int, "
        "bucket_pruned int, hidden int",
    )


@query(
    "src_partition_range_pruning",
    oracle="""
    SELECT CAST((SELECT count(*) FROM events
                 WHERE event_id % 2 = 0
                   AND ts >= TIMESTAMP '2024-01-03'
                   AND ts <= TIMESTAMP '2024-01-05 12:00:00')
                AS BIGINT) AS rows_range,
           1 AS day_span_exact, 1 AS month_era_excluded,
           1 AS halfopen_exact
    """,
)
def src_partition_range_pruning(spark, sf_dir):
    """Range pruning through MONOTONE partition transforms (S62 /
    VERDICT-r7 directive #6): ``ts BETWEEN a AND b`` on a
    day-partitioned table keeps exactly the day span's files at the
    MANIFEST WALK — Iceberg's inclusive projection (lo <= x <= hi ⟹
    T(lo) <= T(x) <= T(hi) for monotone T), zero file opens, zone maps
    not consulted. The table carries TWO layout eras (hidden
    partitioning is path-driven): a ``day(ts)`` era and, after spec
    evolution, a ``month(ts)`` era holding March data — the range
    cuts the day era to its exact day span AND excludes every
    month-era file by its month segment. Facts prove the span is
    EXACT (kept day-era files == distinct days the data has in the
    span), the evolved era pruned, half-open ranges behave, and the
    pruned read + residual filter loses no rows vs the oracle."""
    import datetime as _dt
    import tempfile as _tf

    from ..sources.snapshots import SnapshotTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    era1 = ev.filter(F.col("event_id") % 2 == 0)
    # the month-era rows live in 2024-03: provably outside the range
    era2 = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "ts", F.col("ts") + F.make_interval(F.lit(0), F.lit(2))
    )
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_rngprune_"))
    t.set_partition_spec(["day(ts)"])
    t.commit_append(era1)
    n_day_era = t.file_count()
    t.set_partition_spec(["month(ts)"])
    t.commit_append(era2)
    lo = _dt.datetime(2024, 1, 3)
    hi = _dt.datetime(2024, 1, 5, 12)
    kept = t.partition_pruned_files({}, ranges={"ts": (lo, hi)})
    kept_day = [f for f in kept if "__part_day_ts=" in f]
    kept_month = [f for f in kept if "__part_month_ts=" in f]
    days_in_span = (
        era1.filter(F.col("ts").between(lo, hi))
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .count()
    )
    rows_range = (
        t.read_partition({}, ranges={"ts": (lo, hi)})
        .filter(F.col("ts").between(lo, hi))
        .count()
    )
    # half-open: >= lo keeps every day-era file from the span start on
    open_hi = t.partition_pruned_files({}, ranges={"ts": (lo, None)})
    open_day = [f for f in open_hi if "__part_day_ts=" in f]
    halfopen_ok = len(open_day) == n_day_era - (
        era1.filter(F.col("ts") < _dt.datetime(2024, 1, 3))
        .select(F.date_format("ts", "yyyy-MM-dd"))
        .distinct()
        .count()
    )
    return spark.createDataFrame(
        [
            (
                rows_range,
                int(len(kept_day) == days_in_span > 0),
                int(len(kept_month) == 0),
                int(halfopen_ok),
            )
        ],
        "rows_range long, day_span_exact int, "
        "month_era_excluded int, halfopen_exact int",
    )


@query(
    "src_partition_drop_metadata",
    oracle="""
    SELECT CAST((SELECT count(*) FROM events
                 WHERE NOT (ts >= TIMESTAMP '2024-01-05'
                            AND ts < TIMESTAMP '2024-01-06'))
                AS BIGINT) AS rows_after,
           CAST((SELECT count(*) FROM events
                 WHERE ts >= TIMESTAMP '2024-01-05'
                   AND ts < TIMESTAMP '2024-01-06')
                AS BIGINT) AS rows_dropped_cdf,
           1 AS zero_new_files, 1 AS bytes_untouched,
           1 AS prespec_guard
    """,
)
def src_partition_drop_metadata(spark, sf_dir):
    """METADATA-ONLY partition delete (round 8; Iceberg's ALTER TABLE
    DROP PARTITION / Delta's partition-aligned DELETE fast path):
    dropping ``day_ts = 2024-01-05`` on a day-partitioned events table
    removes that day's files from the manifest in ONE commit with zero
    data IO — facts prove no file was written (the post-drop manifest
    is a strict subset of the pre-drop one) and no byte moved (the
    dropped files still sit on disk untouched, reclaimable by VACUUM).
    The change feed reports the dropped rows as ordinary deletes via
    the manifest diff. A table holding ANY file without the requested
    segment refuses the call (provable completeness — the guard is
    fact-checked on a pre-spec layout)."""
    import tempfile as _tf

    from ..sources.snapshots import SnapshotTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_pdrop_"))
    t.set_partition_spec(["day(ts)"])
    t.commit_append(ev)
    before = set(t.partition_pruned_files({}))
    v = t.drop_partitions({"day_ts": "2024-01-05"})
    after = set(t.partition_pruned_files({}, version=v))
    dropped = before - after
    zero_new = int(after < before and not (after - before))
    import os as _os

    untouched = int(
        bool(dropped) and all(_os.path.exists(f) for f in dropped)
    )
    cdf = t.read_changes(v - 1, v)
    rows_dropped = cdf.filter(
        F.col("_change_type") == "delete"
    ).count()
    # pre-spec layouts refuse: provable completeness
    t2 = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_pdrop2_"))
    t2.commit_append(ev.limit(10))  # no spec: no segments
    try:
        t2.drop_partitions({"day_ts": "2024-01-05"})
        guard = 0
    except ValueError:
        guard = 1
    return spark.createDataFrame(
        [
            (
                t.read().count(),
                rows_dropped,
                zero_new,
                untouched,
                guard,
            )
        ],
        "rows_after long, rows_dropped_cdf long, zero_new_files int, "
        "bytes_untouched int, prespec_guard int",
    )


# ---------------- CONVERT TO snapshot (S69) ----------------------------
@query(
    "src_convert_in_place",
    oracle="""
    WITH src AS (SELECT o_orderkey, o_custkey FROM orders
                 WHERE o_orderkey < 800)
    SELECT 4 AS n_files, 1 AS paths_identical, 1 AS bytes_untouched,
           CAST((SELECT count(*) FROM src) AS BIGINT) AS converted_rows,
           0 AS zone_false_keeps, 1 AS dml_live,
           CAST((SELECT count(*) FROM src) AS BIGINT) AS time_travel_rows,
           1 AS op_labeled
    """,
)
def src_convert_in_place(spark, sf_dir):
    """CONVERT TO SNAPSHOT (round 8 — Delta's CONVERT TO DELTA /
    Iceberg migrate): an existing PLAIN parquet directory becomes a
    snapshot table IN PLACE through one SQL statement. v1 references
    the discovered files exactly where they lie (``paths_identical``;
    mtimes prove zero bytes rewritten), the optional STATS FOR COLUMNS
    clause banks footer min/max so zone pruning works from the first
    read (``zone_false_keeps``: an out-of-range probe keeps zero
    files), and the log is fully live from v1 — a merge-on-read DELETE
    lands as v2 while v1 still time-travels to the converted set. The
    migration story for a 100 TB parquet lake: one footer pass, no
    data movement, every table feature (MERGE/CDF/OPTIMIZE/branches)
    available immediately (``sources/snapshots.py::convert_parquet_dir``,
    ``sql_dml.py::_CONVERT``)."""
    import os as _os
    import tempfile as _tf

    from ..sql_dml import snapshot_sql
    from ..sources.snapshots import SnapshotTable, load_manifest

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).filter(F.col("o_orderkey") < 800)
    n_src = src.count()
    d = _tf.mkdtemp(prefix="spark_convert_")
    src.repartition(4).write.mode("overwrite").parquet(d)
    before = {
        _os.path.join(wr, f): _os.path.getmtime(_os.path.join(wr, f))
        for wr, _x, fs in _os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    }
    v = snapshot_sql(
        spark,
        f"CONVERT TO SNAPSHOT parquet.`{d}` "
        "STATS FOR COLUMNS o_orderkey",
    )
    t = SnapshotTable(spark, d)
    m = load_manifest(d, 1)
    paths_identical = int(
        v == 1 and sorted(m["files"]) == sorted(before)
    )
    bytes_untouched = int(
        all(_os.path.getmtime(p) == ts for p, ts in before.items())
    )
    converted_rows = t.read().count()
    keep, _total = t.pruned_files("o_orderkey", 10_000_000, None)
    zone_false_keeps = len(keep)
    t.delete_where(F.col("o_orderkey") % 2 == 0)
    dml_live = int(
        t.read().count()
        == src.filter(F.col("o_orderkey") % 2 != 0).count()
    )
    ops = [r["operation"] for r in t.history().collect()]
    return spark.createDataFrame(
        [
            (
                len(m["files"]),
                paths_identical,
                bytes_untouched,
                converted_rows,
                zone_false_keeps,
                dml_live,
                t.read(1).count(),
                int(ops[-1] == "CONVERT"),
            )
        ],
        "n_files int, paths_identical int, bytes_untouched int, "
        "converted_rows bigint, zone_false_keeps int, dml_live int, "
        "time_travel_rows bigint, op_labeled int",
    )


# ---------------- write-serializable DML rebase (S70) ------------------
@query(
    "src_dml_rebase",
    oracle="""
    WITH src AS (SELECT o_orderkey AS k FROM orders
                 WHERE o_orderkey < 300),
         app AS (SELECT o_orderkey AS k FROM orders
                 WHERE o_orderkey BETWEEN 1000 AND 1299)
    SELECT 3 AS head_after_delete,
           CAST((SELECT count(*) FROM src WHERE k % 2 <> 0)
                + (SELECT count(*) FROM app) AS BIGINT) AS rows_after,
           CAST((SELECT count(*) FROM app WHERE k % 2 = 0) AS BIGINT)
             AS surviving_appended_evens,
           1 AS rewrite_conflicts, 1 AS concurrent_delete_conflicts,
           CAST((SELECT count(*) FROM src) AS BIGINT) AS v1_rows
    """,
)
def src_dml_rebase(spark, sf_dir):
    """Write-serializable DML rebase (round 8 — Delta's WriteSerializable
    conflict rules): a MOR DELETE that loses the manifest race to a
    concurrent PURE APPEND re-publishes on top of the new head instead
    of failing — the delete serializes BEFORE the append, so the
    appended rows (including ones matching the predicate!) are not
    subject to it, exactly the result of running the two serially.
    Anything that touched rows the delete READ refuses the rebase: a
    concurrent REWRITE (positions into replaced files cannot remap) and
    a concurrent DELETE (rebasing over a same-row tombstone could
    resurrect it as a post-image — no serial order produces that) both
    surface CommitConflict with nothing half-applied. The race is
    injected by wrapping ``_publish`` so the concurrent commit lands
    between the victim's read and its publish — the exact window a
    1000-executor streaming ingest + background GDPR delete collide in
    (``sources/snapshots.py::_dml_rebase_ok``)."""
    import tempfile as _tf

    from ..sources import snapshots as _snap
    from ..sources.snapshots import CommitConflict, SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    base = o.filter(F.col("k") < 300)
    appended = o.filter(F.col("k").between(1000, 1299))
    v1_rows = base.count()

    def race_once(root, action):
        orig = SnapshotTable._publish
        state = {"fired": False}

        def racy(self, *a, **kw):
            if not state["fired"]:
                state["fired"] = True
                action(SnapshotTable(spark, root))
            return orig(self, *a, **kw)

        SnapshotTable._publish = racy
        return orig

    t = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_rebase_"))
    t.commit_append(base.coalesce(2))
    orig = race_once(
        t.root, lambda h: h.commit_append(appended.coalesce(1))
    )
    try:
        head = t.delete_where(F.col("k") % 2 == 0)
    finally:
        SnapshotTable._publish = orig
    survivors = t.read()
    rows_after = survivors.count()
    surviving_evens = survivors.filter(
        (F.col("k") >= 1000) & (F.col("k") % 2 == 0)
    ).count()
    # a concurrent rewrite refuses the rebase
    t2 = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_rebase2_"))
    t2.commit_append(base.coalesce(2))
    orig = race_once(
        t2.root, lambda h: h.commit_rewrite(h.read().coalesce(1))
    )
    try:
        t2.delete_where(F.col("k") % 2 == 0)
        rewrite_conflicts = 0
    except CommitConflict:
        rewrite_conflicts = 1
    finally:
        SnapshotTable._publish = orig
    # a concurrent delete (same-row hazard) refuses too
    t3 = SnapshotTable(spark, _tf.mkdtemp(prefix="spark_rebase3_"))
    t3.commit_append(base.coalesce(2))
    orig = race_once(
        t3.root, lambda h: h.delete_where(F.col("k") == 7)
    )
    try:
        t3.delete_where(F.col("k") % 2 == 0)
        dd_conflicts = 0
    except CommitConflict:
        dd_conflicts = 1
    finally:
        SnapshotTable._publish = orig
    return spark.createDataFrame(
        [
            (
                head,
                rows_after,
                surviving_evens,
                rewrite_conflicts,
                dd_conflicts,
                t.read(1).count(),
            )
        ],
        "head_after_delete int, rows_after bigint, "
        "surviving_appended_evens bigint, rewrite_conflicts int, "
        "concurrent_delete_conflicts int, v1_rows bigint",
    )
