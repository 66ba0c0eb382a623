"""Sketch & robust-statistics queries: mergeable distinct-count structures
(HyperLogLog, roaring bitmaps) and exact order statistics.

Mergeability is THE scale property here: a sketch computed per partition /
per day / per source can be unioned into the global answer without
re-touching raw data — the pattern behind incremental rollups and
billion-row distinct counts. The bitmap path is exact and the HLL path is
approximate; both aggregate map-side and shuffle only fixed-size state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "sk_hll_union_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS exact_distinct,
           CAST(TRUE AS INTEGER) AS merged_within_tol
    FROM lineitem
    """,
)
def sk_hll_union_distinct(spark, sf_dir):
    """HLL sketch mergeability (derived-fact oracle): per-returnflag
    sketches of ``l_partkey`` union into a global estimate that must land
    within 5% of the exact distinct count. The oracle reproduces the exact
    count and the tolerance verdict; the sketch plumbing (fixed-size
    partial state, map-side combine, lossless union) is what's under test.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", F.lit(14)).alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = li.agg(F.count_distinct("l_partkey").alias("exact_distinct"))
    return exact.join(F.broadcast(merged)).select(
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).cast("int").alias("merged_within_tol"),
    )


@query(
    "sk_bitmap_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sk_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via mergeable bitmaps: bucket the key space
    (``bitmap_bucket_number``), build one fixed-size bitmap per
    (group, bucket) with map-side combine, then sum the bucket
    cardinalities. Unlike ``count(DISTINCT)`` this never shuffles raw keys
    — only <=4KB bitmaps — and the per-bucket bitmaps are unionable across
    days/partitions for incremental maintenance. Output is exact, so the
    oracle is the plain COUNT(DISTINCT).
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag",
        F.bitmap_bucket_number(F.col("l_partkey")).alias("__bucket"),
    ).agg(
        F.bitmap_count(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey")))
        ).alias("__cnt")
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum("__cnt").alias("distinct_parts")
    )


@query(
    "agg_median_mode",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, median(o_totalprice) AS median_price,
             count(*) AS n_orders
      FROM orders GROUP BY o_orderpriority
    ), cnt AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS c
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), md AS (
      SELECT o_orderpriority, min(o_orderstatus) AS mode_status
      FROM cnt c1
      WHERE c = (SELECT max(c) FROM cnt c2
                 WHERE c2.o_orderpriority = c1.o_orderpriority)
      GROUP BY o_orderpriority
    )
    SELECT med.o_orderpriority, median_price, n_orders, mode_status
    FROM med JOIN md USING (o_orderpriority)
    """,
)
def agg_median_mode(spark, sf_dir):
    """Exact median and deterministic mode per order priority.

    Median uses the engine's exact implementation (both engines average
    the two middle doubles for even counts — same IEEE operation, so the
    comparison is bit-exact). Mode is computed explicitly as
    min-of-argmax-count because built-in ``mode()`` breaks ties
    arbitrarily in BOTH engines — a cross-engine determinism trap.
    """
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("median_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    cnt = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = cnt.groupBy(F.col("o_orderpriority").alias("__p")).agg(
        F.max("c").alias("mc")
    )
    md = (
        cnt.join(
            mx,
            (cnt.o_orderpriority == F.col("__p")) & (cnt.c == F.col("mc")),
        )
        .groupBy("o_orderpriority")
        .agg(F.min("o_orderstatus").alias("mode_status"))
    )
    return med.join(md, "o_orderpriority")


@query(
    "sk_countmin_heavy_hitters",
    oracle="""
    WITH cnt AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY l_partkey
      ORDER BY exact_cnt DESC, l_partkey LIMIT 10)
    SELECT l_partkey, exact_cnt, 1 AS lower_ok, 1 AS upper_ok FROM cnt
    """,
)
def sk_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch point-frequency estimates for the exact top-10 keys
    (derived-fact oracle). The CMS aggregates distributed with map-side
    partial merge (fixed w x d counter grid shuffles, never raw keys — the
    mergeability that lets per-day/per-source sketches union into a global
    frequency table); the driver pulls ONE serialized sketch plus the 10
    (key, exact_cnt) rows — scalars, not data. Facts: the exact counts
    (oracle-reproducible) and the CMS guarantees — estimate >= true always
    (lower_ok), estimate <= true + eps*N at the configured confidence
    (upper_ok; eps=1e-4 and a pinned seed make both deterministic here).
    """
    li = load_table(spark, sf_dir, "lineitem")
    eps, conf, seed = 1e-4, 0.99, 42
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("l_partkey"))
        .limit(10)
        .collect()
    )
    sk_row = li.agg(
        F.count_min_sketch(
            "l_partkey", F.lit(eps), F.lit(conf), F.lit(seed)
        ).alias("sk")
    ).collect()[0]
    cms = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["sk"])
    )
    slack = eps * cms.totalCount()
    rows = [
        (
            int(r["l_partkey"]),
            int(r["exact_cnt"]),
            int(cms.estimateCount(int(r["l_partkey"])) >= r["exact_cnt"]),
            int(cms.estimateCount(int(r["l_partkey"])) <= r["exact_cnt"] + slack),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "l_partkey bigint, exact_cnt bigint, lower_ok int, upper_ok int"
    )
