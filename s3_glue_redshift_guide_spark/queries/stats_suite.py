"""Statistics / cost-based-planning queries (SURVEY.md §2 — catalog stats).

The reference's crawler persists ``recordCount`` / ``averageRecordSize`` /
``sizeKey`` table properties and the warehouse ANALYZEs tables so its
planner can pick distribution strategies. ``stats_table_sizing`` is the
engine-side equivalent: one aggregate pass per table computes row count and
a deterministic in-memory size estimate (integer arithmetic only — fixed
type widths plus octet_length for strings — so DuckDB reproduces every
byte), then applies the same strategy rule ``stats.choose_strategy`` uses:
broadcast below 128 KiB, shuffle-hash build below 2 MiB, else sort-merge.

The thresholds here are scaled to the sf0.01 gate so all three branches are
exercised; production planning goes through ``stats.plan_join`` where the
broadcast cutoff defaults to Spark's own 10 MiB conf value.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..stats import ROW_OVERHEAD, size_bytes_expr
from .registry import query

_TABLES = ("nation", "supplier", "customer", "orders", "lineitem")
_BROADCAST = 128 * 1024
_HASH = 16 * _BROADCAST


def _oracle_leg(name: str, fixed: int, str_cols: tuple[str, ...]) -> str:
    # DuckDB strlen() = byte length of a VARCHAR (its octet_length is
    # BLOB-only); matches Spark's octet_length on the same UTF-8 data
    strs = " + ".join(
        f"CASE WHEN {c} IS NULL THEN 0 ELSE strlen({c}) END" for c in str_cols
    )
    return f"""
    SELECT '{name}' AS table_name, count(*) AS n_rows,
           CAST(sum({fixed} + {strs}) AS BIGINT) AS data_bytes
    FROM {name}"""


_ORACLE = f"""
WITH sizing AS (
  {_oracle_leg("nation", 8, ("n_name",))}
  UNION ALL {_oracle_leg("supplier", 20, ("s_name",))}
  UNION ALL {_oracle_leg("customer", 20, ("c_name", "c_mktsegment"))}
  UNION ALL {_oracle_leg("orders", 32, ("o_orderstatus", "o_orderpriority"))}
  UNION ALL {_oracle_leg(
      "lineitem", 68, ("l_returnflag", "l_linestatus"))}
)
SELECT table_name, n_rows, data_bytes,
       data_bytes + n_rows * {ROW_OVERHEAD} AS est_bytes,
       CASE WHEN data_bytes + n_rows * {ROW_OVERHEAD} <= {_BROADCAST}
              THEN 'broadcast'
            WHEN data_bytes + n_rows * {ROW_OVERHEAD} <= {_HASH}
              THEN 'shuffle_hash'
            ELSE 'sort_merge' END AS join_strategy
FROM sizing
"""


@query("stats_table_sizing", oracle=_ORACLE)
def stats_table_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-equivalent sizing report driving join strategy. Five
    single-pass aggregates (count + byte-width sum, both partial-
    aggregatable: one reduce row per partition per table) unioned into a
    tidy report; the strategy CASE is the same rule stats.choose_strategy
    applies when planning a join against a larger fact side."""

    def sizing(name: str) -> DataFrame:
        df = load_table(spark, sf_dir, name)
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(size_bytes_expr(df)).cast("long").alias("data_bytes"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "data_bytes")

    u = reduce(DataFrame.unionByName, [sizing(n) for n in _TABLES])
    est = F.col("data_bytes") + F.col("n_rows") * F.lit(ROW_OVERHEAD)
    return u.withColumn("est_bytes", est).withColumn(
        "join_strategy",
        F.when(est <= _BROADCAST, "broadcast")
        .when(est <= _HASH, "shuffle_hash")
        .otherwise("sort_merge"),
    )


# ------------------ snapshot-size join advisor (C2) --------------------
@query(
    "stats_join_advisor",
    oracle="""
    WITH f AS (SELECT o_orderkey, o_custkey % 25 AS nkey
               FROM orders WHERE o_orderkey < 4000)
    SELECT 1 AS default_plan_shuffles, 1 AS advised_broadcast,
           1 AS plan_flipped_to_broadcast, 1 AS bigbig_advised_shuffle,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(f.o_orderkey * (n.n_nationkey + 1)) AS BIGINT)
             AS checksum
    FROM f JOIN nation n ON f.nkey = n.n_nationkey
    """,
)
def stats_join_advisor(spark, sf_dir):
    """Size-statistics join advisor (C2): a DataFrame read through a
    Python DataSource reports NO sizeInBytes to Catalyst, so the
    auto-broadcast decision can never fire — the 25-row dimension below
    SORT-MERGE-joins the fact by default (``default_plan_shuffles``
    pins the gap at runtime). ``advise_join`` reinstates the decision
    from the snapshot log (visible-file byte sizes, an O(files)
    metadata stat walk, mirroring the session's own
    autoBroadcastJoinThreshold), and ``smart_join`` applies it: the
    executed plan flips to BroadcastHashJoin with identical results.
    Oversized and unknown-size (vanished-file) tables advise shuffle —
    an undercount would green-light broadcasting a huge side, the one
    direction the advisor must never err."""
    import tempfile as _tf

    from ..operators.advisor import advise_join, smart_join
    from ..sources.pyds import register_snapshot_source
    from ..sources.snapshots import SnapshotTable

    register_snapshot_source(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_custkey") % 25).alias("nkey")
    ).filter(F.col("o_orderkey") < 4000)
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    fact_t = SnapshotTable(spark, _tf.mkdtemp(prefix="advq_fact_"))
    fact_t.commit_append(o.coalesce(2))
    dim_t = SnapshotTable(spark, _tf.mkdtemp(prefix="advq_dim_"))
    dim_t.commit_append(n.coalesce(1))
    fact = (
        spark.read.format("pysnapshot")
        .option("root", fact_t.root)
        .load()
    )
    dim = (
        spark.read.format("pysnapshot")
        .option("root", dim_t.root)
        .load()
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    cond = fact["nkey"] == dim["n_nationkey"]
    default_shuffles = int(
        "BroadcastHashJoin" not in plan(fact.join(dim, cond))
    )
    adv = advise_join(spark, fact_t.root, dim_t.root)
    advised = int(adv["strategy"] == "broadcast_right")
    j = smart_join(fact, dim, cond, adv)
    flipped = int("BroadcastHashJoin" in plan(j))
    bigbig = int(
        advise_join(spark, fact_t.root, fact_t.root, threshold=100)[
            "strategy"
        ]
        == "shuffle"
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.col("o_orderkey") * (F.col("n_nationkey") + 1)
        ).cast("long").alias("s"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                default_shuffles,
                advised,
                flipped,
                bigbig,
                agg["n"],
                agg["s"],
            )
        ],
        "default_plan_shuffles int, advised_broadcast int, "
        "plan_flipped_to_broadcast int, bigbig_advised_shuffle int, "
        "n_rows bigint, checksum bigint",
    )


@query(
    "stats_histogram_estimate",
    oracle="""
    WITH src AS (SELECT o_totalprice FROM orders)
    SELECT 32 AS n_bins, 1 AS bounds_monotone, 1 AS metadata_commit,
           1 AS mid_estimate_close, 1 AS full_range_exact,
           1 AS survives_optimize,
           CAST((SELECT count(*) FROM src) AS BIGINT) AS rows_banked
    """,
)
def stats_histogram_estimate(spark, sf_dir):
    """Equi-height column HISTOGRAMS (round 8 — Redshift ANALYZE /
    Spark CBO histogram parity): ``ANALYZE ... WITH HISTOGRAM`` banks
    exact percentile bin boundaries in ONE scan; range selectivity
    then answers from METADATA (``estimate_rows`` — the number a
    join-order/broadcast decision needs at planning time, no data
    touched). Facts: the banked 32-bin boundaries are monotone, the
    ANALYZE commit adds zero files (pure metadata), a mid-range
    estimate lands within 10% of the exact count (equi-height bins
    bound the interpolation error by one bin ≈ 3%), the full-range
    estimate recovers the exact row count, and the histogram CARRIES
    through an OPTIMIZE rewrite (rewrites don't change the
    distribution)."""
    import tempfile as _tf

    from ..sql_dml import snapshot_sql
    from ..sources.snapshots import SnapshotTable, load_manifest

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = _tf.mkdtemp(prefix="spark_hist_")
    t = SnapshotTable(spark, root)
    t.commit_append(o.repartition(3))
    v = snapshot_sql(
        spark,
        f"ANALYZE TABLE pysnapshot.`{root}` COMPUTE STATISTICS "
        "FOR COLUMNS o_totalprice WITH HISTOGRAM",
    )
    m = load_manifest(root, v)
    h = m["histograms"]["o_totalprice"]
    bounds = h["bounds"]
    n_bins = len(bounds) - 1
    monotone = int(
        all(bounds[i] <= bounds[i + 1] for i in range(n_bins))
    )
    metadata_commit = int(
        v == 2 and m["files"] == load_manifest(root, 1)["files"]
    )
    lo, hi = bounds[8], bounds[24]  # a genuine mid slice
    est = t.estimate_rows("o_totalprice", lo, hi)
    exact = o.filter(
        F.col("o_totalprice").between(lo, hi)
    ).count()
    mid_close = int(abs(est - exact) <= 0.10 * max(exact, 1))
    full = t.estimate_rows("o_totalprice")
    full_exact = int(abs(full - h["rows"]) < 1e-6)
    t.optimize_small_files(1 << 30, 1 << 30)
    survives = int(
        "o_totalprice"
        in (
            load_manifest(root, t.current_version()).get("histograms")
            or {}
        )
    )
    return spark.createDataFrame(
        [
            (
                n_bins,
                monotone,
                metadata_commit,
                mid_close,
                full_exact,
                survives,
                h["rows"],
            )
        ],
        "n_bins int, bounds_monotone int, metadata_commit int, "
        "mid_estimate_close int, full_range_exact int, "
        "survives_optimize int, rows_banked bigint",
    )
