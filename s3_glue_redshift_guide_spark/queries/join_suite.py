"""J1-J8 — join operator coverage (SURVEY.md §2.3), each with an oracle.

Broadcast hints go on the constant-size dimensions; everything else is left
to Catalyst/AQE. The range and as-of joins use the engine's composite
implementations (operators/joins.py) — their oracles use plain SQL
inequality joins / DuckDB's native ASOF, which is the point: same
semantics, scale-safe plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..operators.joins import as_of_join, range_join
from .registry import query
from .util import dsum, money


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """Customers with their order counts, keeping zero-order customers (J3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            F.coalesce(F.sum(money(o.o_totalprice)), F.lit(0)).cast("double").alias("total_spent"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM orders o
    RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_right_outer(spark, sf_dir):
    """Right outer: same result as the left variant with sides swapped (J3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark, sf_dir):
    """Customer vs supplier presence per nation; unmatched on both sides (J3).

    Pre-aggregating each side BEFORE the outer join shrinks the shuffle to
    one row per nation — the scale-correct shape for outer joins on skewed
    foreign keys.
    """
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cn.join(sn, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi_exists(spark, sf_dir):
    """EXISTS as left-semi join (J4): no duplication, probe side only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_not_exists(spark, sf_dir):
    """NOT EXISTS as left-anti join (J4)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, r.r_regionkey
    FROM supplier s JOIN region r ON s.s_acctbal > r.r_regionkey * 1000
    """,
)
def join_theta(spark, sf_dir):
    """Pure non-equi (theta) join (J5): broadcast-nested-loop on a
    constant-size side — the only plan shape where BNL is acceptable."""
    s = _t(spark, sf_dir, "supplier")
    r = _t(spark, sf_dir, "region")
    return s.join(
        F.broadcast(r), s.s_acctbal > r.r_regionkey * 1000
    ).select("s_suppkey", "r_regionkey")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark, sf_dir):
    """Cross join (J8) of two constant-size dimensions (5 x 25)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@query(
    "join_range_events",
    oracle="""
    SELECT a.event_id AS purchase_id,
           count(b.event_id) AS n_clicks_before
    FROM events a
    LEFT JOIN events b
      ON b.user_id = a.user_id
     AND b.event_type = 'click'
     AND b.ts >= a.ts - INTERVAL 30 MINUTE
     AND b.ts <  a.ts
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
)
def join_range_events(spark, sf_dir):
    """Range join (J6): clicks in the 30 minutes before each purchase,
    via the bucketed-range-join decomposition (no nested-loop at scale)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = range_join(
        purchases,
        clicks,
        left_ts="ts",
        right_ts="click_ts",
        lower=-30 * 60,
        upper=0,
        bucket_seconds=30 * 60,
        extra_on=[("p_user", "c_user")],
        how="left",
        # count(click_id) ignores nulls, so duplicate unmatched rows are
        # invisible here — skip the dedup shuffle
        dedup_unmatched=False,
    )
    return joined.groupBy("purchase_id").agg(
        F.count("click_id").alias("n_clicks_before")
    )


@query(
    "join_range_left_rowlevel",
    oracle="""
    SELECT a.event_id AS purchase_id, b.event_id AS error_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON b.user_id = a.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 10 MINUTE
    """,
)
def join_range_left_rowlevel(spark, sf_dir):
    """Left range join at ROW level (J6): never-matched left rows surface
    exactly once (the operator dedups the bucket-explode copies
    internally), so row-level output matches a plain SQL LEFT JOIN ...
    BETWEEN bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"), "ts",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"),
    )
    joined = range_join(
        purchases, errors, left_ts="ts", right_ts="e_ts",
        lower=0, upper=600, bucket_seconds=600,
        extra_on=[("p_user", "e_user")], how="left",
    )
    return joined.select("purchase_id", "error_id")


@query(
    "join_asof_events",
    oracle="""
    SELECT p.event_id AS purchase_id,
           round(c.value, 2) AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_events(spark, sf_dir):
    """As-of join (J7): latest click value at or before each purchase,
    one window pass per user instead of a per-row subquery."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = as_of_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.round(F.col("asof_value"), 2).alias("last_click_value"),
    )


# ------------------------- Bloom-filter join prefilter (J9) ------------
@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Runtime row-level filtering, the explicit form (J9): a Bloom filter
    is built DISTRIBUTED over the selective build side's join keys
    (urgent 1998+ orders), shipped as a broadcast bitset (16 KiB for
    m=2^17), and the fact table is pruned BEFORE its shuffle — the
    mechanism of Spark's AQE runtime bloom join, composable here in front
    of any operator. False positives are harmless (the exact join below
    still runs), false negatives impossible, so the oracle is the plain
    join — the filter must be semantically invisible while cutting the
    shuffled fact volume (reduction asserted in tests/test_bloom.py)."""
    from ..operators.bloom import bloom_build, bloom_prefilter

    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    bitset = bloom_build(o, "o_orderkey")
    l_pruned = bloom_prefilter(l, "l_orderkey", bitset)
    return (
        l_pruned.join(o, l_pruned.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# -------------------- AQE skew-join runtime split (V1 built-in) --------
@query(
    "join_aqe_skew",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
                  ELSE l_orderkey % 97 END AS k,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    dim AS (SELECT range AS k, range * 2 + 1 AS w FROM range(0, 97))
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(f.cents * d.w) AS BIGINT) AS weighted_cents,
           1 AS skew_split
    FROM fact f JOIN dim d USING (k)
    """,
)
def join_aqe_skew(spark, sf_dir):
    """AQE skew-join, the BUILT-IN skew remedy users flip on first
    (contrast: ``operators/skew.py`` is the manual salting form). The
    fact side funnels ~90% of lineitem onto one join key, the join is
    forced to sort-merge (broadcast thresholds off), and ADAPTIVE
    EXECUTION detects the hot post-shuffle partition at RUNTIME and
    splits it across mapper ranges — the final plan must carry
    ``SortMergeJoin(skew=true)``, returned as the ``skew_split`` fact.
    Values are checksummed in integer cents so the split (which reorders
    the sum) stays bit-exact against the oracle.

    The ``repartition(16)`` is demo scaffolding for gate-SF data that
    arrives as ONE input split: AQE splits a skewed partition at mapper
    granularity, and a single mapper leaves it nothing to split. On a
    real cluster the thousands of scan tasks provide the mappers and the
    repartition would be dropped. Thresholds are shrunk the same way —
    production defaults (256 MB) with the same topology. Confs are
    save/restored around an EAGER execution, so the session leaves this
    query exactly as it entered."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        fact = (
            _t(spark, sf_dir, "lineitem")
            .repartition(16)
            .select(
                F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
                .otherwise(F.col("l_orderkey") % 97)
                .alias("k"),
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .alias("cents"),
            )
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("w")
        )
        agg = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("cents") * F.col("w")).alias("weighted_cents"),
        )
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
        skew = 1 if "skew=true" in plan else 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [(row["n_rows"], row["weighted_cents"], skew)],
        "n_rows bigint, weighted_cents bigint, skew_split int",
    )


# ------------- J10: shuffle-free co-partitioned snapshot join ----------
@query(
    "join_copartitioned_snapshots",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)  AS n_orders,
           CAST(sum(nl) AS BIGINT)   AS n_lines,
           CAST(round(sum(rev), 2) AS DOUBLE) AS revenue,
           0 AS shuffle_exchanges
    FROM (
        SELECT l_orderkey,
               count(*) AS nl,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderkey % 4 = 1
        GROUP BY l_orderkey
    )
    """,
)
def join_copartitioned_snapshots(spark, sf_dir):
    """Shuffle-FREE fact⋈fact join over two co-bucketed snapshot tables
    (SURVEY §2 J10 / VERDICT-r8 directive #2, the storage-partitioned-
    join posture): both tables declare ``bucket.by = key:8``, every
    commit routes through Spark's native bucketed writer (murmur3
    bucket-id file names), and ``register_bucketed_view`` surfaces the
    CURRENT snapshot to the session catalog as a partitioned+bucketed
    table — one ``_cv`` partition per commit, bucket files coalesced
    across commits by bucket id. Catalyst then sees both sides hash-
    distributed on the key and elides the Exchange for BOTH the join
    and the per-key aggregate; ``shuffle_exchanges`` is counted from
    the EXECUTED plan at runtime and the oracle pins it to 0. At 100 TB
    this is the difference between re-shuffling two fact tables and
    streaming co-located bucket pairs: zero network for the join, and
    the layout is maintained incrementally — each append adds bucket
    files, no global rewrite (``sources/snapshots.py::_bucket_spec``,
    ``register_bucketed_view``). Both tables take TWO commits so the
    multi-commit bucket-union path is what's measured."""
    import tempfile as _tf
    import uuid as _uuid

    from ..sources.snapshots import SnapshotTable

    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 4 == 1
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    to = SnapshotTable(spark, _tf.mkdtemp(prefix="copart_o_"))
    to.set_tblproperties({"bucket.by": "o_orderkey:8"})
    to.commit_append(o.filter(F.col("o_orderkey") % 8 < 4))
    to.commit_append(o.filter(F.col("o_orderkey") % 8 >= 4))
    tl = SnapshotTable(spark, _tf.mkdtemp(prefix="copart_l_"))
    tl.set_tblproperties({"bucket.by": "l_orderkey:8"})
    tl.commit_append(li.filter(F.col("l_orderkey") % 8 < 4))
    tl.commit_append(li.filter(F.col("l_orderkey") % 8 >= 4))
    sfx = _uuid.uuid4().hex[:8]
    va = to.register_bucketed_view(f"copart_orders_{sfx}")
    vb = tl.register_bucketed_view(f"copart_lineitem_{sfx}")
    try:
        per_key = (
            spark.table(vb)
            .join(
                spark.table(va),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("nl"),
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("rev"),
            )
        )
        facts = per_key.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("nl").cast("long").alias("n_lines"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        row = facts.collect()[0]
        # the plan fact comes from the EXECUTED per-key plan: with both
        # scans reporting the bucket distribution there is no
        # hash-partitioning Exchange anywhere — join and aggregate both
        # reuse the storage layout (the global facts agg above is a
        # SinglePartition gather, not a hash shuffle)
        plan = per_key._jdf.queryExecution().executedPlan().toString()
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert "Bucketed: true" in plan, "bucketed scan did not engage"
    finally:
        # bench/driver runs repeat this query: drop the catalog tables
        # and scratch snapshot dirs so the session catalog and disk
        # don't grow per execution (DROP keeps external files; the
        # rmtree removes them, results above are already collected)
        import shutil as _sh

        for v in (va, vb):
            spark.sql(f"DROP TABLE IF EXISTS `{v}`")
        for t in (to, tl):
            _sh.rmtree(t.root, ignore_errors=True)
    return spark.createDataFrame(
        [(row["n_orders"], row["n_lines"], row["revenue"], n_shuffles)],
        "n_orders bigint, n_lines bigint, revenue double, "
        "shuffle_exchanges int",
    )


@query(
    "join_copartitioned_rename",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(cents), 2) AS BIGINT) AS sum_cents,
           0 AS shuffle_exchanges
    FROM (
        SELECT o_orderkey,
               sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                 AS cents
        FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0) o1
        JOIN (SELECT o_orderkey AS k2,
                     o_totalprice
              FROM orders) o2 ON o2.k2 = o1.o_orderkey
        GROUP BY o_orderkey
    )
    """,
)
def join_copartitioned_rename(spark, sf_dir):
    """Zero-Exchange co-partitioned join SURVIVING SCHEMA EVOLUTION
    (round 10, VERDICT-r9 directive #4): one side renames a NON-layout
    column after its first commit, so its files span two physical
    naming eras. ``register_bucketed_view`` now declares the physical
    UNION schema (both names, from the field-id map) and serves a
    coalesce-projection view; the bucket column passes through the
    projection untouched, so Catalyst still sees both scans
    hash-distributed on the key and the fact⋈fact join + per-key
    aggregate execute with ZERO hash-partitioning Exchanges — pinned
    in the oracle, with the renamed column's pre-rename values
    surfacing intact under the new name (the sum covers both eras).
    At 100 TB: a production table can rename columns for years and
    keep its shuffle-free join layout."""
    import shutil as _sh
    import tempfile as _tf
    import uuid as _uuid

    from ..sources.snapshots import SnapshotTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    ta = SnapshotTable(spark, _tf.mkdtemp(prefix="cprn_a_"))
    ta.set_tblproperties({"bucket.by": "o_orderkey:8"})
    ta.commit_append(
        o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    )
    tb = SnapshotTable(spark, _tf.mkdtemp(prefix="cprn_b_"))
    tb.set_tblproperties({"bucket.by": "o_orderkey:8"})
    tb.commit_append(o.filter(F.col("o_orderkey") % 2 == 0))
    tb.rename_column("price_cents", "cents")  # non-layout rename
    tb.commit_append(
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", F.col("price_cents").alias("cents")
        )
    )
    sfx = _uuid.uuid4().hex[:8]
    va = ta.register_bucketed_view(f"cprn_keys_{sfx}")
    vb = tb.register_bucketed_view(f"cprn_facts_{sfx}")
    try:
        per_key = (
            spark.table(vb)
            .join(spark.table(va), "o_orderkey")
            .groupBy("o_orderkey")
            .agg(F.sum("cents").alias("cents"))
        )
        facts = per_key.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("cents"), 2).cast("long").alias("sum_cents"),
        )
        row = facts.collect()[0]
        plan = per_key._jdf.queryExecution().executedPlan().toString()
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert "Bucketed: true" in plan, "bucketed scan did not engage"
    finally:
        # va is a plain table, vb a view over vb__phys — DROP VIEW on a
        # table (and vice versa) raises WRONG_COMMAND_FOR_OBJECT_TYPE,
        # so each drop is individually tolerant
        for v in (va, vb):
            for stmt in (
                f"DROP VIEW IF EXISTS `{v}`",
                f"DROP TABLE IF EXISTS `{v}`",
                f"DROP TABLE IF EXISTS `{v}__phys`",
            ):
                try:
                    spark.sql(stmt)
                except Exception:
                    pass
        for t in (ta, tb):
            _sh.rmtree(t.root, ignore_errors=True)
    return spark.createDataFrame(
        [(row["n_orders"], row["sum_cents"], n_shuffles)],
        "n_orders bigint, sum_cents bigint, shuffle_exchanges int",
    )


@query(
    "join_copartitioned_rewrite",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           0 AS shuffle_exchanges
    FROM (
        SELECT o1.o_orderkey,
               sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                 AS cents
        FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0) o1
        JOIN (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey % 30 <> 7) o2
          ON o2.o_orderkey = o1.o_orderkey
        GROUP BY o1.o_orderkey
    )
    """,
)
def join_copartitioned_rewrite(spark, sf_dir):
    """Zero-Exchange co-partitioned join RESTORED after a BUCKET-column
    rename (round 11, VERDICT-r10 directive #4). Renaming the join key
    is the one schema evolution bucketed readback must refuse — a
    coalesce across physical names can't match the storage hash
    distribution — so round 10 left such tables permanently on the
    connector path. ``OPTIMIZE ... REWRITE PHYSICAL``
    (sources/snapshots.py::rewrite_physical) is the recovery: rewrite
    the pre-rename-era files under the CURRENT physical name (folding
    deletion vectors in the same pass), publish a manifest with no
    schema map, and ``register_bucketed_view`` serves again — the
    fact⋈fact join + per-key aggregate run with ZERO hash-partitioning
    Exchanges, pinned in the oracle, value-exact across both naming
    eras with the DV'd rows absent. At 100 TB: the rewrite is a
    one-time O(old-era files) maintenance pass, after which the
    shuffle-free layout is permanent again — vs re-shuffling two fact
    tables on every query forever."""
    import shutil as _sh
    import tempfile as _tf
    import uuid as _uuid

    from ..sources.snapshots import SnapshotTable
    from ..sql_dml import snapshot_sql

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    ta = SnapshotTable(spark, _tf.mkdtemp(prefix="cprw_a_"))
    ta.set_tblproperties({"bucket.by": "o_orderkey:8"})
    ta.commit_append(
        o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    )
    tb = SnapshotTable(spark, _tf.mkdtemp(prefix="cprw_b_"))
    tb.set_tblproperties({"bucket.by": "o_orderkey:8"})
    tb.commit_append(o.filter(F.col("o_orderkey") % 2 == 0))
    tb.rename_column("o_orderkey", "ok")  # the BUCKET column itself
    tb.commit_append(
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            F.col("o_orderkey").alias("ok"), "cents"
        )
    )
    tb.delete_where(F.col("ok") % 30 == 7)  # DVs fold in the rewrite
    facts = snapshot_sql(
        spark, f"OPTIMIZE pysnapshot.`{tb.root}` REWRITE PHYSICAL"
    )
    assert facts["n_files_rewritten"] >= 1, "no old-era files found"
    sfx = _uuid.uuid4().hex[:8]
    va = ta.register_bucketed_view(f"cprw_keys_{sfx}")
    vb = tb.register_bucketed_view(f"cprw_facts_{sfx}")
    try:
        b = spark.table(vb).select("ok", "cents")
        per_key = (
            b.join(
                spark.table(va),
                F.col("ok") == F.col("o_orderkey"),
            )
            .groupBy("ok")
            .agg(F.sum("cents").alias("cents"))
        )
        agg = per_key.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        row = agg.collect()[0]
        plan = per_key._jdf.queryExecution().executedPlan().toString()
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert "Bucketed: true" in plan, "bucketed scan did not engage"
    finally:
        for v in (va, vb):
            for stmt in (
                f"DROP VIEW IF EXISTS `{v}`",
                f"DROP TABLE IF EXISTS `{v}`",
                f"DROP TABLE IF EXISTS `{v}__phys`",
            ):
                try:
                    spark.sql(stmt)
                except Exception:
                    pass
        for t in (ta, tb):
            _sh.rmtree(t.root, ignore_errors=True)
    return spark.createDataFrame(
        [(row["n_orders"], row["sum_cents"], n_shuffles)],
        "n_orders bigint, sum_cents bigint, shuffle_exchanges int",
    )


@query(
    "join_copartitioned_dv_anti",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           0 AS shuffle_exchanges
    FROM (
        SELECT l.l_orderkey,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 AS cents
        FROM (SELECT l_orderkey, l_extendedprice FROM lineitem
              WHERE l_linenumber % 2 <> 0) l
        JOIN (SELECT o_orderkey FROM orders
              WHERE o_orderkey % 3 = 0) o
          ON o.o_orderkey = l.l_orderkey
        GROUP BY l.l_orderkey
    )
    """,
)
def join_copartitioned_dv_anti(spark, sf_dir):
    """Zero-Exchange co-partitioned join UNDER A LARGE DELETION VECTOR
    (round 11). The inline view mask caps at 10k positions — here
    ~half of lineitem is MoR-deleted, far past it — so
    ``register_bucketed_view`` serves the DV through its scale tier: a
    broadcast LEFT ANTI JOIN against the sidecar parquet
    (sources/snapshots.py::register_bucketed_view, dv_serve='anti').
    BroadcastHashJoin preserves the streamed side's output
    partitioning, so the fact⋈keys join + per-key aggregate still run
    with ZERO hash-partitioning Exchanges — pinned in the oracle —
    and the result is value-exact with the deleted rows absent. At
    100 TB: heavy fact bytes never re-shuffle for the mask; the
    (file, position) set ships once per executor, bounded at
    DV_ANTI_JOIN_MAX_BYTES, past which OPTIMIZE ... REWRITE PHYSICAL
    is the named recovery."""
    import shutil as _sh
    import tempfile as _tf
    import uuid as _uuid

    from ..sources.snapshots import SnapshotTable

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    ta = SnapshotTable(spark, _tf.mkdtemp(prefix="cpdv_a_"))
    ta.set_tblproperties({"bucket.by": "l_orderkey:8"})
    ta.commit_append(li)
    ta.delete_where(F.col("l_linenumber") % 2 == 0)
    tb = SnapshotTable(spark, _tf.mkdtemp(prefix="cpdv_b_"))
    tb.set_tblproperties({"bucket.by": "o_orderkey:8"})
    tb.commit_append(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey")
    )
    sfx = _uuid.uuid4().hex[:8]
    # dv_serve pinned so the row exercises the anti tier at EVERY sf
    # (at sf0.001 the DV is point-delete sized and auto would inline)
    va = ta.register_bucketed_view(f"cpdv_facts_{sfx}", dv_serve="anti")
    vb = tb.register_bucketed_view(f"cpdv_keys_{sfx}")
    try:
        per_key = (
            spark.table(va)
            .join(
                spark.table(vb),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey")
            .agg(F.sum("cents").alias("cents"))
        )
        agg = per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        row = agg.collect()[0]
        plan = per_key._jdf.queryExecution().executedPlan().toString()
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert "Bucketed: true" in plan, "bucketed scan did not engage"
        assert "LeftAnti" in plan, "DV anti-join tier did not engage"
    finally:
        for v in (va, vb):
            for stmt in (
                f"DROP VIEW IF EXISTS `{v}`",
                f"DROP TABLE IF EXISTS `{v}`",
                f"DROP TABLE IF EXISTS `{v}__phys`",
            ):
                try:
                    spark.sql(stmt)
                except Exception:
                    pass
        for t in (ta, tb):
            _sh.rmtree(t.root, ignore_errors=True)
    return spark.createDataFrame(
        [(row["n_keys"], row["sum_cents"], n_shuffles)],
        "n_keys bigint, sum_cents bigint, shuffle_exchanges int",
    )


@query(
    "join_connector_broadcast_df",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT))
                AS BIGINT) AS acctbal_cents,
           1 AS broadcast_join
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_connector_broadcast_df(spark, sf_dir):
    """DataFrame-API connector reads with manifest-sized AUTO-BROADCAST
    (round 11, VERDICT-r10 directive #5; SURVEY §2 S77). A Python
    DataSource cannot report sizeInBytes to Catalyst, so a star join
    over connector-backed snapshot tables built with the plain
    DataFrame API used to sort-merge even when the dim is 25 rows.
    ``sources.pyds.read_snapshot`` — the documented DataFrame twin of
    the SQL surface's ref views — sizes the ref from BANKED manifest
    bytes (zero filesystem round-trips) and pins a broadcast hint when
    x4 the live bytes fit under autoBroadcastJoinThreshold. The plan
    fact ``broadcast_join`` comes from the EXECUTED plan and the
    oracle pins it to 1: the dim broadcast with NO manual hint in the
    query. Sizing is metadata-only, so the same code plans identically
    at 100x the fact data."""
    import shutil as _sh
    import tempfile as _tf

    from ..sources.pyds import read_snapshot
    from ..sources.snapshots import SnapshotTable

    tc = SnapshotTable(spark, _tf.mkdtemp(prefix="cbd_cust_"))
    tc.commit_append(
        _t(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100)
            .cast("long")
            .alias("acct_cents"),
        )
    )
    tn = SnapshotTable(spark, _tf.mkdtemp(prefix="cbd_nat_"))
    tn.commit_append(
        _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    try:
        cust = read_snapshot(spark, tc.root)
        nat = read_snapshot(spark, tn.root)
        per_nation = (
            cust.join(
                nat, cust["c_nationkey"] == nat["n_nationkey"]
            )
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_custs"),
                F.sum("acct_cents")
                .cast("long")
                .alias("acctbal_cents"),
            )
        )
        rows = per_nation.collect()
        plan = (
            per_nation._jdf.queryExecution().executedPlan().toString()
        )
        bcast = int("BroadcastHashJoin" in plan)
    finally:
        for t in (tc, tn):
            _sh.rmtree(t.root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["n_name"], r["n_custs"], r["acctbal_cents"], bcast)
            for r in rows
        ],
        "nation_name string, n_custs bigint, acctbal_cents bigint, "
        "broadcast_join int",
    )
