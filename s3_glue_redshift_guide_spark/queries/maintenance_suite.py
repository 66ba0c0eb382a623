"""Driver-checkable evidence for the maintenance meta-operators:
incremental rollup (X10) and the mechanized plan audit (X11).

Both are stateful/meta operations the plain "one query, one SQL oracle"
shape doesn't fit directly, so each is wrapped as a facts query: the
operator runs for real inside the callable, and the returned rows are
facts an independent oracle CAN state — the rollup's incremental result
must equal a direct aggregation of the same data (the defining property of
mergeable partial states), and the audit must classify four canonical plan
shapes exactly as documented.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.rollup import HLL_RSE, IncrementalRollup
from ..plans.audit import audit_plan
from .registry import query


@query(
    "rollup_incremental_facts",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM orders GROUP BY o_orderstatus
    """,
)
def rollup_incremental_facts(spark, sf_dir):
    """Incremental rollup maintenance (X10): orders arrives as THREE
    deltas (disjoint key ranges), each folded into the stored partial
    states with one O(delta) update; the final read must equal a direct
    one-shot aggregation of the whole table — the defining property of
    mergeable monoid states. Money sums run in DECIMAL inside the rollup
    (partials merge exactly, so three-delta fold == one-shot == the
    oracle's decimal sum, bit-for-bit after the cast to DOUBLE)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_d"),
        "o_totalprice",
    )
    roll = IncrementalRollup(
        spark,
        os.path.join(tempfile.mkdtemp(prefix="spark_rollup_"), "state"),
        group_cols=["o_orderstatus"],
        measures={"price_d": ("sum", "count"), "o_totalprice": ("min", "max")},
    )
    hi = o.agg(F.max("o_orderkey")).collect()[0][0]  # one scalar
    cuts = (hi // 3, 2 * hi // 3)
    roll.update(o.filter(F.col("o_orderkey") <= cuts[0]))
    roll.update(
        o.filter(
            (F.col("o_orderkey") > cuts[0]) & (F.col("o_orderkey") <= cuts[1])
        )
    )
    roll.update(o.filter(F.col("o_orderkey") > cuts[1]))
    return roll.read().select(
        "o_orderstatus",
        F.col("count__price_d").alias("n_orders"),
        F.col("sum__price_d").cast("double").alias("total"),
        F.col("min__o_totalprice").alias("lo"),
        F.col("max__o_totalprice").alias("hi"),
    )


@query(
    "plan_audit_facts",
    oracle="""
    SELECT * FROM (VALUES
      ('cartesian_theta', 'cartesian'),
      ('clean_aggregate', 'none'),
      ('row_python_udf', 'python-row-udf'),
      ('scalar_attach', 'scalar-broadcast')
    ) t(case_name, top_code)
    """,
)
def plan_audit_facts(spark, sf_dir):
    """Mechanized plan scale audit (X11) as a classification oracle: four
    canonical plan shapes — a genuine theta-join cartesian (high), a
    row-Python UDF (medium), a 1-row scalar-attach nested loop (downgraded
    to info by the logical maxRows proof), and a clean partial-aggregated
    group-by (no warnings) — must each report exactly the documented
    top-severity code. This is the audit auditing itself."""
    from pyspark.sql.types import StringType

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")

    shout = F.udf(lambda s: (s or "").upper(), StringType())
    cases = {
        "cartesian_theta": nation.join(
            region, nation["n_nationkey"] > region["r_regionkey"]
        ),
        "row_python_udf": nation.select(shout("n_name").alias("up")),
        "scalar_attach": orders.crossJoin(
            orders.agg(F.count(F.lit(1)).alias("n"))
        ),
        "clean_aggregate": orders.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        ),
    }
    rank = {"high": 0, "medium": 1, "info": 2}
    rows = []
    for name, df in cases.items():
        ws = sorted(audit_plan(df), key=lambda w: rank[w.severity])
        rows.append((name, ws[0].code if ws else "none"))
    return spark.createDataFrame(rows, "case_name string, top_code string")


@query(
    "rollup_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           1 AS estimate_ok
    FROM events GROUP BY event_type
    """,
)
def rollup_distinct_users(spark, sf_dir):
    """Incrementally-maintained approximate distinct (X10 + sketch family):
    distinct users per event type kept as a mergeable HLL state, folded
    over three event deltas — the nightly "unique users" rollup at O(delta)
    per run. Facts: the exact distinct count (oracle-reproducible) and an
    in-tolerance boolean on the sketch's estimate. The tolerance is derived
    from the PINNED sketch precision (4x the lgK=12 relative standard
    error, ~6.5%) rather than hardcoded, so it holds at any scale factor
    and cannot silently diverge from the sketch config (exact at gate
    cardinalities — HLL is sparse-mode there)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    roll = IncrementalRollup(
        spark,
        os.path.join(tempfile.mkdtemp(prefix="spark_rollup_hll_"), "state"),
        group_cols=["event_type"],
        measures={"user_id": ("hll",)},
    )
    for third in range(3):
        roll.update(e.filter(F.col("event_id") % 3 == third))
    est = roll.read().select(
        "event_type", F.col("approx_distinct__user_id").alias("__est")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("__est") - F.col("n_exact"))
            <= (4 * HLL_RSE) * F.col("n_exact")
        )
        .cast("int")
        .alias("estimate_ok"),
    )


@query(
    "rollup_quantile_state",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             least(31, greatest(0, CAST(floor(
               ((l_extendedprice - 900.0) * 32) / 104100.0) AS INT))) AS bin
      FROM lineitem),
    h AS (SELECT l_returnflag, bin, count(*) AS c FROM b GROUP BY 1, 2),
    t AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS total
          FROM h GROUP BY 1),
    cum AS (
      SELECT h.l_returnflag, bin, c,
             sum(c) OVER (PARTITION BY h.l_returnflag ORDER BY bin) AS cum,
             t.total
      FROM h JOIN t USING (l_returnflag)),
    p50 AS (SELECT l_returnflag, min(bin) AS bin FROM cum
            WHERE cum >= greatest(1, ceil(0.5 * total)) GROUP BY 1),
    p95 AS (SELECT l_returnflag, min(bin) AS bin FROM cum
            WHERE cum >= greatest(1, ceil(0.95 * total)) GROUP BY 1)
    SELECT t.l_returnflag, t.total AS n_rows,
           round(900.0 + (p50.bin + 0.5) * (104100.0 / 32), 6) AS p50_est,
           round(900.0 + (p95.bin + 0.5) * (104100.0 / 32), 6) AS p95_est
    FROM t JOIN p50 USING (l_returnflag) JOIN p95 USING (l_returnflag)
    """,
)
def rollup_quantile_state(spark, sf_dir):
    """Incrementally-maintained quantiles (X10 + sketch family): per-flag
    price distribution kept as a MERGEABLE equi-width histogram state
    (bin-count vectors add element-wise — the fixed-bin stand-in for a
    KLL/t-digest state), folded over three lineitem deltas at O(delta)
    each; p50/p95 derive at read time from the merged state by a pure
    expression fold. The oracle recomputes the same bins, cumulative
    crossing, and midpoint arithmetic from the raw table in SQL — so
    three-delta fold == one-shot, value-exact, including the quantile
    estimates."""
    from ..operators.rollup import hist_quantile_expr

    LO, HI, NB = 900.0, 105000.0, 32
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    roll = IncrementalRollup(
        spark,
        os.path.join(tempfile.mkdtemp(prefix="spark_rollq_"), "state"),
        group_cols=["l_returnflag"],
        measures={"l_extendedprice": ("hist",)},
        hist_config={"l_extendedprice": (LO, HI, NB)},
    )
    hi = l.agg(F.max("l_orderkey")).collect()[0][0]  # one scalar
    cuts = (hi // 3, 2 * hi // 3)
    roll.update(l.filter(F.col("l_orderkey") <= cuts[0]))
    roll.update(
        l.filter(
            (F.col("l_orderkey") > cuts[0]) & (F.col("l_orderkey") <= cuts[1])
        )
    )
    roll.update(l.filter(F.col("l_orderkey") > cuts[1]))
    h = F.col("hist__l_extendedprice")
    return roll.read().select(
        "l_returnflag",
        F.aggregate(h, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "n_rows"
        ),
        hist_quantile_expr(h, LO, HI, NB, 0.5).alias("p50_est"),
        hist_quantile_expr(h, LO, HI, NB, 0.95).alias("p95_est"),
    )


@query(
    "rollup_mv_change_feed",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag, l_orderkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_orderkey < 6000
    ), world AS (
      SELECT flag,
             CASE WHEN l_orderkey % 17 = 0 THEN cents + 100
                  ELSE cents END AS cents
      FROM base WHERE l_orderkey % 13 <> 0
    )
    SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           1 AS matches_recompute
    FROM world GROUP BY flag
    """,
)
def rollup_mv_change_feed(spark, sf_dir):
    """Change-feed materialized view (X16): a GROUP BY aggregate over a
    snapshot table maintained INCREMENTALLY with RETRACTION semantics —
    the source's change feed reports every mutation as an insert/delete
    multiset, so a refresh folds +row / -row partials per group, which
    handles what insert-only rollup (X10) cannot: a deletion-vector
    DELETE retracts its rows, a merge-on-read UPDATE arrives as its
    delete/insert pair, and a fully-retracted group VANISHES (hidden
    row-count measure). Refresh cost is O(churned files since the
    cursor), never O(table) — the cursor publishes atomically with the
    refreshed state via the state table's txn action, so crash-replay
    can neither double-apply nor skip. Sums run in integer cents
    (exact-additive; float sums are rejected — a + x - x drifts).
    The final MV must equal a from-scratch recompute (the defining
    correctness property; also asserted in-query as a fact)."""
    from ..operators.mv import ChangeFeedMaterializedView
    from ..sources.snapshots import SnapshotTable

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    src = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="mvq_src_")
    )
    mv = ChangeFeedMaterializedView(
        spark,
        src,
        tempfile.mkdtemp(prefix="mvq_state_"),
        keys=["flag"],
        measures={"n_rows": ("count",), "sum_cents": ("sum", "cents")},
    )
    src.commit_append(
        li.filter(F.col("l_orderkey") < 3000).coalesce(1)
    )
    mv.refresh()  # cursor -> v1 (insert-only fold)
    src.commit_append(
        li.filter(F.col("l_orderkey").between(3000, 5999)).coalesce(1)
    )
    src.delete_where(F.col("l_orderkey") % 13 == 0)
    mv.refresh()  # folds append + DV delete in one O(churn) pass
    src.update_where(
        F.col("l_orderkey") % 17 == 0,
        {"cents": (F.col("cents") + 100).cast("bigint")},
    )
    mv.refresh()  # MOR update = delete/insert pair
    out = mv.read().drop("l_orderkey", "k")
    recompute = (
        src.read()
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    matches = int(
        out.select("flag", "n_rows", "sum_cents")
        .exceptAll(recompute)
        .union(
            recompute.exceptAll(
                out.select("flag", "n_rows", "sum_cents")
            )
        )
        .count()
        == 0
    )
    return out.select(
        "flag",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.lit(matches).alias("matches_recompute"),
    )


@query(
    "rollup_mv_join_feed",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 11 = 0 THEN 50 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey < 6000
    ), c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 19 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 7 <> 0
    )
    SELECT seg,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           1 AS matches_recompute
    FROM o JOIN c ON o.o_custkey = c.c_custkey
    GROUP BY seg
    """,
)
def rollup_mv_join_feed(spark, sf_dir):
    """Incrementally-maintained JOIN-aggregate view (X17): a GROUP BY
    aggregate over fact ⋈ dimension where BOTH sides are snapshot
    tables that churn independently, maintained from both change feeds
    via the multiset telescoping identity
    ``Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR`` — no ΔL⋈ΔR correction term, no
    joined-row state. The four refreshes cover: insert-only bootstrap,
    a left-only append delta, a right-side DV DELETE retracting every
    joined row of the deleted dimension keys, and a BOTH-SIDES refresh
    (left MOR update + right MOR segment move in one pass, the case the
    telescoping exists for). Each delta side is O(churn) and broadcasts
    into the big side's snapshot (no big-side shuffle); cursors for
    both feeds publish atomically with the state. The final MV must
    equal a from-scratch head ⋈ head recompute (asserted in-query)."""
    import os
    import tempfile

    from ..operators.mv import ChangeFeedJoinAggView
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).filter(F.col("o_orderkey") < 6000)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    left = SnapshotTable(spark, tempfile.mkdtemp(prefix="mvj_l_"))
    right = SnapshotTable(spark, tempfile.mkdtemp(prefix="mvj_r_"))
    mv = ChangeFeedJoinAggView(
        spark,
        left,
        right,
        tempfile.mkdtemp(prefix="mvj_state_"),
        left_on=["o_custkey"],
        right_on=["c_custkey"],
        keys=["seg"],
        measures={"n_rows": ("count",), "sum_cents": ("sum", "cents")},
    )
    right.commit_append(c.coalesce(1))
    left.commit_append(
        o.filter(F.col("o_orderkey") < 3000).coalesce(1)
    )
    mv.refresh()  # bootstrap: full L ⋈ R insert fold
    left.commit_append(
        o.filter(F.col("o_orderkey").between(3000, 5999)).coalesce(1)
    )
    mv.refresh()  # left-only delta ⋈ R_head
    right.delete_where(F.col("c_custkey") % 7 == 0)
    mv.refresh()  # right DV delete retracts joined facts via L_old ⋈ ΔR
    left.update_where(
        F.col("o_orderkey") % 11 == 0,
        {"cents": (F.col("cents") + 50).cast("long")},
    )
    right.update_where(
        F.col("c_custkey") % 19 == 0, {"seg": F.lit("MOVED")}
    )
    mv.refresh()  # BOTH sides moved: ΔL ⋈ R_new ∪ L_old ⋈ ΔR, one pass
    out = mv.read()
    recompute = (
        left.read()
        .join(right.read(), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    got = out.select("seg", "n_rows", "sum_cents")
    matches = int(
        got.exceptAll(recompute).union(recompute.exceptAll(got)).count() == 0
    )
    return out.select(
        "seg",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.lit(matches).alias("matches_recompute"),
    )


@query(
    "rollup_mv_join_stream",
    oracle="""
    WITH l AS (SELECT l_orderkey AS k,
                      CAST(l_quantity AS BIGINT) AS x
               FROM lineitem WHERE l_orderkey < 4000),
    l2 AS (SELECT * FROM l WHERE k % 10 <> 3),
    r AS (SELECT o_orderkey AS rk, o_orderpriority AS grp
          FROM orders WHERE o_orderkey < 5000)
    SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS s, 1 AS cursors_at_head
    FROM l2 JOIN r ON k = rk GROUP BY grp
    """,
)
def rollup_mv_join_stream(spark, sf_dir):
    """ALWAYS-ON maintenance of the JOIN materialized view from BOTH
    change-data-feed STREAMS (round 8; the streaming half of X17):
    each side's ``readChangeFeed`` stream folds its micro-batches
    through the single-side telescoping identities — ΔL ⋈ R@rc with
    the right frozen at ITS cursor, L@lc ⋈ ΔR symmetrically — so any
    serialized interleaving of left/right folds telescopes to
    head ⋈ head exactly. Two REAL drain rounds run here against the
    same checkpoints: the first exercises the left-before-right
    bootstrap (left folds against an EMPTY right multiset — a
    cursor-only state commit), the second folds appends, a DELETE
    (retraction), and new right rows. Value-exact vs the head ⋈ head
    recompute; both cursors must land at their tables' heads."""
    from ..operators.mv import ChangeFeedJoinAggView
    from ..sources.snapshots import SnapshotTable

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").cast("long").alias("x"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("rk"),
        F.col("o_orderpriority").alias("grp"),
    )
    base = tempfile.mkdtemp(prefix="spark_jmvstream_")
    left = SnapshotTable(spark, os.path.join(base, "left"))
    right = SnapshotTable(spark, os.path.join(base, "right"))
    mv = ChangeFeedJoinAggView(
        spark, left, right, os.path.join(base, "state"),
        left_on=["k"], right_on=["rk"], keys=["grp"],
        measures={"n": ("count",), "s": ("sum", "x")},
    )
    ck_l = os.path.join(base, "ck_l")
    ck_r = os.path.join(base, "ck_r")
    # round 1: LEFT commits exist before the right table does — the
    # left drain is a cursor-only bootstrap
    left.commit_append(li.filter(F.col("k") < 2000))
    mv.refresh_streams(ck_l, ck_r, available_now=True)
    right.commit_append(o.filter(F.col("rk") < 3000))
    mv.refresh_streams(ck_l, ck_r, available_now=True)
    # round 2: churn on both sides, resume the SAME checkpoints
    left.commit_append(
        li.filter((F.col("k") >= 2000) & (F.col("k") < 4000))
    )
    left.delete_where(F.col("k") % 10 == 3)
    right.commit_append(
        o.filter((F.col("rk") >= 3000) & (F.col("rk") < 5000))
    )
    mv.refresh_streams(ck_l, ck_r, available_now=True)
    lc, rc = mv._cursors()
    at_head = int(
        lc == left.current_version()
        and rc == right.current_version()
    )
    return mv.read().select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("s").cast("long").alias("s"),
        F.lit(at_head).alias("cursors_at_head"),
    )
