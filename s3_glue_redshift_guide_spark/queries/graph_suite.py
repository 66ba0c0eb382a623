"""Graph queries over relationship structures implied by the warehouse
tables: PageRank on the customer-supplier interaction graph and triangle
counting on the part co-purchase graph.

Both oracles are EXACT: PageRank runs in fixed-point BIGINT arithmetic
(bit-identical across engines; the floating form is order-dependent in the
contribution sums), and the triangle count is a pure integer. The DuckDB
PageRank unrolls the five iterations as chained CTEs — same arithmetic,
same floor divisions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import (
    PAGERANK_SCALE,
    pagerank_fixed_point,
    triangle_count,
)
from .registry import query

_PR_ITER = (
    "SELECT e.dst AS node, "
    f"(({PAGERANK_SCALE} * 15 // 100) // any_value(n.cnt)"
    " + (85 * sum(p.r // d.d)) // 100)::BIGINT AS r "
    "FROM edges e JOIN pr{prev} p ON e.src = p.node "
    "JOIN deg d ON e.src = d.node, n GROUP BY e.dst"
)

_PR_SQL = f"""
WITH e0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
n AS (SELECT count(*) AS cnt FROM deg),
pr0 AS (SELECT node, ({PAGERANK_SCALE} // cnt)::BIGINT AS r FROM deg, n),
pr1 AS ({_PR_ITER.format(prev=0)}),
pr2 AS ({_PR_ITER.format(prev=1)}),
pr3 AS ({_PR_ITER.format(prev=2)}),
pr4 AS ({_PR_ITER.format(prev=3)}),
pr5 AS ({_PR_ITER.format(prev=4)})
SELECT node, r AS rank_fp FROM pr5
"""


@query("graph_pagerank", oracle=_PR_SQL)
def graph_pagerank(spark, sf_dir):
    """Five PageRank iterations on the (symmetric) customer-supplier
    graph. Iterative join+agg rounds with per-round lineage truncation —
    the driver never holds the graph; ranks are exact fixed-point BIGINT
    so the oracle comparison is bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_fixed_point(edges, iterations=5, damping_pct=85)


@query(
    "graph_triangles",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.a < p.b)
                  THEN p.a ELSE p.b END AS src,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND p.a < p.b)
                  THEN p.b ELSE p.a END AS dst
      FROM pairs p
      JOIN deg da ON p.a = da.node
      JOIN deg db ON p.b = db.node
    ),
    w AS (SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
          FROM o o1 JOIN o o2 ON o1.dst = o2.src)
    SELECT count(*)::BIGINT AS n_triangles
    FROM w JOIN o ON w.x = o.src AND w.z = o.dst
    """,
)
def graph_triangles(spark, sf_dir):
    """Exact triangle count of the part co-purchase graph (parts sharing an
    order). Degree orientation bounds the wedge join's fan-out on skewed
    degree distributions — the standard trick that keeps the self-join
    feasible on power-law graphs. Co-occurrence fan-out is quadratic per
    order but order sizes are bounded (<=13 items here; cap upstream for
    unbounded baskets)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return triangle_count(pairs)
