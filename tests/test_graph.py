"""Operator-level checks for the graph family on tiny known graphs (the
registry queries cover the full-table paths bit-exact vs DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank_fixed_point,
    triangle_count,
)


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; an appended pendant edge adds none.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], ["a", "b"])
    assert triangle_count(edges).collect()[0].n_triangles == 4


def test_triangle_count_triangle_free(spark):
    # C4 (square) is triangle-free.
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], ["a", "b"])
    assert triangle_count(edges).collect()[0].n_triangles == 0


def test_pagerank_symmetric_star(spark):
    # Undirected star: hub 0 with 3 leaves; hub must outrank every leaf,
    # leaves are symmetric so their fixed-point ranks are identical, and
    # total mass stays ~SCALE (floor-division loss < n_nodes per round).
    pairs = [(0, i) for i in (1, 2, 3)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, ["src", "dst"])
    ranks = {r.node: r.rank_fp for r in pagerank_fixed_point(edges, 5).collect()}
    assert ranks[0] > ranks[1]
    assert ranks[1] == ranks[2] == ranks[3]
    total = sum(ranks.values())
    assert abs(total - PAGERANK_SCALE) < PAGERANK_SCALE * 0.01


def test_pagerank_regular_graph_uniform(spark):
    # On a d-regular symmetric graph (here C4) the uniform vector is the
    # exact fixed point, so every node keeps rank SCALE/n.
    cycle = [(0, 1), (1, 2), (2, 3), (3, 0)]
    sym = cycle + [(b, a) for a, b in cycle]
    edges = spark.createDataFrame(sym, ["src", "dst"])
    ranks = [r.rank_fp for r in pagerank_fixed_point(edges, 4).collect()]
    assert len(set(ranks)) == 1
