"""Property-style parity (SURVEY.md §5 plan d): randomized filter/aggregate
queries built from a small grammar, executed by both engines on the same
parquet — any divergence in predicate, null, or aggregation semantics
surfaces here rather than in a hand-picked case.

Determinism: hypothesis drives the query shapes; every generated query is
itself deterministic, and numeric outputs follow the engine-wide decimal
policy so comparisons are bit-exact.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table

from .conftest import SF_SMOKE
from .parity import compare_frames

COMPARABLE = {
    "o_totalprice": st.floats(min_value=1000, max_value=500000).map(lambda x: round(x, 2)),
    "o_custkey": st.integers(min_value=0, max_value=160),
    "o_orderkey": st.integers(min_value=0, max_value=1600),
}
OPS = ["<", "<=", ">", ">=", "=", "!="]
STATUSES = ["O", "F", "P"]


@st.composite
def predicates(draw):
    clauses = []
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["num", "status", "in"]))
        if kind == "num":
            col = draw(st.sampled_from(sorted(COMPARABLE)))
            op = draw(st.sampled_from(OPS))
            val = draw(COMPARABLE[col])
            clauses.append(f"{col} {op} {val}")
        elif kind == "status":
            s = draw(st.sampled_from(STATUSES))
            neg = draw(st.booleans())
            clauses.append(f"o_orderstatus {'!=' if neg else '='} '{s}'")
        else:
            vals = draw(st.lists(st.sampled_from(STATUSES), min_size=1, max_size=3,
                                 unique=True))
            quoted = ", ".join(f"'{v}'" for v in vals)
            clauses.append(f"o_orderpriority IS NOT NULL AND o_orderstatus IN ({quoted})")
    conj = draw(st.sampled_from([" AND ", " OR "]))
    return conj.join(f"({c})" for c in clauses)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicates(), group=st.booleans())
def test_random_filters_match_duckdb(spark, duck, pred, group):
    orders = load_table(spark, SF_SMOKE, "orders")
    con = duck(SF_SMOKE)
    if group:
        sdf = (
            orders.filter(F.expr(pred))
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .cast("double")
                .alias("total"),
            )
        )
        sql = f"""
            SELECT o_orderstatus,
                   count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
            FROM orders WHERE {pred} GROUP BY o_orderstatus
        """
    else:
        sdf = orders.filter(F.expr(pred)).select("o_orderkey", "o_orderstatus")
        sql = f"SELECT o_orderkey, o_orderstatus FROM orders WHERE {pred}"
    problems = compare_frames(sdf.toPandas(), con.sql(sql).df(), pred)
    assert not problems, problems
