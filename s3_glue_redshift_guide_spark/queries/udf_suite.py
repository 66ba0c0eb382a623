"""U1-U4 — the user-defined-function surface (SURVEY.md §2.10; the
reference's "prepare your python transform script" hook, README.md:151).

Ladder of preference, demonstrated in order:
  built-ins (everything else in this package)
  > pandas_udf / applyInPandas (Arrow-batched, here)
  > row-at-a-time Python UDF (u1 — shown once, deliberately trivial).

Numeric parity notes: pandas/numpy reductions use pairwise summation while
DuckDB folds sequentially, so grouped-agg results are rounded at 4+
decimals where the margin dwarfs last-ulp noise (see functions/numeric.py
for the policy).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "udf_python_row",
    oracle="""
    SELECT o_orderkey,
           concat('ORD-', CAST(o_orderkey AS VARCHAR), '/', o_orderstatus) AS order_tag
    FROM orders WHERE o_orderkey < 200
    """,
)
def udf_python_row(spark, sf_dir):
    """U1: row-at-a-time Python UDF — the reference's script hook, shown on
    a deliberately small slice (per-row serde makes this the slow path; the
    vectorized variants below are the production shape)."""

    @F.udf(T.StringType())
    def order_tag(key, status):
        return f"ORD-{key}/{status}"

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey", order_tag("o_orderkey", "o_orderstatus").alias("order_tag")
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(1 + l_extendedprice) * 2, 6) AS scaled_log_price
    FROM lineitem WHERE l_orderkey < 400
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """U2: scalar pandas_udf — Arrow batches in/out, numpy vectorized."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def scaled_log_price(price: pd.Series) -> pd.Series:
        return np.round(np.log1p(price) * 2, 6)

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey", "l_linenumber",
        scaled_log_price("l_extendedprice").alias("scaled_log_price"),
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark, sf_dir):
    """U4: grouped-aggregate pandas_udf (UDAF) — quantity-weighted mean
    price; Catalyst still plans partial aggregation around it."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float(np.round(np.dot(price, qty) / qty.sum(), 4))

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
             AS balance_zscore
    FROM customer
    """,
)
def udf_grouped_map(spark, sf_dir):
    """U3: grouped-map applyInPandas (UDTF-like) — per-segment z-score of
    account balance; whole groups arrive as pandas DataFrames."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean, std = pdf["c_acctbal"].mean(), pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "balance_zscore": ((pdf["c_acctbal"] - mean) / std).round(4),
            }
        )

    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey bigint, c_mktsegment string, balance_zscore double"
    )


@query(
    "udf_udtf_sentences",
    oracle="""
    WITH s AS (
      SELECT doc_id, string_split(text, '. ') AS parts
      FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           CAST(generate_subscripts(parts, 1) - 1 AS INTEGER) AS sent_idx,
           unnest(parts) AS sentence
    FROM s
    """,
)
def udf_udtf_sentences(spark, sf_dir):
    """U5: Python UDTF (table function) — one input row expands to N output
    rows, the 'custom explode' surface. Splitting docs into indexed
    sentences is the LLM-pipeline motivation (chunking before embedding).
    The UDTF itself is deliberately minimal; the demo slice keeps the
    row-at-a-time Python path off any hot loop (mapInPandas is the
    production shape for bulk chunking)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            for i, sent in enumerate(text.split(". ")):
                yield doc_id, i, sent

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("sentence_split", SentenceSplit)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT s.* FROM __udtf_docs, "
        "LATERAL sentence_split(doc_id, text) s"
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity) + ln(1 + l_discount), 6) AS score
    FROM lineitem WHERE l_orderkey < 400
    """,
)
def udf_arrow_scalar(spark, sf_dir):
    """Arrow-optimized Python UDF (U1's modern form, Spark 3.5+
    ``useArrow=True``): the function body is still written row-at-a-time
    — the migration path for existing row UDFs — but the executor<->
    worker transfer happens in Arrow batches instead of pickled rows,
    removing the per-row serialization tax without rewriting the UDF to
    the vectorized pandas signature. Still slower than built-ins or
    pandas UDFs (the Python loop remains); the demo mirrors
    `udf_pandas_scalar` so the three U-surface tiers are directly
    comparable on the same rows."""
    import math

    @F.udf(returnType=T.DoubleType(), useArrow=True)
    def score(qty: float, disc: float) -> float:
        return round(math.sqrt(qty) + math.log(1 + disc), 6)

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 400
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        score(
            F.col("l_quantity").cast("double"),
            F.col("l_discount").cast("double"),
        ).alias("score"),
    )


@query(
    "udf_udtf_analyze",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x != '') AS toks
      FROM documents WHERE doc_id < 40)
    SELECT doc_id,
           toks[1] AS c0, toks[2] AS c1, toks[3] AS c2,
           CAST(len(toks) AS INTEGER) AS n_tokens
    FROM t
    """,
)
def udf_udtf_analyze(spark, sf_dir):
    """U7: POLYMORPHIC Python UDTF (Spark 4 ``analyze``): the output
    schema is not declared — the UDTF's static ``analyze`` method
    computes it AT PLAN TIME from the call's literal argument (here
    ``n = 3`` leading tokens → columns c0..c2 + a count), so one table
    function serves any width without a registration per shape — the
    Catalyst-side contract a fixed ``returnType`` UDTF cannot express.
    The Python path stays off bulk data by design (demo slice;
    mapInPandas remains the production shape)."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeResult

    @udtf
    class LeadTokens:
        @staticmethod
        def analyze(doc_id, text, n):
            width = int(n.value)
            schema = StructType().add("doc_id", LongType())
            for i in range(width):
                schema = schema.add(f"c{i}", StringType())
            schema = schema.add("n_tokens", IntegerType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, text: str, n: int):
            toks = [t for t in text.lower().split() if t]
            head = toks[: int(n)]
            head += [None] * (int(n) - len(head))
            yield (doc_id, *head, len(toks))

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    )
    spark.udtf.register("lead_tokens", LeadTokens)
    d.createOrReplaceTempView("__udtf_poly_docs")
    return spark.sql(
        "SELECT s.* FROM __udtf_poly_docs, "
        "LATERAL lead_tokens(doc_id, text, 3) s"
    )
