"""S8 — real JDBC round-trips for the warehouse sink, against embedded
Derby (in the Spark JVM's classpath; `jdbc:derby:memory:` needs no server,
matching the sandbox). Covers the reference's "JDBC target with table
creation" contract: create-on-overwrite, create-on-first-append, append
accumulation, and value fidelity. An external warehouse can be exercised
by pointing SPARK_GRAFT_JDBC_URL at it — the same assertions run there.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.sinks.jdbc import write_jdbc

from .conftest import SF_SMOKE

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(db: str) -> str:
    ext = os.environ.get("SPARK_GRAFT_JDBC_URL")
    return ext if ext else f"jdbc:derby:memory:{db};create=true"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**DERBY_PROPS)
        .load()
    )


def test_jdbc_overwrite_creates_table_and_preserves_values(spark):
    url = _url("wh_overwrite")
    nation = load_table(spark, SF_SMOKE, "nation")
    write_jdbc(nation, url, "nation_tbl", mode="overwrite",
               properties=DERBY_PROPS, num_partitions=2)
    back = _read(spark, url, "nation_tbl")
    assert back.count() == nation.count()
    want = {(r["n_nationkey"], r["n_name"], r["n_regionkey"])
            for r in nation.collect()}
    got = {(r["n_nationkey"], r["n_name"], r["n_regionkey"])
           for r in back.collect()}
    assert got == want


def test_jdbc_first_append_creates_table(spark):
    url = _url("wh_append")
    region = load_table(spark, SF_SMOKE, "region")
    # append into a database with no such table: the sink must create it
    write_jdbc(region, url, "region_tbl", mode="append", properties=DERBY_PROPS)
    assert _read(spark, url, "region_tbl").count() == region.count()
    write_jdbc(region, url, "region_tbl", mode="append", properties=DERBY_PROPS)
    assert _read(spark, url, "region_tbl").count() == 2 * region.count()


def test_jdbc_num_partitions_caps_connections(spark):
    url = _url("wh_caps")
    orders = load_table(spark, SF_SMOKE, "orders").limit(100)
    write_jdbc(orders.repartition(8), url, "orders_tbl", mode="overwrite",
               properties=DERBY_PROPS, num_partitions=2, batch_size=50)
    back = _read(spark, url, "orders_tbl")
    assert back.count() == 100
    s = back.agg(F.sum("o_orderkey").alias("s")).collect()[0]["s"]
    assert s == orders.agg(F.sum("o_orderkey").alias("s")).collect()[0]["s"]
