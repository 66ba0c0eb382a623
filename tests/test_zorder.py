"""Z-order layout: interleave correctness vs a bit-level python reference,
and the actual pruning payoff — file min/max footer ranges must admit a
point filter in EITHER dimension for strictly fewer files than a
single-column-sorted layout admits in its non-sorted dimension."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.catalog import load_table
from s3_glue_redshift_guide_spark.operators.zorder import (
    Z_BITS,
    write_zordered,
    z_value,
)

from .conftest import SF_SMOKE


def _py_z(a: int, b: int) -> int:
    a &= (1 << Z_BITS) - 1
    b &= (1 << Z_BITS) - 1
    out = 0
    for i in range(Z_BITS):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_bitlevel_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (12345, 54321),
            (65535, 65535), (65536, 1), (70000, 123456)]
    df = spark.createDataFrame(rows, "a bigint, b bigint").select(
        "a", "b", z_value(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_z(r["a"], r["b"]), (r["a"], r["b"])


def _files_admitting(df, col, value):
    """Number of parquet files whose [min, max] range of ``col`` admits
    ``value`` — the files a footer-stats reader must touch."""
    ranges = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return sum(1 for r in ranges if r["lo"] <= value <= r["hi"]), len(ranges)


def test_zorder_prunes_both_dimensions(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    zdir = tempfile.mkdtemp(prefix="spark_zorder_t_")
    kdir = tempfile.mkdtemp(prefix="spark_keysort_t_")
    write_zordered(o, zdir, "o_custkey", "o_orderkey", n_files=8)
    # baseline: sorted by o_orderkey only — perfect on orderkey,
    # unsorted in custkey
    (
        o.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(kdir)
    )
    zdf = spark.read.parquet(zdir)
    kdf = spark.read.parquet(kdir)

    probe = o.agg(
        F.expr("percentile_approx(o_custkey, 0.5)").alias("c"),
        F.expr("percentile_approx(o_orderkey, 0.5)").alias("k"),
    ).collect()[0]

    zc, zn = _files_admitting(zdf, "o_custkey", probe["c"])
    kc, kn = _files_admitting(kdf, "o_custkey", probe["c"])
    assert zn == 8 and kn == 8
    # the key-sorted layout spreads any custkey over ~every file; z-order
    # must do strictly better on the non-primary dimension
    assert zc < kc, (zc, kc)
    # and still bounded on the other dimension (not a full scan)
    zk, _ = _files_admitting(zdf, "o_orderkey", probe["k"])
    assert zk < 8, zk
