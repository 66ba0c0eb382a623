"""N-column Z-order (z_value_n): bit-parity with the 2-D fast path,
valid interleave, and 3-D layouts whose footer stats prune mid-range
slices on EVERY clustered column."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.operators.zorder import (
    write_zordered_n,
    z_order_key,
    z_order_key_n,
    z_value_n,
)


def test_n2_bit_parity_with_doubling_path(spark):
    df = spark.range(2048).select(
        F.col("id").alias("a"),
        ((F.col("id") * 2654435761) % 2048).alias("b"),
    )
    two = z_order_key(df, "a", "b").select("a", "__z")
    gen = z_order_key_n(df, ["a", "b"]).select(
        "a", F.col("__z").alias("__z2")
    )
    assert (
        two.join(gen, "a").filter(F.col("__z") != F.col("__z2")).count()
        == 0
    )


def test_3col_interleave_is_injective(spark):
    df = spark.range(4096).select(
        (F.col("id") % 16).alias("a"),
        ((F.col("id") / 16).cast("bigint") % 16).alias("b"),
        ((F.col("id") / 256).cast("bigint") % 16).alias("c"),
    )
    z = df.select(
        z_value_n([F.col("a"), F.col("b"), F.col("c")]).alias("z")
    )
    assert z.distinct().count() == 4096  # distinct tuples, distinct keys


def test_3col_layout_prunes_every_dimension(spark):
    import pyarrow.parquet as pq

    df = spark.range(16384).select(
        F.col("id").alias("a"),
        ((F.col("id") * 2654435761) % 16384).alias("b"),
        ((F.col("id") * 40503) % 16384).alias("c"),
    )
    p = tempfile.mkdtemp(prefix="z3_prune_")
    write_zordered_n(df, p, ["a", "b", "c"], n_files=64)
    files = glob.glob(os.path.join(p, "*.parquet"))
    assert len(files) >= 48

    def kept(col, lo, hi):
        n = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).path: i
                for i in range(md.num_columns)
            }[col]
            mn = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            if not (mx < lo or mn > hi):
                n += 1
        return n

    # a mid-range slice on ANY dimension must prune a real fraction —
    # the property a single-column sort only gives ONE dimension
    for col in ("a", "b", "c"):
        assert kept(col, 8000, 8200) < len(files) * 0.8, col
