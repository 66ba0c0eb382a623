"""Persistent catalog registration + MSCK partition repair + messy-input
quarantine — the metastore-facing half of the crawler contract.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_glue_redshift_guide_spark.sources.inference import (
    read_permissive,
    register_persistent_table,
    repair_partitions,
)


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_persistent_table_msck_partition_sync(spark, tmp_path):
    base = str(tmp_path / "ext")
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(
        f"{base}/dt=2024-01-01"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("v", T.StringType()),
            T.StructField("dt", T.StringType()),
        ]
    )
    register_persistent_table(spark, "ext_t", base, schema, ["dt"])
    assert spark.sql("SELECT count(*) FROM ext_t").collect()[0][0] == 1

    # a new partition directory lands out-of-band: invisible until repaired
    spark.createDataFrame([(2, "b")], "id int, v string").write.parquet(
        f"{base}/dt=2024-01-02"
    )
    n_parts = repair_partitions(spark, "ext_t")
    assert n_parts == 2
    assert spark.sql("SELECT count(*) FROM ext_t").collect()[0][0] == 2
    # partition pruning works through the catalog entry
    assert (
        spark.sql("SELECT id FROM ext_t WHERE dt = '2024-01-02'").collect()[0][0]
        == 2
    )
    spark.sql("DROP TABLE ext_t")


def test_read_permissive_quarantines_bad_json(spark, tmp_path):
    p = str(tmp_path / "messy")
    _write(
        f"{p}/a.json",
        '{"id": 1, "v": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "v": "fine"}\n'
        '{"id": "NaN-ish", "v\n',
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = read_permissive(spark, p, schema, fmt="json").cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    quarantine = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in clean.collect()) == [1, 2]
    assert quarantine.count() == 2  # both bad lines captured, job survives


def test_read_permissive_quarantines_bad_csv(spark, tmp_path):
    p = str(tmp_path / "messycsv")
    _write(f"{p}/a.csv", 'id,v\n1,ok\nnot_an_int,boom\n2,fine\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = read_permissive(spark, p, schema, fmt="csv").cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    assert sorted(r["id"] for r in clean.collect()) == [1, 2]
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "not_an_int" in bad[0]["_corrupt_record"]


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """Warehouse-load semantics: overwriting one partition must not wipe
    its siblings (partitionOverwriteMode=dynamic)."""
    out = str(tmp_path / "dyn")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame(
            [(1, "keep", "d1"), (2, "old", "d2")], "id int, v string, dt string"
        ).write.mode("overwrite").partitionBy("dt").parquet(out)
        spark.createDataFrame(
            [(3, "new", "d2")], "id int, v string, dt string"
        ).write.mode("overwrite").partitionBy("dt").parquet(out)
        rows = {
            (r["id"], r["v"], r["dt"])
            for r in spark.read.parquet(out).collect()
        }
        assert rows == {(1, "keep", "d1"), (3, "new", "d2")}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
