"""ANN index SQL verbs (VERDICT-r8 directive #5): dispatch + error
paths. The full lifecycle (build/refresh/replay/optimize, SQL ≡
method) is the ``llm_ann_sql_lifecycle`` registry row."""

from __future__ import annotations

import tempfile

import pytest

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable
from s3_glue_redshift_guide_spark.sql_dml import snapshot_sql


def test_create_ann_index_requires_dim(spark):
    root = tempfile.mkdtemp(prefix="annv_")
    with pytest.raises(ValueError, match="dim"):
        snapshot_sql(
            spark,
            f"CREATE ANN INDEX ON pysnapshot.`{root}` (embedding) "
            "WITH (n_lists = 4)",
        )


def test_create_ann_index_rejects_unknown_option(spark):
    root = tempfile.mkdtemp(prefix="annv2_")
    with pytest.raises(ValueError, match="unknown option"):
        snapshot_sql(
            spark,
            f"CREATE ANN INDEX ON pysnapshot.`{root}` (embedding) "
            "WITH (dim = 8, bogus = 1)",
        )


def test_refresh_without_index_raises(spark):
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="annv3_"))
    t.commit_append(spark.createDataFrame([(1,)], "vec_id int"))
    with pytest.raises(ValueError, match="no ANN index"):
        snapshot_sql(
            spark, f"REFRESH ANN INDEX ON pysnapshot.`{t.root}`"
        )
    with pytest.raises(ValueError, match="no ANN index"):
        snapshot_sql(
            spark, f"OPTIMIZE ANN INDEX ON pysnapshot.`{t.root}`"
        )
