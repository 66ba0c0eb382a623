"""The local twin of the driver's t2 gate: every registered query with an
oracle must match DuckDB exactly at sf0.01 (and run without error at
sf0.001 when it has no oracle)."""

from __future__ import annotations

import pytest

from s3_glue_redshift_guide_spark.queries import REGISTRY

from .conftest import SF_CORRECT, SF_SMOKE
from .parity import run_pair

NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sf_dir = SF_CORRECT if q.oracle is not None else SF_SMOKE
    problems = run_pair(spark, duck(sf_dir), q, sf_dir)
    assert not problems, "\n".join(problems)
