#!/usr/bin/env python
"""Capture .explain("formatted") for NAMED registry queries into
plans/r11/<query>_<suffix>.txt (judge-checkable plan evidence for
non-headline queries touched by an optimization).

Usage: python tools/capture_named_plans.py <suffix> <name> [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     PLANS_OUT_DIR (default <repo>/plans/r11 — lets a HEAD worktree
     write its "before" files into the working tree's plans dir).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from s3_glue_redshift_guide_spark.queries import REGISTRY  # noqa: E402
from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "PLANS_OUT_DIR", os.path.join(REPO, "plans", "r11")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_named_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
