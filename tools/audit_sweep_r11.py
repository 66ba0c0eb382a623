"""Round-11 optimization sweep: audit_plan over every declared query.

Builds each declared query's DataFrame at sf0.01 and runs the
plans.audit.audit_plan reviewer over its physical plan, writing one JSON
line per query (name, n_warnings, codes) to stdout, worst-first summary
at the end. Advisory evidence for OPTIMIZATION_r11.md — no execution of
the full query beyond what building the frame requires.
"""
from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import importlib

mod = importlib.import_module("__spark_entry__")
from s3_glue_redshift_guide_spark.plans.audit import audit_plan  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("r11-audit-sweep")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

DATA = "/root/testdata/sf0.01"
qs = mod.queries()
rows = []
for i, (name, fn) in enumerate(qs.items()):
    t0 = time.perf_counter()
    try:
        df = fn(spark, DATA)
        warns = audit_plan(df)
        rows.append(
            {
                "q": name,
                "n": len(warns),
                "codes": sorted({w.code for w in warns}),
                "details": [w.detail[:160] for w in warns][:4],
                "build_sec": round(time.perf_counter() - t0, 2),
            }
        )
    except Exception as e:  # noqa: BLE001
        rows.append({"q": name, "err": f"{type(e).__name__}: {e}"[:200]})
        traceback.print_exc(file=sys.stderr)
    print(json.dumps(rows[-1]), flush=True)

flagged = [r for r in rows if r.get("n")]
errs = [r for r in rows if "err" in r]
print(
    json.dumps(
        {
            "total": len(rows),
            "clean": len(rows) - len(flagged) - len(errs),
            "flagged": len(flagged),
            "errors": len(errs),
            "worst": sorted(flagged, key=lambda r: -r["n"])[:20],
        }
    ),
    flush=True,
)
spark.stop()
