"""t1 smoke twin: the driver-facing entry() contract."""

from __future__ import annotations

import importlib


def test_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"region_name", "nation_name", "revenue", "n_rows"} == set(df.columns)
    # every queries() key with an oracle_sql() entry, and all callables callable
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
