"""Vector primitives over ``array<float>`` embedding columns.

All JVM-side (``F.aggregate``/``F.zip_with`` fold inside codegen — no UDF,
no Python round-trip), with every element cast to double BEFORE arithmetic
so results are bit-identical to a DuckDB fold over the same data (the
cross-engine parity rule). At 100 TB these expressions vectorize per row
batch and never shuffle; only the downstream join/topk does.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
