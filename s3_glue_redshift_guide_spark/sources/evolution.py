"""S5 — additive-only schema evolution.

The reference's crawler policy is "Add new columns only" + "Update all new
and existing partitions with metadata from the table" (README.md:117): a
re-crawl may widen the schema with new columns but must never drop or retype
existing ones. This module is that policy as a ``StructType`` differ, plus a
DataFrame-level conformer built on ``unionByName(allowMissingColumns=True)``
semantics.

Scale note: evolution happens on *metadata* (StructTypes), never by
rewriting data. Old files simply lack the new columns and read as NULL —
the same behavior Parquet ``mergeSchema`` provides, but with the additive
guarantee enforced instead of assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    """A proposed schema change violates the additive-only policy."""


def merge_additive(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Merge ``incoming`` into ``current`` under the add-new-columns-only
    policy. New fields append in incoming order; existing fields must keep
    their type exactly (no retype, no drop — dropped fields stay).

    Nested structs are merged recursively with the same policy.
    """
    cur_by_name = {f.name: f for f in current.fields}
    merged = list(current.fields)
    for f in incoming.fields:
        if f.name not in cur_by_name:
            merged.append(f)
            continue
        cur_f = cur_by_name[f.name]
        if isinstance(cur_f.dataType, T.StructType) and isinstance(f.dataType, T.StructType):
            nested = merge_additive(cur_f.dataType, f.dataType)
            merged[merged.index(cur_f)] = T.StructField(cur_f.name, nested, cur_f.nullable)
        elif cur_f.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"column {f.name!r}: retype {cur_f.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()} violates add-new-columns-only"
            )
    return T.StructType(merged)


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` to the evolved ``target`` schema: missing columns become
    typed NULLs, column order follows the catalog schema. The union of many
    generations of files conforms each side then unions by name."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def evolve_and_union(old: DataFrame, new: DataFrame) -> DataFrame:
    """Read old- and new-generation data as one table under the evolved
    schema (the crawler's re-crawl + partition-metadata update, as a query)."""
    target = merge_additive(old.schema, new.schema)
    return conform(old, target).unionByName(conform(new, target))
