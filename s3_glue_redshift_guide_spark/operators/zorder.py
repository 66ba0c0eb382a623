"""Z-order (Morton-curve) data layout for multi-column file pruning.

A table sorted by one column prunes row groups only for filters on THAT
column; a 100 TB fact table is usually filtered by several. Interleaving
the bits of two key columns into one Morton value and sorting the write
by it gives every file a bounded range in BOTH dimensions, so min/max
footer stats prune files for filters on either column — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain Spark
expressions (shift/and/or — whole-stage-codegen'd, no UDF).

The bit-spreading uses the classic magic-number doubling steps (insert a
zero between consecutive bits of a 16-bit value); both the Spark and the
DuckDB oracle sides compute the identical signed-64-bit arithmetic, so
the transform is bit-exact cross-engine and sits under the value-hash
correctness gate like any scalar function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (shift, mask) doubling steps spreading a 16-bit value over 32 bits.
_SPREAD_STEPS = [
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]

#: Values are masked to this many low bits before interleaving.
Z_BITS = 16


def _spread_bits(c: Column) -> Column:
    x = c.cast("bigint").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    for shift, mask in _SPREAD_STEPS:
        # Column | Column is BOOLEAN or in PySpark — bitwiseOR is explicit
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z_value(a: Column, b: Column) -> Column:
    """Morton interleave of the low 16 bits of ``a`` (even bit positions)
    and ``b`` (odd positions) — a bigint sort key with 2-D locality."""
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def normalize_to_bits(c: Column, cmin: Column, cmax: Column) -> Column:
    """Scale ``c`` from [cmin, cmax] onto the full [0, 2^Z_BITS) range.

    WITHOUT this, a narrow column interleaved with a wide one contributes
    no high z-bits and gets no locality at all (the classic z-order
    pitfall — Delta's OPTIMIZE ZORDER range-normalizes for the same
    reason). Integer-exact inputs keep the double multiply/divide below
    2^53, so floor() is bit-identical cross-engine."""
    span = F.greatest((cmax - cmin).cast("bigint"), F.lit(1))
    scaled = (c - cmin).cast("bigint") * F.lit((1 << Z_BITS) - 1)
    return F.floor(scaled / span).cast("bigint")


def sql_z_query(table: str, col_a: str, col_b: str) -> str:
    """A complete DuckDB query mirroring the normalized z-value of every
    ``table`` row (identical min/max scaling + signed-64-bit shift/and/or
    arithmetic), for oracle registration. Normalization happens once in a
    CTE; only cheap column references duplicate through the spread steps.
    """

    def spread(col: str) -> str:
        e = f"({col} & {(1 << Z_BITS) - 1})"
        for shift, mask in _SPREAD_STEPS:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    top = (1 << Z_BITS) - 1
    return f"""
    WITH lim AS (
      SELECT CAST(min({col_a}) AS BIGINT) AS la,
             CAST(max({col_a}) AS BIGINT) AS ha,
             CAST(min({col_b}) AS BIGINT) AS lb,
             CAST(max({col_b}) AS BIGINT) AS hb
      FROM {table}),
    n AS (
      SELECT {col_a}, {col_b},
             CAST(floor(CAST({col_a} - la AS BIGINT) * {top}
                        / greatest(ha - la, 1)) AS BIGINT) AS na,
             CAST(floor(CAST({col_b} - lb AS BIGINT) * {top}
                        / greatest(hb - lb, 1)) AS BIGINT) AS nb
      FROM {table}, lim)
    SELECT {col_a}, {col_b},
           ({spread('na')} | ({spread('nb')} << 1)) AS zval
    FROM n"""


def z_order_key(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Attach the normalized Morton key as ``__z``: per-column min/max via
    a 1-row aggregate broadcast (scalar attach — O(|df|) at any scale),
    range-normalize both columns onto the full bit range, interleave."""
    lims = df.agg(
        F.min(col_a).cast("bigint").alias("__la"),
        F.max(col_a).cast("bigint").alias("__ha"),
        F.min(col_b).cast("bigint").alias("__lb"),
        F.max(col_b).cast("bigint").alias("__hb"),
    )
    na = normalize_to_bits(F.col(col_a), F.col("__la"), F.col("__ha"))
    nb = normalize_to_bits(F.col(col_b), F.col("__lb"), F.col("__hb"))
    return (
        df.crossJoin(F.broadcast(lims))
        .withColumn("__z", z_value(na, nb))
        .drop("__la", "__ha", "__lb", "__hb")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    (``col_a``, ``col_b``): range-partition + sort by the z-value so each
    of the ``n_files`` output files owns a contiguous curve segment — a
    bounded rectangle-ish region in both dimensions, which is what makes
    min/max footer stats selective for filters on either column.

    Scale note: ``repartitionByRange`` samples the z-distribution (one
    extra pass over the sort key only); at cluster scale this is the same
    machinery as any global sort-write and runs once per layout job, not
    per query."""
    (
        z_order_key(df, col_a, col_b)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
