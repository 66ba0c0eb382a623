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


def z_value_n(cols: list[Column]) -> Column:
    """N-way Morton interleave: column ``j`` of N owns bit positions
    ``i*N + j`` for the low ``floor(63/N)`` bits of each value — the
    generalization Delta's multi-column OPTIMIZE ZORDER BY needs.
    For N == 2 this delegates to the doubling-steps ``z_value`` (16
    bits/column, bit-identical to the 2-D oracle); for N >= 3 each bit
    places with an explicit shift/or chain (B*N expression nodes, B =
    bits/column — ~63 nodes at N=3, all whole-stage-codegen'd integer
    ops). Inputs must already be range-normalized onto the full
    [0, 2^bits) range (``normalize_to_bits_n``) or narrow columns
    contribute no high bits and lose all locality."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least two columns")
    if n == 2:
        return z_value(cols[0], cols[1])
    bits = 63 // n
    out = None
    for j, c in enumerate(cols):
        x = c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            placed = F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + j
            )
            out = placed if out is None else out.bitwiseOR(placed)
    return out


def z_bits_for(n_cols: int) -> int:
    """Bits per column in the N-way interleave (16 for the 2-D fast
    path, floor(63/N) otherwise)."""
    return Z_BITS if n_cols == 2 else 63 // n_cols


def normalize_to_bits_n(c: Column, cmin: Column, cmax: Column,
                        n_cols: int) -> Column:
    """``normalize_to_bits`` parameterized by the interleave width."""
    top = (1 << z_bits_for(n_cols)) - 1
    span = F.greatest((cmax - cmin).cast("bigint"), F.lit(1))
    scaled = (c - cmin).cast("bigint") * F.lit(top)
    return F.floor(scaled / span).cast("bigint")


def z_order_key_n(df: DataFrame, cols: list[str]) -> DataFrame:
    """``z_order_key`` for any number of columns: one 1-row broadcast
    carries every column's min/max, the key lands as ``__z``."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("bigint").alias(f"__lo_{c}"))
        aggs.append(F.max(c).cast("bigint").alias(f"__hi_{c}"))
    lims = df.agg(*aggs)
    normed = [
        normalize_to_bits_n(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), len(cols)
        )
        for c in cols
    ]
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    return (
        df.crossJoin(F.broadcast(lims))
        .withColumn("__z", z_value_n(normed))
        .drop(*drop)
    )


def write_zordered_n(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """``write_zordered`` for any number of columns — each output file
    owns a contiguous N-D curve segment, so footer stats prune filters
    on ANY of the clustered columns."""
    (
        z_order_key_n(df, cols)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def sql_z_query_n(table: str, cols: list[str]) -> str:
    """DuckDB mirror of the N-way normalized interleave (generic bit
    placement, signed-64-bit arithmetic) for oracle registration."""
    n = len(cols)
    bits = z_bits_for(n)
    top = (1 << bits) - 1
    lims = ", ".join(
        f"CAST(min({c}) AS BIGINT) AS lo_{j}, "
        f"CAST(max({c}) AS BIGINT) AS hi_{j}"
        for j, c in enumerate(cols)
    )
    norms = ", ".join(
        f"CAST(floor(CAST({c} - lo_{j} AS BIGINT) * {top} "
        f"/ greatest(hi_{j} - lo_{j}, 1)) AS BIGINT) AS n_{j}"
        for j, c in enumerate(cols)
    )
    terms = " | ".join(
        f"(((n_{j} >> {i}) & 1) << {i * n + j})"
        for j in range(n)
        for i in range(bits)
    )
    sel = ", ".join(cols)
    return f"""
    WITH lim AS (SELECT {lims} FROM {table}),
    nrm AS (SELECT {sel}, {norms} FROM {table}, lim)
    SELECT {sel}, ({terms}) AS zval FROM nrm"""
