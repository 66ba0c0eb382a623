"""Engine-wide numeric conventions for cross-engine determinism.

The driver hashes result values bit-exact, so every query must produce
IDENTICAL doubles from Spark and DuckDB. Three rules make that hold:

1. **Money sums go through DECIMAL.** ``round(sum(double_expr), 2)`` is
   structurally flaky: 2-decimal money values and their products sit exactly
   on round-half boundaries (a 2-dec x 2-dec product has 4 decimals, so ~1%
   end in ``.xx50``), and for large sums the engines' different summation
   orders diverge by more than the rounding margin. Casting inputs to
   DECIMAL(12,2), aggregating exactly, then casting the exact result to
   DOUBLE is order-independent and bit-identical on both engines.
   Spark:  ``dsum(money(col))`` / DuckDB: ``CAST(sum(CAST(c AS
   DECIMAL(12,2))) AS DOUBLE)``.

2. **Averages round to >= 4 decimals.** An average of 2-decimal values over
   a tiny frame (e.g. /2) lands exactly on ``.005`` boundaries at 3
   decimals; at 4 decimals the value grid and the rounding grid no longer
   collide.

3. **Never project DATE.** DuckDB's pandas bridge turns DATE into
   datetime64; keep timestamps end-to-end.

DECIMAL(12,2) per factor keeps three-factor products at precision 38
(Spark's cap) with no value loss for magnitudes < 10^10.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MONEY = "decimal(12,2)"


def money(col: Column | str) -> Column:
    """Exact 2-decimal fixed-point view of a money/quantity double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(expr: Column) -> Column:
    """Exact decimal sum surfaced as double (order-independent bits)."""
    return F.sum(expr).cast("double")
