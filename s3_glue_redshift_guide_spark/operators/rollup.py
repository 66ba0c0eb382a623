"""Incremental rollup maintenance — a materialized aggregate kept current
as data arrives, without re-reading history.

The reference's nightly pattern (re-run the job over the whole prefix,
re-load the warehouse) costs O(history) per run; at 100 TB the only
affordable shape is O(new data): aggregate the delta, MERGE it into the
stored rollup. That works exactly when every measure is *mergeable* —
expressible as a commutative monoid over partial states:

    count  <- count_a + count_b          sum <- sum_a + sum_b
    min    <- min(min_a, min_b)          max <- max(max_a, max_b)
    avg    <- derived: sum / count   (NEVER stored — avgs don't merge)

This module stores the partial states in a parquet table keyed by the
group columns and folds each delta in with one unionByName + re-aggregate
— the same partial/final split Spark's own HashAggregate does across
partitions, lifted across *runs*. Combined with IncrementalFileSource
(the bookmark), the pair gives exactly-once incremental rollups end to
end: bookmark decides WHAT is new, this decides HOW it folds in.

The swap write (tmp dir then rename-by-rewrite) keeps readers consistent:
a crashed update leaves the previous rollup intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: measure -> (delta aggregator, state merger). State columns are named
#: HLL sketch precision: 2^12 registers, relative standard error
#: 1.039/sqrt(2^12) ~ 1.62%. Pinned here (rather than relying on the
#: engine default) so error tolerances derived elsewhere cannot drift if
#: a future Spark changes the default.
HLL_LGK = 12
HLL_RSE = 1.039 / (2 ** HLL_LGK) ** 0.5

#: ``<measure>__<col>``; avg intentionally absent (derive at read time).
_MERGEABLE = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda c: F.sum(c),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda c: F.sum(c),
    ),
    "min": (
        lambda c: F.min(c),
        lambda c: F.min(c),
    ),
    "max": (
        lambda c: F.max(c),
        lambda c: F.max(c),
    ),
    # approximate distinct as a mergeable state: the Datasketches HLL
    # binary survives parquet round-trips and unions losslessly, so
    # "distinct users per key, maintained incrementally" costs O(delta)
    # per run like every other measure; ``read()`` derives the estimate.
    "hll": (
        # lgConfigK pinned (= the Datasketches default) so downstream error
        # tolerances can be derived from a known RSE: 1.039/sqrt(2^12) ~ 1.62%
        lambda c: F.hll_sketch_agg(c, HLL_LGK),
        lambda c: F.hll_union_agg(c),
    ),
}


def _hist_bin(col: str, lo: float, hi: float, nbins: int):
    """Clamped equi-width bin index — plain double arithmetic in a fixed
    operation order so DuckDB reproduces it bit-exactly."""
    raw = F.floor(
        ((F.col(col) - F.lit(lo)) * F.lit(nbins)) / F.lit(hi - lo)
    ).cast("int")
    return F.least(F.lit(nbins - 1), F.greatest(F.lit(0), raw))


def hist_quantile_expr(hist, lo: float, hi: float, nbins: int, q: float):
    """Quantile estimate from a merged histogram state: midpoint of the
    first bin whose cumulative count reaches ceil(q * total). Pure
    expression fold — usable at read time on millions of rollup rows
    without a UDF."""
    total = F.aggregate(hist, F.lit(0).cast("bigint"), lambda a, x: a + x)
    target = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.lit(q) * total))
    indexed = F.transform(
        hist, lambda x, i: F.struct(x.alias("c"), i.alias("b"))
    )
    fold = F.aggregate(
        indexed,
        F.struct(
            F.lit(0).cast("bigint").alias("cum"), F.lit(-1).alias("bin")
        ),
        lambda acc, s: F.when(acc["bin"] >= 0, acc).otherwise(
            F.struct(
                (acc["cum"] + s["c"]).alias("cum"),
                F.when(acc["cum"] + s["c"] >= target, s["b"])
                .otherwise(F.lit(-1))
                .alias("bin"),
            )
        ),
    )
    bin_ = F.when(fold["bin"] >= 0, fold["bin"]).otherwise(F.lit(nbins - 1))
    width = (hi - lo) / nbins
    return F.round(
        F.lit(lo) + (bin_ + F.lit(0.5)) * F.lit(width), 6
    )


class IncrementalRollup:
    """Maintain ``measures`` grouped by ``group_cols`` at ``state_path``.

    measures: mapping like ``{"value": ("sum", "min", "max", "count")}``;
    state lives as parquet partials, one row per group. The ``hist``
    measure (a mergeable equi-width histogram — bin-count vectors add
    element-wise, so quantile estimates maintain incrementally like any
    monoid state; the KLL/t-digest idea with a fixed-bin state) requires
    its range pinned in ``hist_config[col] = (lo, hi, nbins)``.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        group_cols: list[str],
        measures: dict[str, tuple[str, ...]],
        hist_config: dict[str, tuple[float, float, int]] | None = None,
    ) -> None:
        for col, ops in measures.items():
            for op in ops:
                if op == "hist":
                    if col not in (hist_config or {}):
                        raise ValueError(
                            f"hist({col}) needs hist_config[{col!r}] = "
                            "(lo, hi, nbins)"
                        )
                    continue
                if op not in _MERGEABLE:
                    raise ValueError(
                        f"{op}({col}) is not mergeable; store sum+count "
                        "and derive ratios at read time"
                    )
        self.spark = spark
        self.state_path = state_path
        self.group_cols = list(group_cols)
        self.measures = measures
        self.hist_config = hist_config or {}

    # ----------------------------------------------------------- internals
    def _state_col(self, op: str, col: str) -> str:
        return f"{op}__{col}"

    def _aggs(self, which: int) -> list:
        out = []
        for col, ops in self.measures.items():
            for op in ops:
                name = self._state_col(op, col)
                if op == "hist":
                    lo, hi, nbins = self.hist_config[col]
                    if which == 0:
                        # delta: nbins conditional counts into one array —
                        # O(nbins) codegen'd expressions, map-side partial
                        b = _hist_bin(col, lo, hi, nbins)
                        expr = F.array(
                            *[
                                F.sum(
                                    F.when(b == i, 1).otherwise(0)
                                ).cast("bigint")
                                for i in range(nbins)
                            ]
                        )
                    else:
                        # merge: element-wise vector add across states
                        expr = F.array(
                            *[
                                F.sum(F.element_at(F.col(name), i + 1))
                                .cast("bigint")
                                for i in range(nbins)
                            ]
                        )
                    out.append(expr.alias(name))
                    continue
                fn = _MERGEABLE[op][which]
                src = col if which == 0 else name
                out.append(fn(src).alias(name))
        return out

    def _read_state(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.state_path)
        except Exception:
            return None  # first run: no state yet

    # ------------------------------------------------------------- surface
    def update(self, delta: DataFrame) -> None:
        """Fold a delta frame into the stored rollup (one shuffle over
        group keys of |delta groups| + |state groups| rows)."""
        partial = delta.groupBy(*self.group_cols).agg(*self._aggs(0))
        state = self._read_state()
        merged = (
            partial
            if state is None
            else state.unionByName(partial)
            .groupBy(*self.group_cols)
            .agg(*self._aggs(1))
        )
        # break lineage from the state file we are about to overwrite, or
        # the write would read its own input mid-overwrite
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.state_path)

    def read(self) -> DataFrame:
        """The rollup with derived measures: avg = sum/count for every
        column that stored both, and the HLL cardinality estimate for
        every ``hll`` state (the sketch itself stays in the stored state,
        mergeable forever; the estimate is read-time-only)."""
        df = self.spark.read.parquet(self.state_path)
        for col, ops in self.measures.items():
            if "sum" in ops and "count" in ops:
                df = df.withColumn(
                    f"avg__{col}",
                    # divide in DOUBLE: repeated merges widen the decimal
                    # sum's precision, and Spark shrinks a near-38-precision
                    # division to scale 6 — double of the exact sum is
                    # stable however many merge rounds produced it
                    F.col(self._state_col("sum", col)).cast("double")
                    / F.col(self._state_col("count", col)).cast("double"),
                )
            if "hll" in ops:
                df = df.withColumn(
                    f"approx_distinct__{col}",
                    F.hll_sketch_estimate(F.col(self._state_col("hll", col))),
                )
        return df
