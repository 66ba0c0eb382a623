"""J1-J8 — join operators, including the two Spark lacks natively.

Standard joins (inner/outer/semi/anti/cross/theta) are direct DataFrame
calls — Catalyst + AQE pick broadcast-hash vs shuffled-hash vs sort-merge
and handle skew; wrapping them would only hide the plan. What this module
adds are the two composite algorithms the engine needs as first-class ops:

* ``range_join`` — equi-join on a bucketed time/number key plus residual
  range predicate. Without bucketing, Spark plans ``a.ts BETWEEN b.lo AND
  b.hi`` as a broadcast-nested-loop (O(n*m) compares); with bucketing the
  compare count drops to pairs sharing adjacent buckets — the standard
  Spark range-join decomposition, and the one that survives 100 TB.

* ``as_of_join`` — "latest left-side row at or before each right-side
  time, per key" without a per-key shuffle-heavy self-join: union both
  sides tagged, one window pass per key ordered by time carries the most
  recent left payload forward (``last(ignoreNulls=True)``), then filter
  back to right rows. One shuffle on the key — the same cost as a single
  groupBy — instead of a join whose build side is the whole left table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: Column | str | int,
    upper: Column | str | int,
    bucket_seconds: int,
    extra_on: list[tuple[str, str]] | None = None,
    how: str = "inner",
    dedup_unmatched: bool = True,
) -> DataFrame:
    """Join rows where ``right_ts`` falls in [left_ts + lower, left_ts + upper).

    ``lower``/``upper`` are second offsets; ``bucket_seconds`` should be
    >= (upper - lower) so each left row lands in at most 2 candidate buckets.
    ``extra_on`` adds equi-key pairs (joined before the range residual, so
    they participate in the shuffle key — crucial for skew control).

    All comparisons run at microsecond precision (``unix_micros``); a
    second-granularity residual would silently mis-classify sub-second
    boundaries.

    Outer modes (``left``/``full``): the bucket explode would surface an
    unmatched left row once per candidate bucket, so those modes dedup
    internally on a per-row id — row-level output is exact, at the cost of
    one extra shuffle (a window over the synthetic id). Callers that only
    aggregate with null-ignoring functions (count(col), sum) can pass
    ``dedup_unmatched=False`` to skip that shuffle — duplicate null rows
    are invisible to such aggregates. Semi/anti are rejected: "matches in
    no bucket" is not decidable per exploded copy; use an inner range join
    + aggregation instead.
    """
    if how in ("semi", "left_semi", "anti", "left_anti"):
        raise ValueError(
            "range_join does not support semi/anti; use how='inner' and "
            "aggregate (semi) or anti-join on the inner result's keys (anti)"
        )
    us = 1_000_000
    lo = (F.lit(lower) if not isinstance(lower, Column) else lower) * us
    hi = (F.lit(upper) if not isinstance(upper, Column) else upper) * us
    bucket_us = bucket_seconds * us
    outer_left = dedup_unmatched and how in (
        "left", "left_outer", "full", "outer", "full_outer"
    )

    lb = left.withColumn(
        "__win_start", F.unix_micros(F.col(left_ts).cast("timestamp")) + lo
    ).withColumn("__win_end", F.unix_micros(F.col(left_ts).cast("timestamp")) + hi)
    if outer_left:
        lb = lb.withColumn("__lid", F.monotonically_increasing_id())
    rb = right.withColumn("__r_us", F.unix_micros(F.col(right_ts).cast("timestamp")))

    # Left row spans bucket(win_start) .. bucket(win_end): explode candidates.
    lb = lb.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"__win_start div {bucket_us}"),
                F.expr(f"__win_end div {bucket_us}"),
            )
        ),
    )
    rb = rb.withColumn("__bucket", F.expr(f"__r_us div {bucket_us}"))

    on = [lb["__bucket"] == rb["__bucket"]]
    for lcol, rcol in extra_on or []:
        on.append(lb[lcol] == rb[rcol])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    residual = (rb["__r_us"] >= lb["__win_start"]) & (rb["__r_us"] < lb["__win_end"])

    joined = lb.join(rb, cond & residual, how)
    if outer_left:
        # Unmatched left rows appear once per candidate bucket; keep every
        # matched row and exactly one null-extended row per never-matched
        # id (the copies are identical after the internals drop, so the
        # lowest-bucket representative is an arbitrary-but-stable pick).
        # Right-only rows of a full join carry a null __lid: always kept.
        matched = rb["__r_us"].isNotNull()
        w = Window.partitionBy("__lid")
        joined = (
            joined.withColumn("__has_match", F.max(matched.cast("int")).over(w))
            .withColumn(
                "__rn",
                F.row_number().over(Window.partitionBy("__lid").orderBy(lb["__bucket"])),
            )
            .filter(
                F.col("__lid").isNull()
                | matched
                | ((F.col("__has_match") == 0) & (F.col("__rn") == 1))
            )
            .drop("__has_match", "__rn", "__lid")
        )
    for d in ["__win_start", "__win_end", "__r_us", "__bucket"]:
        joined = joined.drop(d)
    return joined


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each ``right`` row, attach the latest ``left`` row with
    left_ts <= right_ts (or < if ``strict``) sharing the ``on`` key.

    Implementation: tag and union both sides, sort within key by
    (ts, side-order), carry ``value_cols`` forward with
    ``last(ignoreNulls)``, keep right rows. Left rows order before right
    rows at equal timestamps unless ``strict`` (then after), which encodes
    the <= / < boundary without a second pass.
    """
    tag_left = 1 if not strict else 2
    tag_right = 2 if not strict else 1

    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(tag_left).alias("__side"),
        F.lit(None).cast("long").alias("__rid"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # The tagged rhs is referenced by TWO plan subtrees (the union and the
    # final join-back). monotonically_increasing_id is partition-order-
    # dependent, so without a materialization barrier an upstream shuffle
    # or task retry could assign different __rid values to the two
    # evaluations and attach as-of values to the wrong rows. localCheckpoint
    # pins one id assignment that both subtrees read.
    rhs = right.withColumn(
        "__rid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    rhs_tagged = rhs.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(tag_right).alias("__side"),
        F.col("__rid"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs_tagged)
    for c in value_cols:
        merged = merged.withColumn(
            f"__v_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    carried = merged.filter(F.col("__side") == F.lit(2 if not strict else 1)).select(
        "__rid", *[F.col(f"__v_{c}").alias(f"asof_{c}") for c in value_cols]
    )
    out = rhs.join(carried, "__rid", "left").drop("__rid")
    return out
