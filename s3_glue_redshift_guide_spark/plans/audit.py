"""Physical-plan scale audit — ".explain and iterate", mechanized.

Every operator in this engine was tuned by reading ``explain("formatted")``
and rejecting plans that would not survive a 1000-executor cluster
(PLANS.md records the audits; tests/test_plans.py freezes them). This
module packages that review as a callable so pipelines can gate on it:
``audit_plan(df)`` returns the anti-patterns a human reviewer would flag,
each tied to the physical-plan evidence.

Rules (all textual over the compiled physical plan — no execution):

* ``cartesian``        CartesianProduct / BroadcastNestedLoopJoin: O(|L|x|R|)
                       compares; at scale this is the job that never ends.
                       Usually a missing equi-key or an un-bucketed range
                       predicate (see operators/joins.py::range_join).
* ``unpushed-filter``  a Filter node runs above a scan whose
                       ``PushedFilters`` is empty: the scan reads rows the
                       query immediately drops. Casts/UDFs around the
                       predicate column are the usual cause.
* ``python-row-udf``   BatchEvalPython: row-at-a-time Python in the plan.
                       Arrow-batched (ArrowEvalPython / mapInPandas) is
                       10-100x faster; built-ins beat both.
* ``global-sort``      a range-partitioned Exchange that is not a top-k
                       (TakeOrderedAndProject): every row moves through a
                       sampled range shuffle. Fine for final small output,
                       a bottleneck mid-pipeline.
* ``shuffle-heavy``    more exchanges than ``max_exchanges`` (default 5):
                       often a missed reuse of one partitioning across
                       stages.

The audit is advisory: each warning carries the plan fragment so the
reviewer decides. A clean bill from this audit plus bit-exact oracle
parity is this repo's definition of done for an operator.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanWarning:
    code: str
    severity: str  # "high" | "medium" | "info"
    detail: str


def _top_level_items(s: str) -> int:
    """Count comma-separated items at paren depth 0 ('' -> 0)."""
    s = s.strip()
    if not s:
        return 0
    depth, items = 0, 1
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items += 1
    return items


def plan_string(df: DataFrame) -> str:
    """The compiled physical plan (AQE initial plan before execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def _has_equi_key(join_node) -> bool:
    """True when the logical Join carries a top-level-conjunct equality
    between attributes of BOTH sides — i.e. ``ExtractEquiJoinKeys`` will
    match and the join compiles to a hash/sort-merge/broadcast-hash join,
    never a nested loop. Equalities buried under OR (``a.x = b.x OR a.y >
    b.y``) do NOT count: Catalyst only extracts conjunctive keys, so such
    a join still plans as BNLJ/Cartesian."""
    cond = join_node.condition()
    if not cond.isDefined():
        return False
    left_out = join_node.left().outputSet()
    right_out = join_node.right().outputSet()
    # split the condition on And only (conjuncts), then test each conjunct
    walk = [cond.get()]
    while walk:
        e = walk.pop()
        name = e.getClass().getSimpleName()
        if name == "And":
            kids = e.children()
            for i in range(kids.length()):
                walk.append(kids.apply(i))
            continue
        if name in ("EqualTo", "EqualNullSafe"):
            lrefs, rrefs = e.left().references(), e.right().references()
            straight = (
                left_out.intersect(lrefs).nonEmpty()
                and right_out.intersect(rrefs).nonEmpty()
            )
            flipped = (
                left_out.intersect(rrefs).nonEmpty()
                and right_out.intersect(lrefs).nonEmpty()
            )
            if straight or flipped:
                return True
    return False


def _bounded_side_join_count(df: DataFrame, bound: int = 100) -> int:
    """Number of logical Join nodes that (a) could only plan as a nested
    loop — no conjunct-level left<->right equality predicate, see
    ``_has_equi_key`` — and (b) have one input provably producing at most
    ``bound`` rows (logical ``maxRows`` — defined for global aggregates,
    limits, one-row relations).

    A nested-loop join against such a side is a SCALAR BROADCAST — the
    idiom for attaching a corpus count / grand total / threshold to every
    row — and costs O(|big side|), not O(|L|x|R|). The audit uses this to
    separate those from genuine cartesians. Equi-joins are EXCLUDED even
    when a side is bounded: they compile to hash joins and never appear as
    CartesianProduct/BNLJ in the physical plan, so counting them would let
    a real cartesian hide behind a harmless bounded-side equi-join."""
    walk = [df._jdf.queryExecution().optimizedPlan()]
    n = 0
    while walk:
        node = walk.pop()
        kids = node.children()
        for i in range(kids.length()):
            walk.append(kids.apply(i))
        if node.nodeName() != "Join" or _has_equi_key(node):
            continue
        for i in range(2):
            mr = node.children().apply(i).maxRows()
            if mr.isDefined() and int(mr.get()) <= bound:
                n += 1
                break
    return n


def audit_plan(df: DataFrame, max_exchanges: int = 5) -> list[PlanWarning]:
    plan = plan_string(df)
    warnings: list[PlanWarning] = []

    n_cartesian = sum(
        plan.count(node)
        for node in ("CartesianProduct", "BroadcastNestedLoopJoin")
    )
    if n_cartesian:
        # every nested-loop join accounted for by a provably-bounded build
        # side is a scalar broadcast (info); any excess is a real cartesian
        if n_cartesian <= _bounded_side_join_count(df):
            warnings.append(
                PlanWarning(
                    "scalar-broadcast",
                    "info",
                    "nested-loop join(s) whose build side is provably "
                    "<=100 rows (global aggregate / limit): a scalar "
                    "attach, O(|big side|) at any scale",
                )
            )
        else:
            warnings.append(
                PlanWarning(
                    "cartesian",
                    "high",
                    "CartesianProduct/BroadcastNestedLoopJoin in plan: "
                    "O(|L|x|R|) row compares; add an equi-key (bucketed "
                    "decomposition for range/as-of predicates) or "
                    "broadcast-join a provably small side",
                )
            )

    # a scan whose DataFilters outnumber its PushedFilters evaluates the
    # residue AFTER reading the rows: some predicate (usually wrapped in a
    # cast/UDF/derived expression) could not translate to a parquet filter
    for scan in re.finditer(
        r"DataFilters: \[(.*?)\], Format:.*?PushedFilters: \[(.*?)\]",
        plan,
        re.DOTALL,
    ):
        n_data = _top_level_items(scan.group(1))
        n_pushed = _top_level_items(scan.group(2))
        if n_data > n_pushed:
            warnings.append(
                PlanWarning(
                    "unpushed-filter",
                    "medium",
                    f"scan evaluates {n_data - n_pushed} predicate(s) "
                    "post-read (not translated to parquet filters); check "
                    "for casts/UDFs wrapping the filtered column",
                )
            )
            break

    if "BatchEvalPython" in plan:
        warnings.append(
            PlanWarning(
                "python-row-udf",
                "medium",
                "row-at-a-time Python UDF in the plan; prefer built-in "
                "functions or Arrow-batched pandas_udf/mapInPandas",
            )
        )

    if (
        "Exchange rangepartitioning" in plan
        and "TakeOrderedAndProject" not in plan
    ):
        warnings.append(
            PlanWarning(
                "global-sort",
                "info",
                "range-partitioned shuffle (global sort) that is not a "
                "top-k; acceptable for final output, a bottleneck "
                "mid-pipeline",
            )
        )

    n_exchanges = plan.count("Exchange ")
    if n_exchanges > max_exchanges:
        warnings.append(
            PlanWarning(
                "shuffle-heavy",
                "info",
                f"{n_exchanges} exchanges (> {max_exchanges}); look for a "
                "partitioning reusable across stages or pre-bucketed "
                "inputs",
            )
        )

    return warnings
