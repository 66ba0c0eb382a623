"""Size-statistics join advisor for connector-read snapshot tables.

A DataFrame read through a Python DataSource reports NO size statistics
to Catalyst, so Spark's auto-broadcast decision (sizeInBytes <=
``spark.sql.autoBroadcastJoinThreshold``) can never fire — a 25-row
dimension read via the ``pysnapshot`` connector sort-merge-joins a
billion-row fact, paying two full shuffles where a broadcast costs one
map-side pass. The native-format engines don't have this hole because
their scan nodes carry table statistics; this module reinstates the
same decision from the SNAPSHOT LOG: visible-file byte sizes (and
banked row counts) are an O(files) metadata walk, so the advisor knows
what Catalyst cannot.

At 100 TB the stakes are exactly the classic CBO ones: broadcasting a
small side turns the dominant shuffle into a map-side join; wrongly
broadcasting a big side floods every executor. The advisor is
deliberately CONSERVATIVE: unknown sizes (missing files, empty tables)
advise ``shuffle``, and the broadcast threshold mirrors the session's
own ``autoBroadcastJoinThreshold`` so the advice agrees with what
Catalyst would have done had it known the sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import load_manifest, latest_version


def table_size_bytes(
    root: str, version: int | None = None
) -> int | None:
    """Visible bytes of a snapshot version — the sum of its manifest's
    file sizes. Sizes BANKED in the manifest (round 6: every commit
    records its files' byte sizes) answer from pure metadata — zero
    filesystem calls at any file count; files a pre-banking manifest
    doesn't cover fall back to one ``stat`` each. ``None`` when any
    size is unknowable (a size built on a vanished file would
    UNDERCOUNT, and an undercount is the dangerous direction: it
    green-lights broadcasting a side that is actually huge). An empty
    table is a known 0 — trivially broadcastable — not unknown.
    Deletion vectors deliberately do NOT shrink the estimate:
    tombstoned rows still occupy the bytes a broadcast would ship."""
    v = latest_version(root) if version is None else version
    if v == 0:
        return 0
    m = load_manifest(root, v)
    banked = m.get("sizes") or {}
    total = 0
    for f in m["files"]:
        s = banked.get(f)
        if s is None:
            try:
                s = os.path.getsize(f)
            except OSError:
                return None
        total += s
    return total


def _threshold_bytes(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (Spark accepts
    '10MB' / '10485760b' / plain ints)."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if raw.endswith("b"):
        raw = raw[:-1]
    mult = 1
    if raw and raw[-1] in units:
        mult = units[raw[-1]]
        raw = raw[:-1]
    try:
        return int(float(raw) * mult)
    except ValueError:
        return 10 << 20


def advise_join(
    spark: SparkSession,
    left_root: str,
    right_root: str,
    threshold: int | None = None,
) -> dict:
    """Pick the join strategy Catalyst would pick if it could see the
    snapshot sizes: broadcast the smaller side when it fits under the
    threshold, else shuffle. Returns the decision WITH its evidence so
    callers (and tests) can audit it."""
    thr = _threshold_bytes(spark) if threshold is None else threshold
    lb = table_size_bytes(left_root)
    rb = table_size_bytes(right_root)
    if lb is None or rb is None:
        strategy = "shuffle"  # unknown size: never a blind broadcast
    elif rb <= thr and rb <= lb:
        strategy = "broadcast_right"
    elif lb <= thr:
        strategy = "broadcast_left"
    else:
        strategy = "shuffle"
    return {
        "strategy": strategy,
        "left_bytes": lb,
        "right_bytes": rb,
        "threshold_bytes": thr,
    }


def smart_join(
    left: DataFrame,
    right: DataFrame,
    on,
    advice: dict,
    how: str = "inner",
) -> DataFrame:
    """Apply an ``advise_join`` decision: hint ``F.broadcast`` on the
    advised side (a hint, not a command — Catalyst still refuses absurd
    broadcasts), or leave the plan to the engine for ``shuffle``."""
    if advice["strategy"] == "broadcast_right":
        return left.join(F.broadcast(right), on, how)
    if advice["strategy"] == "broadcast_left":
        return F.broadcast(left).join(right, on, how)
    return left.join(right, on, how)


def estimate_equi_join_rows(
    spark: SparkSession,
    left_root: str,
    right_root: str,
    key: str,
) -> dict:
    """Classic CBO equi-join cardinality from ANALYZE statistics:
    ``|L| * |R| / max(ndv_L(key), ndv_R(key))`` — the independence/
    containment estimate every cost-based optimizer starts from. Row
    counts come from the metadata-only COUNT(*) (banked per-file stats
    minus exact DV tombstones) and NDVs from the banked HLL sketches —
    the whole estimate is a METADATA walk, zero data reads, so planning
    a 100 TB join costs the same as planning a 100 MB one. Honest
    refusal: any missing input (un-analyzed files, stat-less commits)
    yields ``estimated_rows=None`` — a fabricated cardinality is worse
    than none, because downstream decisions (broadcast, shuffle
    partition sizing) amplify it."""
    from ..sources.snapshots import SnapshotTable

    lt = SnapshotTable(spark, left_root)
    rt = SnapshotTable(spark, right_root)
    nl = lt.metadata_count()
    nr = rt.metadata_count()
    dl = lt.table_ndv(key)
    dr = rt.table_ndv(key)
    est = None
    if None not in (nl, nr, dl, dr) and max(dl, dr) > 0:
        est = int(nl * nr // max(dl, dr))
    return {
        "left_rows": nl,
        "right_rows": nr,
        "left_ndv": dl,
        "right_ndv": dr,
        "estimated_rows": est,
    }
