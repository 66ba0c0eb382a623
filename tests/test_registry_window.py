"""The registry's driver-facing contract: the priority list must resolve
completely (a typo would silently drop a query from the driver's first-50
verification window), every query must carry an oracle, the window must
lead with the queries that still need driver evidence, and the registry
size must match what COVERAGE.md documents (so the doc can't drift)."""

from __future__ import annotations

import json
import os

from s3_glue_redshift_guide_spark.queries import _PRIORITY, REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Update when queries land; test_registry_size keeps COVERAGE.md honest.
EXPECTED_REGISTRY_SIZE = 281


def _verified_names() -> set[str]:
    import glob

    out: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        out |= set(json.load(open(path)))
    return out


def test_priority_list_resolves_completely():
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority names not in registry: {missing}"


def test_priority_list_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_every_query_has_an_oracle():
    no_oracle = [q.name for q in REGISTRY.values() if q.oracle is None]
    assert not no_oracle, no_oracle


def test_registry_size():
    assert len(REGISTRY) == EXPECTED_REGISTRY_SIZE, (
        f"registry has {len(REGISTRY)} queries; update "
        "EXPECTED_REGISTRY_SIZE and the COVERAGE.md counts together"
    )


def test_first_window_covers_every_unverified_query():
    """Every query without a banked driver CORRECTNESS row (any round) must
    sit inside the driver's first-50 verification window — the invariant
    that drives at-least-once coverage of the whole registry."""
    verified = _verified_names()
    if not verified:  # fresh clone without driver artifacts
        return
    order = list(REGISTRY)
    first50 = set(order[:50])
    unverified = [n for n in REGISTRY if n not in verified]
    outside = [n for n in unverified if n not in first50]
    # When one round lands more new rows than the window has free slots
    # (50 minus the rotation debt the VERDICT directives claim first),
    # the overflow must sit CONTIGUOUSLY at positions 50.. — i.e. next
    # in line, guaranteed to enter round N+1's window — never scattered
    # behind already-verified rows.
    positions = sorted(order.index(n) for n in outside)
    assert positions == list(range(50, 50 + len(outside))), (
        f"unverified queries must fill the window then queue "
        f"immediately after it; got positions {positions} for {outside}"
    )
