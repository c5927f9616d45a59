"""Pinned window-freshness invariant (VERDICT r9 item 2).

Evidence for a query is only as good as the code it tested: the
driver hard-checks the first 50 registry entries per round, so a
query whose implementation changed AFTER its latest driver row is
carrying stale evidence.  scripts/freshness.py computes exactly that
set from `git log` round markers + the CORRECTNESS_r*.json union at
function-source granularity; this test pins the rule the window
picker previously followed informally:

    stale ∪ never-checked  ⊆  current 50-slot window

so the discipline cannot silently decay as the registry grows.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _freshness():
    spec = importlib.util.spec_from_file_location(
        "freshness", os.path.join(REPO, "scripts", "freshness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_stale_query_holds_a_window_slot():
    fresh = _freshness()
    from heatmap_spark import queries as Q

    stale = fresh.stale_queries()
    window = set(Q._PRIORITY)
    uncovered = {q: why for q, why in stale.items() if q not in window}
    assert not uncovered, (
        "queries with stale or missing driver evidence are outside the "
        f"50-slot window — rotate queries.py _PRIORITY: {uncovered}"
    )


def test_every_overage_query_holds_a_window_slot():
    """Max-age rule (VERDICT r10 item 2): untouched code must not
    carry ancient evidence — any query whose latest driver row is
    older than current_round - AGE_LIMIT rotates back into the
    window.  AGE_LIMIT=7 is the tightest sustainable bound at 290
    queries / ~46 effective slots per round (see scripts/freshness.py
    module docstring)."""
    fresh = _freshness()
    from heatmap_spark import queries as Q

    overage = fresh.overage_queries()
    window = set(Q._PRIORITY)
    uncovered = {q: why for q, why in overage.items() if q not in window}
    assert not uncovered, (
        "queries with over-age driver evidence are outside the 50-slot "
        f"window — rotate queries.py _PRIORITY: {uncovered}"
    )


def test_window_is_exactly_the_driver_prefix():
    """The driver checks the FIRST 50 registry entries; the rotation
    reorder must actually put the window there."""
    from heatmap_spark import queries as Q

    assert list(Q.REGISTRY)[:50] == Q._PRIORITY
    assert len(set(Q._PRIORITY)) == 50


def test_marker_parsing_sees_all_rounds():
    """Every past round's driver commit must parse — a renamed marker
    would silently mark everything fresh."""
    fresh = _freshness()
    markers = fresh.round_markers()
    assert set(markers) >= set(range(1, 11)), sorted(markers)
