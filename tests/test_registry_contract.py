"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _R10_MODIFIED,
    _VERIFIED_R5,
    _VERIFIED_R6,
    _VERIFIED_R7,
    _VERIFIED_R8,
    _VERIFIED_R9,
    load_all,
    query,
)

_ALL_TIERS = (
    _R10_MODIFIED,
    _VERIFIED_R5,
    _VERIFIED_R6,
    _VERIFIED_R7,
    _VERIFIED_R8,
    _VERIFIED_R9,
)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_tiers_partition_the_round9_catalog():
    """The six tier sets are disjoint and cover exactly the 232 names
    that existed when CORRECTNESS_r09 was written; any name outside them
    is brand-new this round. (_R10_MODIFIED holds names re-tiered from
    their freshness tiers after round-10 kernel/oracle changes.)"""
    union = set()
    total = 0
    for tier in _ALL_TIERS:
        assert not (union & tier), sorted(union & tier)
        union |= tier
        total += len(tier)
    assert total == len(union) == 232
    assert union <= set(load_all())


def test_stalest_evidence_leads_the_window():
    """The driver verifies only the first ~50 catalog entries per round.
    Round-10 contract (VERDICT r9 ask #1): brand-new queries (no driver
    row) rank first, then the queries whose verification kernels or
    oracles changed in round 10 AFTER their last driver verification
    (standing rule: code-changed => next window), then the round-5-stale
    tier — the window-function family, the ANN builders, OHLCV/VWAP/
    as-of; r6/r7/r8/r9 greens sit below the fold in staleness order."""
    order = list(load_all())
    known = set().union(*_ALL_TIERS)
    new = [n for n in order if n not in known]
    n_new, n_mod, n_r5 = len(new), len(_R10_MODIFIED), len(_VERIFIED_R5)
    assert set(order[:n_new]) == set(new)
    assert set(order[n_new : n_new + n_mod]) == set(_R10_MODIFIED)
    assert set(order[n_new + n_mod : n_new + n_mod + n_r5]) == set(_VERIFIED_R5)
    assert set(order[n_new + n_mod + n_r5 :]) == (
        set(_VERIFIED_R6) | set(_VERIFIED_R7) | set(_VERIFIED_R8) | set(_VERIFIED_R9)
    )
    # staleness order below the fold: r6 < r7 < r8 < r9
    last_r6 = max(order.index(n) for n in _VERIFIED_R6)
    first_r7 = min(order.index(n) for n in _VERIFIED_R7)
    last_r7 = max(order.index(n) for n in _VERIFIED_R7)
    first_r8 = min(order.index(n) for n in _VERIFIED_R8)
    last_r8 = max(order.index(n) for n in _VERIFIED_R8)
    first_r9 = min(order.index(n) for n in _VERIFIED_R9)
    assert last_r6 < first_r7 < last_r7 < first_r8 < last_r8 < first_r9
    # the 50-slot window: every code-modified name must be inside it
    # (the standing rule outranks staleness), and every remaining slot
    # must go to the stale r5 tier — 2 new + 12 modified + 44 stale
    # overflow the window by eight, so the r5 tail refreshes next round
    # rather than a modified kernel going unverified
    window = set(order[:50])
    assert set(_R10_MODIFIED) <= window, sorted(set(_R10_MODIFIED) - window)
    assert window - set(new) - set(_R10_MODIFIED) <= set(_VERIFIED_R5), sorted(
        window - set(new) - set(_R10_MODIFIED) - set(_VERIFIED_R5)
    )
    # no freshly-verified (r8/r9) row may waste a window slot
    assert window & (set(_VERIFIED_R8) | set(_VERIFIED_R9)) == set(), sorted(
        window & (set(_VERIFIED_R8) | set(_VERIFIED_R9))
    )
    # the oversubscription spill must never hit a row VERDICT r9 ask #1
    # names (windows family, ANN builders, OHLCV/VWAP/as-of, rollup/
    # cube/stddev/percentiles/pivot, png_decode, tumbling/sliding,
    # sql_entry_revenue) — those rank first within the r5 tier
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
        _R5_NAMED_FIRST,
    )

    assert _R5_NAMED_FIRST <= window, sorted(_R5_NAMED_FIRST - window)


def test_brand_new_queries_sort_into_the_window():
    """A query in no tier (i.e. added after CORRECTNESS_r09) must rank
    ahead of every tiered row, including the code-modified tier."""
    order = list(load_all())
    known = set().union(*_ALL_TIERS)
    first_known = min(order.index(n) for n in known)
    for name in set(order) - known:
        assert order.index(name) < first_known, name


def test_duplicate_registration_rejected():
    load_all()
    with pytest.raises(ValueError, match="duplicate query name"):
        query("pricing_summary")(lambda spark, sf_dir: None)


def test_no_case_insensitive_name_collisions():
    """Names must stay distinct even case-folded — the driver's artifacts
    (JSON keys, filenames) may land on case-insensitive filesystems."""
    cat = load_all()
    lowered = [n.lower() for n in cat]
    assert len(lowered) == len(set(lowered))
