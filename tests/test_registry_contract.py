"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _R8_MODIFIED,
    _R9_MODIFIED,
    _STALE_R4,
    _VERIFIED_R5,
    _VERIFIED_R6,
    _VERIFIED_R7,
    _VERIFIED_R8,
    load_all,
    query,
)

_ALL_TIERS = (
    _R8_MODIFIED,
    _R9_MODIFIED,
    _STALE_R4,
    _VERIFIED_R5,
    _VERIFIED_R6,
    _VERIFIED_R7,
    _VERIFIED_R8,
)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_tiers_partition_the_round8_catalog():
    """The seven tier sets are disjoint and cover exactly the 225 names
    that existed when CORRECTNESS_r08 was written; any name outside them
    is brand-new this round. (_R9_MODIFIED holds names re-tiered from
    their freshness tiers after round-9 kernel/oracle changes.)"""
    union = set()
    total = 0
    for tier in _ALL_TIERS:
        assert not (union & tier), sorted(union & tier)
        union |= tier
        total += len(tier)
    assert total == len(union) == 225
    assert union <= set(load_all())


def test_stalest_evidence_leads_the_window():
    """The driver verifies only the first ~50 catalog entries per round.
    Round-9 contract (VERDICT r8 ask #1): brand-new queries (no driver
    row) rank first, then the five queries whose verification kernels
    were rewritten in round 8 AFTER their last driver verification
    (standing rule: code-changed => next window), then round-4-stale
    evidence; r5/r6/r7/r8 greens sit below the fold in staleness order."""
    order = list(load_all())
    known = set().union(*_ALL_TIERS)
    new = [n for n in order if n not in known]
    n_new, n1, n1b, n2 = (
        len(new), len(_R8_MODIFIED), len(_R9_MODIFIED), len(_STALE_R4)
    )
    assert set(order[:n_new]) == set(new)
    assert set(order[n_new : n_new + n1]) == set(_R8_MODIFIED)
    assert set(order[n_new + n1 : n_new + n1 + n1b]) == set(_R9_MODIFIED)
    assert set(order[n_new + n1 + n1b : n_new + n1 + n1b + n2]) == set(_STALE_R4)
    assert set(order[n_new + n1 + n1b + n2 :]) == (
        set(_VERIFIED_R5) | set(_VERIFIED_R6) | set(_VERIFIED_R7) | set(_VERIFIED_R8)
    )
    # staleness order below the fold: r5 < r6 < r7 < r8
    last_r5 = max(order.index(n) for n in _VERIFIED_R5)
    first_r6 = min(order.index(n) for n in _VERIFIED_R6)
    last_r6 = max(order.index(n) for n in _VERIFIED_R6)
    first_r7 = min(order.index(n) for n in _VERIFIED_R7)
    last_r7 = max(order.index(n) for n in _VERIFIED_R7)
    first_r8 = min(order.index(n) for n in _VERIFIED_R8)
    assert last_r5 < first_r6 < last_r6 < first_r7 < last_r7 < first_r8
    # the 50-slot window: every code-modified name must be inside it,
    # and the window arithmetic must hold (new + 5 modified + 27 stale
    # must fit)
    window = set(order[:50])
    assert set(_R8_MODIFIED) <= window, sorted(set(_R8_MODIFIED) - window)
    assert set(_R9_MODIFIED) <= window, sorted(set(_R9_MODIFIED) - window)
    assert n_new + n1 + n1b + n2 <= 50, (n_new, n1, n1b, n2)
    # no freshly-verified (r7/r8) row may waste a window slot
    assert window & (set(_VERIFIED_R7) | set(_VERIFIED_R8)) == set(), sorted(
        window & (set(_VERIFIED_R7) | set(_VERIFIED_R8))
    )


def test_brand_new_queries_sort_into_the_window():
    """A query in no tier (i.e. added after CORRECTNESS_r08) must rank
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
