"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _R16_MODIFIED,
    _VERIFIED_R10,
    _VERIFIED_R11,
    _VERIFIED_R12,
    _VERIFIED_R13,
    _VERIFIED_R14,
    _VERIFIED_R15,
    load_all,
    query,
)

_ALL_TIERS = (
    _R16_MODIFIED,
    _VERIFIED_R10,
    _VERIFIED_R11,
    _VERIFIED_R12,
    _VERIFIED_R13,
    _VERIFIED_R14,
    _VERIFIED_R15,
)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_tiers_partition_the_round15_catalog():
    """The tier sets are disjoint and cover exactly the 279 names that
    existed when CORRECTNESS_r15 was written; any name outside them is
    brand-new this round. (_R16_MODIFIED holds names re-tiered from
    their freshness tiers after round-16 kernel/registration changes —
    they overlap no freshness tier because rotate_verified moves them
    out.)"""
    union = set()
    total = 0
    for tier in _ALL_TIERS:
        assert not (union & tier), sorted(union & tier)
        union |= tier
        total += len(tier)
    assert total == len(union) == 279
    assert union <= set(load_all())


def test_stalest_evidence_leads_the_window():
    """The driver verifies only the first ~50 catalog entries per round.
    Round-16 contract (VERDICT r15 ask #1): brand-new queries (no driver
    row) rank first, then the queries whose kernels or execution-affecting
    registration changed in round 16 AFTER their last driver verification
    (standing rule: code-changed => next window), then the 38 r10-stale
    rows (retiring the r10 tier — oldest evidence becomes r11); r11..r15
    greens sit below in staleness order, so the window's remaining slots
    refresh the oldest r11 rows."""
    order = list(load_all())
    known = set().union(*_ALL_TIERS)
    new = [n for n in order if n not in known]
    n_new, n_mod, n_r10 = len(new), len(_R16_MODIFIED), len(_VERIFIED_R10)
    assert set(order[:n_new]) == set(new)
    assert set(order[n_new : n_new + n_mod]) == set(_R16_MODIFIED)
    assert set(order[n_new + n_mod : n_new + n_mod + n_r10]) == set(_VERIFIED_R10)
    # staleness order below the fold: r10 < r11 < r12 < r13 < r14 < r15
    last_r10 = max(order.index(n) for n in _VERIFIED_R10)
    first_r11 = min(order.index(n) for n in _VERIFIED_R11)
    last_r11 = max(order.index(n) for n in _VERIFIED_R11)
    first_r12 = min(order.index(n) for n in _VERIFIED_R12)
    last_r12 = max(order.index(n) for n in _VERIFIED_R12)
    first_r13 = min(order.index(n) for n in _VERIFIED_R13)
    last_r13 = max(order.index(n) for n in _VERIFIED_R13)
    first_r14 = min(order.index(n) for n in _VERIFIED_R14)
    last_r14 = max(order.index(n) for n in _VERIFIED_R14)
    first_r15 = min(order.index(n) for n in _VERIFIED_R15)
    assert last_r10 < first_r11 < last_r11 < first_r12
    assert last_r12 < first_r13 < last_r13 < first_r14
    assert last_r14 < first_r15
    # the 50-slot window: every brand-new and code-modified name must be
    # inside it (the standing rule outranks staleness — round-16
    # optimization moved 16 touched kernels into _R16_MODIFIED, so the
    # window now holds 8 new + 16 modified + as many r10-stale rows as
    # fit, in registration order; any displaced r10 rows stay at the
    # head of the below-the-fold staleness order for the next round)
    window = set(order[:50])
    assert set(new) <= window, sorted(set(new) - window)
    assert set(_R16_MODIFIED) <= window, sorted(set(_R16_MODIFIED) - window)
    # remaining slots go to r10 rows (oldest evidence) and only then r11
    rest = window - set(new) - set(_R16_MODIFIED)
    assert rest <= set(_VERIFIED_R10) | set(_VERIFIED_R11), sorted(
        rest - set(_VERIFIED_R10) - set(_VERIFIED_R11)
    )
    if set(_VERIFIED_R10) - window:
        # r10 rows were displaced: then NO r11 row may hold a slot
        assert rest <= set(_VERIFIED_R10), sorted(rest - set(_VERIFIED_R10))
    # no freshly-verified (r14/r15) row may waste a window slot
    assert window & (set(_VERIFIED_R14) | set(_VERIFIED_R15)) == set(), sorted(
        window & (set(_VERIFIED_R14) | set(_VERIFIED_R15))
    )


def test_brand_new_queries_sort_into_the_window():
    """A query in no tier (i.e. added after CORRECTNESS_r15) must rank
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
