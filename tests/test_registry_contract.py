"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _NEVER_VERIFIED,
    _STALE_R4,
    _VERIFIED_R5,
    _VERIFIED_R6,
    _VERIFIED_R7,
    load_all,
    query,
)

_ALL_TIERS = (_NEVER_VERIFIED, _STALE_R4, _VERIFIED_R5, _VERIFIED_R6, _VERIFIED_R7)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_tiers_partition_the_round7_catalog():
    """The five tier sets are disjoint and cover exactly the 215 names
    that existed when CORRECTNESS_r07 was written; any name outside them
    is brand-new this round."""
    union = set()
    total = 0
    for tier in _ALL_TIERS:
        assert not (union & tier), sorted(union & tier)
        union |= tier
        total += len(tier)
    assert total == len(union) == 215
    assert union <= set(load_all())


def test_stalest_evidence_leads_the_window():
    """The driver verifies only the first ~50 catalog entries per round.
    Round-8 contract (VERDICT r7 ask #1): brand-new queries (no driver
    row) rank first, then the 17 never-driver-verified round-7 overflow
    names, then round-4-stale evidence; r5/r6/r7 greens sit below the
    fold in staleness order."""
    order = list(load_all())
    known = set().union(*_ALL_TIERS)
    new = [n for n in order if n not in known]
    n_new, n1, n2 = len(new), len(_NEVER_VERIFIED), len(_STALE_R4)
    assert set(order[:n_new]) == set(new)
    assert set(order[n_new : n_new + n1]) == set(_NEVER_VERIFIED)
    assert set(order[n_new + n1 : n_new + n1 + n2]) == set(_STALE_R4)
    assert set(order[n_new + n1 + n2 :]) == (
        set(_VERIFIED_R5) | set(_VERIFIED_R6) | set(_VERIFIED_R7)
    )
    # r5 greens (stalest of the verified) ahead of r6, r6 ahead of r7
    last_r5 = max(order.index(n) for n in _VERIFIED_R5)
    first_r6 = min(order.index(n) for n in _VERIFIED_R6)
    last_r6 = max(order.index(n) for n in _VERIFIED_R6)
    first_r7 = min(order.index(n) for n in _VERIFIED_R7)
    assert last_r5 < first_r6 < last_r6 < first_r7
    # the 50-slot window: every never-verified name must be inside it
    # (they cannot be evicted by any plausible number of new queries —
    # guard the arithmetic: new + 17 must fit)
    window = set(order[:50])
    assert set(_NEVER_VERIFIED) <= window, sorted(set(_NEVER_VERIFIED) - window)
    assert n_new + n1 <= 50, (n_new, n1)
    # no freshly-verified (r6/r7) row may waste a window slot
    assert window & (set(_VERIFIED_R6) | set(_VERIFIED_R7)) == set(), sorted(
        window & (set(_VERIFIED_R6) | set(_VERIFIED_R7))
    )


def test_brand_new_queries_sort_into_the_window():
    """A query in no tier (i.e. added after CORRECTNESS_r07) must rank
    ahead of every tiered row, including the never-verified overflow."""
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
