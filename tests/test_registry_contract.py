"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _R17_MODIFIED,
    _VERIFIED_R10,
    _VERIFIED_R11,
    _VERIFIED_R12,
    _VERIFIED_R13,
    _VERIFIED_R14,
    _VERIFIED_R15,
    _VERIFIED_R16,
    load_all,
    query,
)

_ALL_TIERS = (
    _R17_MODIFIED,
    _VERIFIED_R10,
    _VERIFIED_R11,
    _VERIFIED_R12,
    _VERIFIED_R13,
    _VERIFIED_R14,
    _VERIFIED_R15,
    _VERIFIED_R16,
)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_tiers_partition_the_round16_catalog():
    """The tier sets are disjoint and cover exactly the 287 names that
    existed when CORRECTNESS_r16 was written (the full catalog — no
    brand-new queries in an optimization round). (_R17_MODIFIED holds
    names re-tiered from their freshness tiers after round-17 kernel/
    registration changes — they overlap no freshness tier because the
    rotation subtracts them.)"""
    union = set()
    total = 0
    for tier in _ALL_TIERS:
        assert not (union & tier), sorted(union & tier)
        union |= tier
        total += len(tier)
    assert total == len(union) == 287
    assert union == set(load_all())


def test_stalest_evidence_leads_the_window():
    """The driver verifies only the first ~50 catalog entries per round.
    Round-17 contract: brand-new queries (none this round) rank first,
    then the 19 queries whose kernels or execution-affecting
    registration changed in round 17 AFTER their last driver
    verification (standing rule: code-changed => next window), then the
    2 r10-displaced rows, then the oldest r11 rows until the window
    fills; r12..r16 greens sit below in staleness order."""
    order = list(load_all())
    known = set().union(*_ALL_TIERS)
    new = [n for n in order if n not in known]
    n_new, n_mod, n_r10 = len(new), len(_R17_MODIFIED), len(_VERIFIED_R10)
    assert set(order[:n_new]) == set(new)
    assert set(order[n_new : n_new + n_mod]) == set(_R17_MODIFIED)
    assert set(order[n_new + n_mod : n_new + n_mod + n_r10]) == set(_VERIFIED_R10)
    # staleness order below the fold: r10 < r11 < ... < r16
    seq = (_VERIFIED_R10, _VERIFIED_R11, _VERIFIED_R12, _VERIFIED_R13,
           _VERIFIED_R14, _VERIFIED_R15, _VERIFIED_R16)
    for older, newer in zip(seq, seq[1:]):
        assert max(order.index(n) for n in older) < min(
            order.index(n) for n in newer
        )
    # the 50-slot window: every brand-new and code-modified name must be
    # inside it (the standing rule outranks staleness); remaining slots
    # go to the r10 displaced rows then the oldest r11 rows
    window = set(order[:50])
    assert set(new) <= window, sorted(set(new) - window)
    assert set(_R17_MODIFIED) <= window, sorted(set(_R17_MODIFIED) - window)
    rest = window - set(new) - set(_R17_MODIFIED)
    assert rest <= set(_VERIFIED_R10) | set(_VERIFIED_R11), sorted(
        rest - set(_VERIFIED_R10) - set(_VERIFIED_R11)
    )
    if set(_VERIFIED_R10) - window:
        assert rest <= set(_VERIFIED_R10), sorted(rest - set(_VERIFIED_R10))
    # no freshly-verified (r15/r16) row may waste a window slot
    assert window & (set(_VERIFIED_R15) | set(_VERIFIED_R16)) == set(), sorted(
        window & (set(_VERIFIED_R15) | set(_VERIFIED_R16))
    )


def test_brand_new_queries_sort_into_the_window():
    """A query in no tier (i.e. added after CORRECTNESS_r16) must rank
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
