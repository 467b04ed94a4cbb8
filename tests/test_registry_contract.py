"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _VERIFIED_R1,
    _VERIFIED_R2,
    _VERIFY_NEXT,
    load_all,
    query,
)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_never_hash_green_queries_lead_the_window():
    """The driver verifies only the first ~50 catalog entries per round.
    Round-3 contract: the 9 queries with no hash-green row in either
    CORRECTNESS file rank 0-8; the rest of the window is round-1 evidence
    (stalest); round-2-green rows sit below the fold."""
    order = list(load_all())
    assert order[: len(_VERIFY_NEXT)] == list(_VERIFY_NEXT)
    window = set(order[:50])
    # the window after tier 0 holds only round-1-verified (or brand-new)
    # names — never round-2-green rows, whose evidence is freshest
    r2_in_window = window & _VERIFIED_R2
    assert r2_in_window == set(), sorted(r2_in_window)
    # tier sets must partition cleanly: a name in _VERIFY_NEXT claims to
    # lack a hash-green row, so it may not also claim round-2 evidence
    assert set(_VERIFY_NEXT) & _VERIFIED_R2 == set()
    assert set(_VERIFY_NEXT) & _VERIFIED_R1 == set()


def test_brand_new_queries_sort_into_the_window():
    """A query in neither verified set nor _VERIFY_NEXT (i.e. added after
    the last driver round) must rank ahead of all verified rows."""
    order = list(load_all())
    known = set(_VERIFY_NEXT) | _VERIFIED_R1 | _VERIFIED_R2
    first_verified_r2 = min(order.index(n) for n in _VERIFIED_R2)
    for name in set(order) - known:
        assert order.index(name) < first_verified_r2, name


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
