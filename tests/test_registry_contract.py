"""Catalog-level contract the driver depends on.

The driver sweeps ``queries()`` in dict order and historically records
only the first ~50 rows — so ordering and oracle coverage are
load-bearing, not cosmetic.
"""

from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _VERIFY_NEXT,
    load_all,
)


def test_every_query_has_an_oracle():
    cat = load_all()
    missing = [n for n, s in cat.items() if s.oracle is None]
    assert missing == [], f"rows-only queries reappeared: {missing}"


def test_bench_specs_are_oracle_checked():
    cat = load_all()
    assert all(s.oracle is not None for s in cat.values() if s.bench)


def test_never_verified_queries_rank_before_round1_green():
    """New/never-driver-verified queries must sit inside the driver's
    verification window (ahead of everything already hash-green in
    round 1)."""
    order = list(load_all())
    # round-2 additions registered via _VERIFY_NEXT head
    assert order.index("word_entropy") < 50
    assert order.index("boilerplate_ngrams") < 50
    # a known round-1 driver-green query ranks below the priority tiers
    prioritized = set(_VERIFY_NEXT)
    assert "pricing_summary" not in prioritized
    assert order.index("pricing_summary") > order.index("word_entropy")


def test_no_duplicate_output_names():
    cat = load_all()
    assert len(cat) == len({n for n in cat})
