"""Skew handling (SURVEY §4 spill/skew; §7.7 hot-symbol posture).

AQE's skew-join splitting handles join-side skew automatically (enabled in
session.py). For AGGREGATION skew — one hot key (the AAPL effect)
overwhelming a single reducer — this module provides the two-stage salted
aggregation rewrite: partial-aggregate on (key, salt), then combine per
key. Decomposable aggregates only (sum/count/min/max — avg as sum+count).

At 100 TB: the hot key's rows spread over ``n_salts`` reducers in stage 1;
stage 2 combines ``n_salts`` rows per key — skew cost drops by ~n_salts
at the price of one extra (tiny) shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: combine functions for the second stage, keyed by first-stage agg kind
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name → (kind, column) with kind in
    sum/count/min/max, e.g. ``{"total_vol": ("sum", col("volume"))}``.
    Result equals the direct ``groupBy(keys).agg(...)`` (asserted in
    tests) for any salt count.
    """
    unknown = {k for k, (kind, _) in aggs.items() if kind not in _COMBINE}
    if unknown:
        raise ValueError(f"non-decomposable aggs: {unknown}; supported: {set(_COMBINE)}")

    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()), F.lit(n_salts))
    stage1_aggs = []
    for name, (kind, col) in aggs.items():
        fn = F.sum if kind == "sum" else F.count if kind == "count" else _COMBINE[kind]
        stage1_aggs.append(fn(col).alias(name))
    stage1 = (
        df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_aggs)
    )
    stage2_aggs = [
        _COMBINE[kind](F.col(name)).alias(name) for name, (kind, _) in aggs.items()
    ]
    return stage1.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join by salt replication — the join-side
    twin of :func:`salted_agg`, for when the dim is too large to
    broadcast and one hot fact key would otherwise pin a single reducer.

    Fact rows get a per-row salt in [0, n_salts): a hash over the WHOLE
    row's columns, never ``spark_partition_id()`` — a partition-id salt
    is recomputed differently when a stage retry reshuffles input order
    (SPARK-23207 class), which on a real cluster can duplicate or lose
    join rows against partially-fetched shuffle output. A row-content
    hash is retry-stable; the cost is that fully-identical hot rows land
    on one salt (weaker spread), which only matters for a key that is
    hot through exact duplicate rows — rare, and still correct. The dim
    is replicated ``n_salts``× with an exploded salt column; the join
    runs on (key, salt). Result is row-identical to the unsalted join
    (asserted in tests) at the price of shuffling ``n_salts``× the dim —
    the right trade precisely when dim ≪ fact and the fact is skewed.

    AQE's ``skewJoin`` does this automatically from runtime stats
    (enabled in session.py); this explicit form exists for plans AQE
    can't rewrite (e.g. under ``mapInPandas`` barriers) and as the
    pinned, testable shape of the technique.
    """
    if key not in fact.columns or key not in dim.columns:
        raise ValueError(f"join key {key!r} must exist on both sides")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full-outer would emit each unmatched dim row once PER
        # REPLICA (n_salts copies) — silently wrong; refuse.
        raise ValueError(f"salted_join supports inner/left-side joins, not {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    salted_fact = fact.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")
