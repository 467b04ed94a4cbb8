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
