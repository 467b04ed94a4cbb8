"""One-pass bootstrap confidence intervals (SURVEY §2.4 A7 — the
uncertainty-quantification rung of the stats family).

At 100 TB nobody reruns a query B times to get error bars; the standard
trick is the ONLINE/Poisson bootstrap (Oza & Russell 2001; Chamandy et
al. 2012, "Estimating uncertainty for massive data streams" — the
Google formulation): resample b gives every row an independent
Poisson(1) weight, approximating multinomial resampling, so ALL B
resamples ride one scan as B weighted partial aggregations that
map-side-combine immediately.

Determinism contract: the Poisson weight is a pure function of
(event_id, b) — the first 15 hex chars of ``md5(event_id || ':' || b)``
compared against PRECOMPUTED hex thresholds of the Poisson(1) CDF
(same-length lowercase-hex string comparison IS the numeric comparison,
the ``dataset_split`` mechanism, so both engines make identical weight
decisions with zero float in the decision). Weighted sums ride the
×10^6 exact integer value lane; each resample mean is ONE IEEE divide
of exact integers; the CI bounds are order statistics of the B means
elected by ``sort_array``/ordered ``list`` — no percentile
interpolation, no float summation anywhere.

Weights are capped at {BOOT_WCAP}: P(X ≥ 7 | λ=1) ≈ 8·10⁻⁵ of rows get
weight 7 instead of their exact draw — a fixed, documented, engine-
identical approximation (the tail mass is folded into the last bucket).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

BOOT_B = 32
BOOT_WCAP = 7
_HEX_BITS = 60  # 15 hex chars


def _poisson1_hex_thresholds(cap: int = BOOT_WCAP) -> list[str]:
    """CDF(k) for Poisson(1), k = 0..cap-1, as 15-char lowercase hex of
    floor(CDF · 2^60) — the generator behind the PINNED ``_THRESH``
    literals below (kept for documentation and the equality test)."""
    out = []
    acc = 0.0
    term = math.exp(-1.0)
    for k in range(cap):
        acc += term
        out.append(format(int(acc * (1 << _HEX_BITS)), "015x"))
        term /= k + 1
    return out


#: PINNED literal thresholds (not recomputed at import): a platform
#: libm whose exp(-1) differs in the last ulp would shift a threshold
#: by one 2^-60 slot and flip ~1e-18 of weight decisions — pinning the
#: table makes the (row, b) → weight map a spec constant everywhere.
#: ``test_bootstrap_thresholds_match_generator`` keeps the two in sync.
_THRESH = [
    "5e2d58d8b3bce00", "bc5ab1b16779c00", "eb715e1dc158300",
    "fb23979734a2580", "ff1025f59174e00", "ffd90f3ba405600",
    "fffa8b71fc72c80",
]


def _weight_case_sql(u: str) -> str:
    """Shared CASE text mapping a 15-hex-char uniform to its Poisson(1)
    weight (strictly-below threshold k ⇒ weight k; else the cap)."""
    branches = " ".join(
        f"WHEN {u} < '{t}' THEN {k}" for k, t in enumerate(_THRESH)
    )
    return f"CASE {branches} ELSE {BOOT_WCAP} END"


_BOOT_ORACLE = f"""
    WITH w AS MATERIALIZED (
      SELECT event_type,
             CAST(CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS DECIMAL(12,0))
                  AS BIGINT) AS micros,
             b,
             {_weight_case_sql(
                 "substring(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 15)"
             )} AS wt
      FROM events, UNNEST(range({BOOT_B})) AS rb(b)
    ), res AS MATERIALIZED (
      SELECT event_type, b,
             CAST(SUM(wt) AS BIGINT) AS n_b,
             CAST(SUM(wt * micros) AS BIGINT) AS s_b
      FROM w GROUP BY event_type, b
    ), means AS (
      SELECT event_type, b,
             CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 1000000.0 AS mean_b
      FROM res WHERE n_b > 0
    ), point AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(30,6)) * 1000000
                  AS DECIMAL(12,0)) AS BIGINT)) AS BIGINT) AS total_micros
      FROM events GROUP BY event_type
    ), ci AS (
      SELECT event_type,
             list(mean_b ORDER BY mean_b) AS ms,
             CAST(COUNT(mean_b) AS BIGINT) AS n_res
      FROM means GROUP BY event_type
    )
    SELECT p.event_type, p.n_rows,
           CAST(p.total_micros AS DOUBLE) / p.n_rows / 1000000.0 AS mean_value,
           c.n_res,
           c.ms[2] AS ci_lo,
           c.ms[CAST(c.n_res AS INT) - 1] AS ci_hi
    FROM point p JOIN ci c ON p.event_type = c.event_type
    ORDER BY p.event_type
"""


@query("bootstrap_ci", oracle=_BOOT_ORACLE, tags=("A7",), prepared=True)
def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A7] Poisson-bootstrap confidence interval for mean(value) per
    event type, in ONE scan: {BOOT_B} deterministic hash-Poisson
    resamples, CI = the 2nd-smallest / 2nd-largest resample means (a
    ~93.75% percentile interval at B={BOOT_B} — fixed order statistics,
    no interpolation; module docstring carries the full determinism
    argument).

    Scale: the B-fold explode is a map-side row multiplier that the
    partial aggregation collapses immediately — the shuffle carries
    B × |groups| partial sums, not B × |rows|; the CI election is
    groups-sized. This is the error-bar recipe that needs no second
    pass over 100 TB."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    u = (
        "substring(md5(concat(CAST(event_id AS STRING), ':',"
        " CAST(b AS STRING))), 1, 15)"
    )
    w = (
        ev.select(
            "event_id",
            "event_type",
            F.expr(
                "CAST(CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS DECIMAL(12,0))"
                " AS BIGINT)"
            ).alias("micros"),
            F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        )
        .withColumn("wt", F.expr(_weight_case_sql(u)))
        .drop("event_id")
    )
    res = w.groupBy("event_type", "b").agg(
        F.sum("wt").cast("long").alias("n_b"),
        F.sum(F.col("wt") * F.col("micros")).cast("long").alias("s_b"),
    )
    means = res.select(
        "event_type",
        F.when(
            F.col("n_b") > 0,
            F.col("s_b").cast("double") / F.col("n_b").cast("double") / 1e6,
        ).alias("mean_b"),
    ).filter(F.col("mean_b").isNotNull())
    ci = means.groupBy("event_type").agg(
        F.sort_array(F.collect_list("mean_b")).alias("ms"),
        F.count("mean_b").cast("long").alias("n_res"),
    )
    point = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.expr(
                "CAST(CAST(CAST(value AS DECIMAL(30,6)) * 1000000"
                " AS DECIMAL(12,0)) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("total_micros"),
    )
    return (
        point.join(ci, "event_type")
        .select(
            "event_type",
            "n_rows",
            (
                F.col("total_micros").cast("double") / F.col("n_rows") / 1e6
            ).alias("mean_value"),
            "n_res",
            F.element_at("ms", 2).alias("ci_lo"),
            F.element_at("ms", (F.col("n_res") - 1).cast("int")).alias("ci_hi"),
        )
        .orderBy("event_type")
    )
