"""Kaplan-Meier survival estimation over the event stream (SURVEY §2.4
A7 / §2.10 U6 — the censoring-aware duration statistic).

Product and risk teams ask "how long until conversion/churn?" on data
where many subjects haven't converted YET — truncating them (like a
plain AVG of observed durations) biases the answer optimistic, and
dropping them biases it pessimistic. The Kaplan-Meier estimator
(Kaplan & Meier 1958, the standard tool in every survival library:
lifelines, scikit-survival, R ``survival``) handles right-censoring
exactly: at each discrete step ``t`` with ``n_t`` subjects still at
risk and ``d_t`` events, the survival curve multiplies by
``(n_t - d_t) / n_t``; censored subjects leave the risk set after
their censor step without contributing an event.

Determinism contract: ``n_t``/``d_t``/``c_t`` are exact integer counts
(bucketed by integral microsecond division), each per-step ratio is one
IEEE divide of two exactly-represented integers, and the survival curve
is a LEFT FOLD product over the steps in ascending order — Spark runs
``F.aggregate`` over a frame-ordered ``collect_list`` and DuckDB runs
``list_product`` over a frame-ordered ``list``, both multiplying the
same doubles in the same order, so the curve is bit-identical with no
``exp(sum(ln))`` rounding and no snap.

Subjects here: each ``signup`` event, with the duration to that user's
first ``purchase`` strictly later in the per-user (ts, event_id) total
order; subjects whose next purchase never arrives before the corpus
cutoff (the global max timestamp) are right-censored at the cutoff —
the signups near the end of the window supply genuine censoring mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

#: daily buckets, horizon of 8 steps (0..7): the fixture's signup→next-
#: purchase gaps median under a day with a tail past a week, so every
#: step carries mass and the horizon exercises the "still at risk at the
#: end" path (subjects with T ≥ KM_HORIZON stay in every risk set).
KM_HORIZON = 8
_US_PER_DAY = 86_400_000_000


_KM_ORACLE = f"""
    WITH nxt AS (
      SELECT event_type, ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
      FROM events
    ), cutoff AS (
      SELECT MAX(ts) AS mx FROM events
    ), subj AS MATERIALIZED (
      SELECT CASE WHEN np IS NOT NULL
                  THEN (epoch_us(np) - epoch_us(ts)) // {_US_PER_DAY}
                  ELSE (epoch_us(mx) - epoch_us(ts)) // {_US_PER_DAY} END AS tb,
             CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END AS died
      FROM nxt CROSS JOIN cutoff WHERE event_type = 'signup'
    ), n_total AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subj
    ), per_bucket AS (
      SELECT tb, CAST(SUM(died) AS BIGINT) AS d,
             CAST(SUM(1 - died) AS BIGINT) AS c
      FROM subj WHERE tb < {KM_HORIZON} GROUP BY tb
    ), spine AS (
      SELECT UNNEST(range({KM_HORIZON})) AS step
    ), steps AS (
      SELECT s.step, COALESCE(p.d, 0) AS n_death, COALESCE(p.c, 0) AS n_censor,
             nt.n - COALESCE(SUM(COALESCE(p.d, 0) + COALESCE(p.c, 0)) OVER (
               ORDER BY s.step ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_risk
      FROM spine s CROSS JOIN n_total nt
      LEFT JOIN per_bucket p ON s.step = p.tb
    ), ratios AS (
      SELECT step, n_risk, n_death, n_censor,
             CASE WHEN n_risk > 0
                  THEN CAST(n_risk - n_death AS DOUBLE) / CAST(n_risk AS DOUBLE)
                  ELSE 1.0 END AS r
      FROM steps
    )
    SELECT CAST(step AS BIGINT) AS step,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_death AS BIGINT) AS n_death,
           CAST(n_censor AS BIGINT) AS n_censor,
           list_product(list(r) OVER (
             ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) AS survival
    FROM ratios ORDER BY step
"""


@query("km_survival", oracle=_KM_ORACLE, tags=("A7", "U6"), prepared=False)
def km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A7] Kaplan-Meier time-to-conversion curve with right-censoring —
    per signup event, days until the user's next purchase (strictly
    later in (ts, event_id) order), censored at the corpus cutoff for
    signups whose purchase never arrives in-window. Output: one row per
    daily step with the at-risk/death/censor counts and the KM survival
    estimate (module docstring carries the exactness argument).

    Scale: ONE shuffle of the event stream on user_id for the
    next-purchase window pass (the ``conversion_funnel`` shape — at
    100 TB the stream is already bucketed by user for every per-user
    operator); everything after is bucket-cardinality (≤ horizon rows).
    The final 8-row fold is a single-partition window by construction —
    the curve itself is as small as a GROUP BY result, never data-sized.
    ``prepared=False``: the subject pass aggregates to a 1-row broadcast
    (cutoff) before the plan closes."""
    return km_curve(spark, load_table(spark, sf_dir, "events"))


def km_curve(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """The KM kernel on an arbitrary events frame (columns ts, event_id,
    user_id, event_type) — split out so crafted-input tests drive the
    exact code the registered query runs."""
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.select(
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w_next).alias("np"),
    )
    cutoff = F.broadcast(ev.agg(F.max("ts").alias("mx")))
    subj = (
        nxt.filter(F.col("event_type") == "signup")
        .crossJoin(cutoff)
        .select(
            # integral `div`, never double `/`: a float quotient landing
            # exactly on an integer after correct rounding would truncate
            # one bucket high vs the oracle's exact floor division
            F.expr(
                "CASE WHEN np IS NOT NULL"
                f" THEN (unix_micros(np) - unix_micros(ts)) div {_US_PER_DAY}"
                f" ELSE (unix_micros(mx) - unix_micros(ts)) div {_US_PER_DAY} END"
            ).alias("tb"),
            F.when(F.col("np").isNotNull(), 1).otherwise(0).alias("died"),
        )
    )
    n_total = F.broadcast(subj.agg(F.count(F.lit(1)).cast("long").alias("n")))
    per_bucket = (
        subj.filter(F.col("tb") < KM_HORIZON)
        .groupBy("tb")
        .agg(
            F.sum("died").cast("long").alias("d"),
            F.sum(1 - F.col("died")).cast("long").alias("c"),
        )
    )
    spine = spark.range(KM_HORIZON).select(F.col("id").alias("step"))
    w_prev = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, -1)
    w_curr = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    steps = (
        spine.join(per_bucket, spine["step"] == per_bucket["tb"], "left")
        .crossJoin(n_total)
        .select(
            "step",
            F.coalesce(F.col("d"), F.lit(0).cast("long")).alias("n_death"),
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("n_censor"),
            "n",
        )
        .withColumn(
            "n_risk",
            F.col("n")
            - F.coalesce(
                F.sum(F.col("n_death") + F.col("n_censor")).over(w_prev),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "r",
            F.when(
                F.col("n_risk") > 0,
                (F.col("n_risk") - F.col("n_death")).cast("double")
                / F.col("n_risk").cast("double"),
            ).otherwise(F.lit(1.0)),
        )
    )
    return (
        steps.withColumn(
            "survival",
            F.aggregate(
                F.collect_list("r").over(w_curr),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ),
        )
        .select("step", "n_risk", "n_death", "n_censor", "survival")
        .orderBy("step")
    )
