"""Two-group log-rank survival comparison (SURVEY §2.4 A7 — the
companion statistic to ``km_survival``; Mantel 1966 / Peto 1972, the
standard test in every survival library).

Groups: the deterministic 50/50 md5-hash split of ``user_id`` (the
``ab_test_readout`` mechanism) — an A/A comparison by construction, so
the statistic doubles as a fairness check on the hash split itself
(|z| should sit well inside ±2; a systematic split bias would show up
here before any real experiment trusted it). Subjects/durations/censor
rules are exactly ``km_survival``'s (signup → next purchase, corpus
cutoff).

Per step t the log-rank terms on the 2×2 hypergeometric table are
``e_t = n_at·d_t/n_t`` (expected group-A deaths) and
``v_t = n_at·n_bt·d_t·(n_t−d_t) / (n_t²·(n_t−1))``; the statistic is
``z = Σ(d_at − e_t) / sqrt(Σ v_t)``, emitted cumulatively per step —
the group-sequential monitoring view.

Determinism contract: all counts are exact integers; each e/v term is
built by multiplying the EXACT integer factors in one fixed
parenthesized order as doubles and finishing with one divide — IEEE
operations, so both engines produce bit-identical terms even past the
2^53 exact range (deterministic ≠ exact; the rounding is identical);
the cumulative sums are LEFT FOLDS over step-ordered lists (Spark
``F.aggregate`` ≡ DuckDB ``list_reduce``), and sqrt is IEEE
correctly-rounded in both engines. No order-sensitive double SUM
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .survival import KM_HORIZON, _US_PER_DAY

_LOGRANK_ORACLE = f"""
    WITH nxt AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
      FROM events
    ), cutoff AS (
      SELECT MAX(ts) AS mx FROM events
    ), subj AS MATERIALIZED (
      SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS grp_a,
             CASE WHEN np IS NOT NULL
                  THEN (epoch_us(np) - epoch_us(ts)) // {_US_PER_DAY}
                  ELSE (epoch_us(mx) - epoch_us(ts)) // {_US_PER_DAY} END AS tb,
             CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END AS died
      FROM nxt CROSS JOIN cutoff WHERE event_type = 'signup'
    ), tot AS (
      SELECT CAST(SUM(grp_a) AS BIGINT) AS na0,
             CAST(SUM(1 - grp_a) AS BIGINT) AS nb0
      FROM subj
    ), per_bucket AS (
      SELECT tb,
             CAST(SUM(grp_a * died) AS BIGINT) AS da,
             CAST(SUM((1 - grp_a) * died) AS BIGINT) AS db,
             CAST(SUM(grp_a * (1 - died)) AS BIGINT) AS ca,
             CAST(SUM((1 - grp_a) * (1 - died)) AS BIGINT) AS cb
      FROM subj WHERE tb < {KM_HORIZON} GROUP BY tb
    ), spine AS (
      SELECT UNNEST(range({KM_HORIZON})) AS step
    ), steps AS (
      SELECT s.step,
             COALESCE(p.da, 0) AS d_a, COALESCE(p.db, 0) AS d_b,
             t.na0 - COALESCE(SUM(COALESCE(p.da, 0) + COALESCE(p.ca, 0)) OVER (
               ORDER BY s.step ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_a,
             t.nb0 - COALESCE(SUM(COALESCE(p.db, 0) + COALESCE(p.cb, 0)) OVER (
               ORDER BY s.step ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS n_b
      FROM spine s CROSS JOIN tot t
      LEFT JOIN per_bucket p ON s.step = p.tb
    ), terms AS (
      SELECT step, n_a, d_a, n_b, d_b,
             CASE WHEN n_a + n_b > 0
                  THEN (CAST(n_a AS DOUBLE) * CAST(d_a + d_b AS DOUBLE))
                       / CAST(n_a + n_b AS DOUBLE)
                  ELSE 0.0 END AS e_t,
             CASE WHEN n_a + n_b > 1
                  THEN (((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                         * CAST(d_a + d_b AS DOUBLE))
                        * CAST(n_a + n_b - d_a - d_b AS DOUBLE))
                       / ((CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE))
                          * CAST(n_a + n_b - 1 AS DOUBLE))
                  ELSE 0.0 END AS v_t
      FROM steps
    )
    SELECT CAST(step AS BIGINT) AS step,
           CAST(n_a AS BIGINT) AS n_a, CAST(d_a AS BIGINT) AS d_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(d_b AS BIGINT) AS d_b,
           list_reduce(list(CAST(d_a AS DOUBLE) - e_t) OVER w,
                       (acc, x) -> acc + x) AS cum_oe,
           list_reduce(list(v_t) OVER w,
                       (acc, x) -> acc + x) AS cum_v,
           CASE WHEN list_reduce(list(v_t) OVER w,
                                 (acc, x) -> acc + x) > 0
                THEN list_reduce(list(CAST(d_a AS DOUBLE) - e_t)
                                 OVER w, (acc, x) -> acc + x)
                   / sqrt(list_reduce(list(v_t) OVER w,
                                      (acc, x) -> acc + x))
                ELSE NULL END AS z
    FROM terms
    WINDOW w AS (ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY step
"""


@query("km_logrank", oracle=_LOGRANK_ORACLE, tags=("A7",), prepared=False)
def km_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A7] Group-sequential log-rank comparison of two KM curves under
    the deterministic md5 50/50 user split (module docstring: model,
    A/A framing, and the IEEE determinism argument). One row per daily
    step with both groups' risk/death counts and the cumulative
    O−E / V / z statistic through that step.

    Scale: identical posture to ``km_survival`` — one user-bucketed
    shuffle for the next-purchase window pass, then everything is
    bucket-cardinality; the fold windows run on ≤ {KM_HORIZON} rows."""
    ev = load_table(spark, sf_dir, "events")
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w_next)
        .alias("np"),
    )
    cutoff = F.broadcast(ev.agg(F.max("ts").alias("mx")))
    subj = (
        nxt.filter(F.col("event_type") == "signup")
        .crossJoin(cutoff)
        .select(
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", 1
            )
            .otherwise(0)
            .alias("grp_a"),
            F.expr(
                "CASE WHEN np IS NOT NULL"
                f" THEN (unix_micros(np) - unix_micros(ts)) div {_US_PER_DAY}"
                f" ELSE (unix_micros(mx) - unix_micros(ts)) div {_US_PER_DAY} END"
            ).alias("tb"),
            F.when(F.col("np").isNotNull(), 1).otherwise(0).alias("died"),
        )
    )
    tot = F.broadcast(
        subj.agg(
            F.sum("grp_a").cast("long").alias("na0"),
            F.sum(1 - F.col("grp_a")).cast("long").alias("nb0"),
        )
    )
    per_bucket = (
        subj.filter(F.col("tb") < KM_HORIZON)
        .groupBy("tb")
        .agg(
            F.sum(F.col("grp_a") * F.col("died")).cast("long").alias("da"),
            F.sum((1 - F.col("grp_a")) * F.col("died")).cast("long").alias("db"),
            F.sum(F.col("grp_a") * (1 - F.col("died"))).cast("long").alias("ca"),
            F.sum((1 - F.col("grp_a")) * (1 - F.col("died"))).cast("long").alias("cb"),
        )
    )
    spine = spark.range(KM_HORIZON).select(F.col("id").alias("step"))
    w_prev = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, -1)
    w_curr = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    z = F.lit(0).cast("long")
    steps = (
        spine.join(per_bucket, spine["step"] == per_bucket["tb"], "left")
        .crossJoin(tot)
        .select(
            "step",
            F.coalesce(F.col("da"), z).alias("d_a"),
            F.coalesce(F.col("db"), z).alias("d_b"),
            (
                F.col("na0")
                - F.coalesce(
                    F.sum(
                        F.coalesce(F.col("da"), z) + F.coalesce(F.col("ca"), z)
                    ).over(w_prev),
                    z,
                )
            ).alias("n_a"),
            (
                F.col("nb0")
                - F.coalesce(
                    F.sum(
                        F.coalesce(F.col("db"), z) + F.coalesce(F.col("cb"), z)
                    ).over(w_prev),
                    z,
                )
            ).alias("n_b"),
        )
    )
    n = F.col("n_a") + F.col("n_b")
    d = F.col("d_a") + F.col("d_b")
    # fixed parenthesized double-multiply chains (module docstring):
    # ((na·nb)·d)·(n−d) / ((n·n)·(n−1))
    e_t = F.when(
        n > 0,
        (F.col("n_a").cast("double") * d.cast("double")) / n.cast("double"),
    ).otherwise(F.lit(0.0))
    v_t = F.when(
        n > 1,
        (
            (
                (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                * d.cast("double")
            )
            * (n - d).cast("double")
        )
        / ((n.cast("double") * n.cast("double")) * (n - 1).cast("double")),
    ).otherwise(F.lit(0.0))
    terms = steps.select(
        "step", "n_a", "d_a", "n_b", "d_b",
        (F.col("d_a").cast("double") - e_t).alias("oe_t"),
        v_t.alias("v_t"),
    )
    fold = lambda col: F.aggregate(  # noqa: E731 — left fold, fixed order
        F.collect_list(col).over(w_curr), F.lit(0.0), lambda a, x: a + x
    )
    out = terms.select(
        "step", "n_a", "d_a", "n_b", "d_b",
        fold("oe_t").alias("cum_oe"),
        fold("v_t").alias("cum_v"),
    )
    return out.select(
        "step", "n_a", "d_a", "n_b", "d_b", "cum_oe", "cum_v",
        F.when(
            F.col("cum_v") > 0, F.col("cum_oe") / F.sqrt(F.col("cum_v"))
        ).alias("z"),
    ).orderBy("step")
