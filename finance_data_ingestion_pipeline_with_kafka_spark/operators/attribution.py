"""Multi-touch marketing attribution over the event stream (SURVEY §2.4
A1 / §2.5 W — the revenue-credit report every growth team runs).

For each ``purchase``, the touchpoints are that user's ``click`` events
strictly earlier in the per-user (ts, event_id) total order and within a
``ATTR_LOOKBACK_H``-hour lookback window; the click's channel is derived
from its ``props.k`` (``k % ATTR_N_CHANNELS`` — the deterministic stand-in
for a utm_source field). Three standard models are credited in ONE pass:

* **first-touch** — the whole purchase value to the earliest touch;
* **last-touch** — the whole value to the latest touch;
* **linear** — value split evenly across the touches, a channel earning
  ``K/n`` of the value for its K of the n touches.

Purchases with no touch in the window credit a synthetic ``direct``
channel under all three models (the untracked-conversion bucket).

Determinism contract: purchase values ride the ``snap_scaled`` ×10^6
integer lane (the ``dsum_scaled`` discipline), first/last election is a
ROW_NUMBER over the total (ts, event_id) order in both engines, and the
linear share is the FLOOR division ``(micros · K) div n`` — exact BIGINT
arithmetic end to end, so every revenue column hash-matches; the only
doubles are the final ÷10^6 unscales. The floor makes per-purchase
linear credit undershoot by < n micro-dollars (documented, both engines
identically); first/last columns are exact to the snap.

Scale: ONE shuffle of clicks and purchases on user_id, a per-user
time-band join (pair fan-out bounded by touches-per-lookback, never
cross-user), then channel-cardinality aggregation. At 100 TB this is
the sessionize-class shape: user-bucketed lake layout makes the band
join co-partitioned, and the report is channels-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.core import snap_scaled
from ..registry import query

ATTR_LOOKBACK_H = 72
ATTR_N_CHANNELS = 5
_US_PER_H = 3_600_000_000


_ATTR_ORACLE = f"""
    WITH purchases AS MATERIALIZED (
      SELECT event_id AS pid, user_id, ts,
             CAST(CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS DECIMAL(12,0))
                  AS BIGINT) AS micros
      FROM events WHERE event_type = 'purchase'
    ), clicks AS MATERIALIZED (
      SELECT user_id, ts, event_id,
             'ch' || CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                          % {ATTR_N_CHANNELS} AS VARCHAR) AS channel
      FROM events WHERE event_type = 'click'
    ), touches AS MATERIALIZED (
      SELECT p.pid, p.micros, c.channel, c.ts, c.event_id
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id
       AND (c.ts, c.event_id) < (p.ts, p.pid)
       AND epoch_us(c.ts) >= epoch_us(p.ts) - {ATTR_LOOKBACK_H} * {_US_PER_H}
    ), ranked AS MATERIALIZED (
      SELECT pid, micros, channel,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts DESC, event_id DESC) AS rl,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM touches
    ), per_channel AS (
      SELECT pid, micros, channel, n,
             CAST(COUNT(*) AS BIGINT) AS k,
             MAX(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS is_first,
             MAX(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS is_last
      FROM ranked GROUP BY pid, micros, channel, n
    ), direct AS (
      SELECT 'direct' AS channel,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(COUNT(*) AS BIGINT) AS n_first,
             CAST(SUM(micros) AS BIGINT) AS first_micros,
             CAST(COUNT(*) AS BIGINT) AS n_last,
             CAST(SUM(micros) AS BIGINT) AS last_micros,
             CAST(SUM(micros) AS BIGINT) AS linear_micros
      FROM purchases WHERE pid NOT IN (SELECT pid FROM touches)
    ), channels AS (
      SELECT channel,
             CAST(SUM(k) AS BIGINT) AS n_touches,
             CAST(SUM(is_first) AS BIGINT) AS n_first,
             CAST(SUM(is_first * micros) AS BIGINT) AS first_micros,
             CAST(SUM(is_last) AS BIGINT) AS n_last,
             CAST(SUM(is_last * micros) AS BIGINT) AS last_micros,
             CAST(SUM((micros * k) // n) AS BIGINT) AS linear_micros
      FROM per_channel GROUP BY channel
      UNION ALL SELECT * FROM direct WHERE n_touches > 0
    )
    SELECT channel, n_touches, n_first,
           CAST(first_micros AS DOUBLE) / 1000000.0 AS first_revenue,
           n_last,
           CAST(last_micros AS DOUBLE) / 1000000.0 AS last_revenue,
           CAST(linear_micros AS DOUBLE) / 1000000.0 AS linear_revenue
    FROM channels ORDER BY channel
"""


@query("touch_attribution", oracle=_ATTR_ORACLE, tags=("A1", "W1"), prepared=True)
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A1/W1] First-touch / last-touch / linear revenue attribution per
    channel (module docstring carries the model, exactness, and scale
    contracts)."""
    return attribution_report(load_table(spark, sf_dir, "events"))


def attribution_report(ev: DataFrame) -> DataFrame:
    """The attribution kernel on an arbitrary events frame — split out so
    crafted-input tests drive the exact code the registered query runs."""
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        snap_scaled("value").cast("long").alias("micros"),
    )
    # click-side columns renamed up front: purchases and clicks share
    # the events lineage, and a raw user_id == user_id join condition is
    # only disambiguated by Spark's self-join plan tagging (it works but
    # warns "trivially true equals predicate") — distinct names make the
    # equi-key unambiguous in the plan text too
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
        F.concat(
            F.lit("ch"),
            (F.get_json_object("props", "$.k").cast("bigint") % ATTR_N_CHANNELS).cast(
                "string"
            ),
        ).alias("channel"),
    )
    touches = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (
            (F.col("cts") < F.col("pts"))
            | ((F.col("cts") == F.col("pts")) & (F.col("cid") < F.col("pid")))
        )
        & (
            F.unix_micros(F.col("cts"))
            >= F.unix_micros(F.col("pts")) - ATTR_LOOKBACK_H * _US_PER_H
        ),
    ).select(
        "pid",
        "micros",
        "channel",
        F.col("cts").alias("ts"),
        F.col("cid").alias("event_id"),
    )
    w_f = Window.partitionBy("pid").orderBy("ts", "event_id")
    w_l = Window.partitionBy("pid").orderBy(F.desc("ts"), F.desc("event_id"))
    w_n = Window.partitionBy("pid")
    ranked = touches.select(
        "pid",
        "micros",
        "channel",
        F.row_number().over(w_f).alias("rf"),
        F.row_number().over(w_l).alias("rl"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    per_channel = ranked.groupBy("pid", "micros", "channel", "n").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max(F.when(F.col("rf") == 1, 1).otherwise(0)).alias("is_first"),
        F.max(F.when(F.col("rl") == 1, 1).otherwise(0)).alias("is_last"),
    )
    channels = per_channel.groupBy("channel").agg(
        F.sum("k").cast("long").alias("n_touches"),
        F.sum("is_first").cast("long").alias("n_first"),
        F.sum(F.col("is_first") * F.col("micros")).cast("long").alias("first_micros"),
        F.sum("is_last").cast("long").alias("n_last"),
        F.sum(F.col("is_last") * F.col("micros")).cast("long").alias("last_micros"),
        F.sum(F.expr("(micros * k) div n")).cast("long").alias("linear_micros"),
    )
    direct = (
        purchases.join(touches.select("pid").distinct(), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.coalesce(F.sum("micros"), F.lit(0)).cast("long").alias("m"),
        )
        .filter(F.col("n_purchases") > 0)
        .select(
            F.lit("direct").alias("channel"),
            F.col("n_purchases").alias("n_touches"),
            F.col("n_purchases").alias("n_first"),
            F.col("m").alias("first_micros"),
            F.col("n_purchases").alias("n_last"),
            F.col("m").alias("last_micros"),
            F.col("m").alias("linear_micros"),
        )
    )
    return (
        channels.unionByName(direct)
        .select(
            "channel",
            "n_touches",
            "n_first",
            (F.col("first_micros").cast("double") / 1e6).alias("first_revenue"),
            "n_last",
            (F.col("last_micros").cast("double") / 1e6).alias("last_revenue"),
            (F.col("linear_micros").cast("double") / 1e6).alias("linear_revenue"),
        )
        .orderBy("channel")
    )
