"""Window functions (SURVEY §2.5 W1–W7, §2.6 O1).

All windows partition by a key — per-partition state fits in memory at any
scale because partitions are bounded by the key cardinality split, and
Spark spills sorted runs if not. No global (unpartitioned) windows appear
anywhere in the catalog: a global window is a single-task bottleneck at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.core import DEC
from ..registry import query


@query(
    "window_rank_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK() OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("W1", "O1"),
    bench=True,
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W1] Per-group top-k via row_number/rank/dense_rank — the
    last-closed-bar selection pattern (``StockFinanceMetrics.py:87-93``)
    generalized. Tie-break on orderkey makes row_number deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        # presentation sort dropped (order-insensitive compare); the
        # window's own partition sort is the semantic one
    )


@query(
    "window_lag_returns",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 4) AS price_change
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("W2",),
)
def window_lag_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W2] lag/lead — the minute-over-minute return transform
    (close/lag(close)-1) on the orders timeline."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        prev.alias("prev_price"),
        F.round(F.col("o_totalprice") - prev, 4).alias("price_change"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
             / COUNT(o_totalprice) OVER w AS sma3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("W3",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W3] Moving average over a rows frame (20-bar SMA shape). Decimal
    accumulation inside the frame keeps it order-independent."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    sma = F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double") / F.count(
        "o_totalprice"
    ).over(w)
    return o.select("o_custkey", "o_orderkey", "o_orderdate", sma.alias("sma3")).orderBy(
        "o_custkey", "o_orderdate", "o_orderkey"
    )


@query(
    "window_cumulative",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) AS running_spend,
           CAST(COUNT(*) OVER w AS BIGINT) AS running_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("W5",),
)
def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W5] Cumulative running totals — "running volume since open"."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("running_orders"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_range_frame",
    oracle="""
    WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_30m_value
    FROM events_us
    ORDER BY user_id, ts, event_id
    """,
    tags=("W4",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W4] Range frame over event-time seconds — 30-minute rolling sum
    over irregular ticks (the rolling-VWAP frame, SURVEY §2.5 W4)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-1800, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("rolling_30m_value"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "window_ntile_pctrank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER w AS INT) AS bal_quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, c_acctbal, c_custkey
    """,
    tags=("W6",),
)
def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W6] ntile quartiles + percent_rank — volatility-quartile shape."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
    ).orderBy("c_mktsegment", "c_acctbal", "c_custkey")


@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_spend,
           LAST_VALUE(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("W7",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W7] first/last value in frame — session-open-price shape. The
    last_value frame is full-partition so it is well-defined (default frame
    would stop at CURRENT ROW)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_spend"),
        F.last("o_totalprice").over(wfull).alias("last_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_cume_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CUME_DIST() OVER w, 6) AS price_cume,
           CAST(NTH_VALUE(o_totalprice, 2) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS DOUBLE) AS second_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("W6", "W7"),
)
def window_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[W6/W7] cume_dist (fraction of peers at-or-below) and nth_value
    over the full-partition frame — rounding guards cume_dist's division
    against cross-engine ULP noise."""
    o = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.cume_dist().over(w_price), 6).alias("price_cume"),
        F.nth_value("o_totalprice", 2).over(w_full).cast("double").alias("second_order_price"),
    ).orderBy("o_custkey", "o_orderkey")
