"""Streaming analytics operators (SURVEY §2.9 T6–T9, §2.3 J8–J9).

Each builder takes a streaming (or batch — the expressions are identical)
DataFrame in the finnhub sink shape (symbol, datetime, last_price, volume)
or the generic (key, ts, value) shape and returns the transformed frame.
Watermarks bound state: late rows beyond the watermark are dropped, which
is the documented divergence from the reference's unbounded producer-side
dedup set (SURVEY §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_bars(
    trades: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    ts_col: str = "datetime",
    symbol_col: str = "symbol",
    price_col: str = "last_price",
    volume_col: str = "volume",
) -> DataFrame:
    """T7/A2: re-derive OHLCV bars from raw trades — the bar-building
    workload the reference leaves as a stub (yfinance_processing.py:30-31).
    ``min_by/max_by`` over the event time gives deterministic open/close."""
    wm = trades.withWatermark(ts_col, watermark) if trades.isStreaming else trades
    tiebreak = F.col(ts_col)
    return (
        wm.groupBy(F.col(symbol_col).alias("symbol"), F.window(ts_col, window).alias("w"))
        .agg(
            F.min_by(price_col, tiebreak).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, tiebreak).alias("close"),
            F.sum(volume_col).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("bar_start"),
            F.col("w.end").alias("bar_end"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_trades",
        )
    )


def sliding_momentum(
    trades: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T8: sliding-window momentum — 5-minute aggregates emitted every
    minute."""
    wm = trades.withWatermark("datetime", watermark) if trades.isStreaming else trades
    return (
        wm.groupBy("symbol", F.window("datetime", window, slide).alias("w"))
        .agg(
            F.min_by("last_price", F.col("datetime")).alias("first_price"),
            F.max_by("last_price", F.col("datetime")).alias("last_price"),
            F.sum("volume").alias("volume"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("window_start"),
            (F.col("last_price") - F.col("first_price")).alias("momentum"),
            "volume",
        )
    )


def session_bursts(
    trades: DataFrame, gap: str = "30 seconds", watermark: str = "10 minutes"
) -> DataFrame:
    """T9: session windows — trading bursts per symbol separated by ≥gap
    quiet periods."""
    wm = trades.withWatermark("datetime", watermark) if trades.isStreaming else trades
    return (
        wm.groupBy("symbol", F.session_window("datetime", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_trades"), F.sum("volume").alias("volume"))
        .select(
            "symbol",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_trades",
            "volume",
        )
    )


def stream_static_enrich(trades: DataFrame, symbol_dim: DataFrame) -> DataFrame:
    """J9: stream-static broadcast join — enrich the tick stream with the
    (small) symbol dimension. Supported natively by micro-batch planning;
    the dim is re-resolved per batch, so slowly-changing dims pick up
    updates."""
    return trades.join(F.broadcast(symbol_dim), on="symbol", how="left")


def stream_stream_join(
    bars: DataFrame,
    trades: DataFrame,
    bar_watermark: str = "10 minutes",
    trade_watermark: str = "10 minutes",
    join_horizon: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """J8: stream-stream join — trades matched to the bar whose
    [start, start+horizon) interval contains them. Both sides carry
    watermarks + a time-range condition so Spark can bound join state.
    ``how`` extends to ``left_outer``/``full_outer``: unmatched rows are
    emitted null-padded once the watermark passes the join horizon (state
    for them is then evicted — bounded regardless of stream length).

    ``bars`` shape: (ticker, datetime, close); ``trades`` shape:
    (symbol, datetime, last_price, volume).
    """
    b = bars.withWatermark("datetime", bar_watermark).select(
        F.col("ticker").alias("b_symbol"),
        F.col("datetime").alias("bar_time"),
        F.col("close").alias("bar_close"),
    )
    t = trades.withWatermark("datetime", trade_watermark).select(
        F.col("symbol").alias("t_symbol"),
        F.col("datetime").alias("trade_time"),
        "last_price",
        "volume",
    )
    return b.join(
        t,
        (F.col("b_symbol") == F.col("t_symbol"))
        & (F.col("trade_time") >= F.col("bar_time"))
        & (F.col("trade_time") < F.col("bar_time") + F.expr(f"INTERVAL {join_horizon}")),
        how,
    ).select(
        F.col("b_symbol").alias("symbol"),
        "bar_time",
        "bar_close",
        "trade_time",
        "last_price",
        "volume",
    )
