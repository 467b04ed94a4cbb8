"""Arbitrary stateful streaming (SURVEY §2.9 T10): running position per
symbol via ``applyInPandasWithState`` — the custom-stateful-operator slot
the reference never fills.

State per key is one (position, cash) pair — O(symbols) total state, the
bounded-state design the 100 TB posture requires.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

POSITION_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("position", LongType()),
        StructField("cash_flow", DoubleType()),
        StructField("n_fills", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("position", LongType()),
        StructField("cash_flow", DoubleType()),
        StructField("n_fills", LongType()),
    ]
)


def _update_position(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold fills into a per-symbol running position. ``side`` +1 buy /
    -1 sell; cash_flow accumulates -side·price·qty."""
    if state.exists:
        position, cash_flow, n_fills = state.get
    else:
        position, cash_flow, n_fills = 0, 0.0, 0
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["datetime"])
        qty = (pdf["volume"] * pdf["side"]).astype("int64")
        position += int(qty.sum())
        cash_flow += float((-pdf["side"] * pdf["last_price"] * pdf["volume"]).sum())
        n_fills += len(pdf)
    state.update((position, cash_flow, n_fills))
    yield pd.DataFrame(
        {
            "symbol": [key[0]],
            "position": [position],
            "cash_flow": [cash_flow],
            "n_fills": [n_fills],
        }
    )


def running_position(fills: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T10: per-symbol running position over a fills stream with columns
    (symbol, datetime, last_price, volume, side)."""
    wm = fills.withWatermark("datetime", watermark) if fills.isStreaming else fills
    return wm.groupBy("symbol").applyInPandasWithState(
        _update_position,
        outputStructType=POSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_ALPHA = 0.75  # dyadic, matching the batch operator (operators/timeseries.py)

EWMA_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ewma", DoubleType()),
        StructField("n_obs", LongType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("n_obs", LongType()),
    ]
)


def _update_ewma(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Recursive EWMA fold: y ← α·x + (1-α)·y. The streaming-native form
    of the batch operator's truncated Horner (identical fixed point; the
    batch form truncates at weight (1-α)^50 ≈ 1e-30 purely so a SQL
    oracle can replay it — one scalar of state needs no truncation)."""
    if state.exists:
        y, n = state.get
    else:
        y, n = None, 0
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["datetime"])
        for x in pdf["last_price"]:
            if x is None or pd.isna(x):
                continue
            y = float(x) if y is None else EWMA_ALPHA * float(x) + (1 - EWMA_ALPHA) * y
            n += 1
    state.update((y, n))
    yield pd.DataFrame({"symbol": [key[0]], "ewma": [y], "n_obs": [n]})


def ewma_stream(ticks: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T10: per-symbol streaming EWMA over a (symbol, datetime,
    last_price) tick stream — the stateful twin of the batch ``ewma``
    catalog query. State is ONE (ewma, n_obs) pair per symbol: O(symbols)
    total, the bounded-state posture; each micro-batch folds its ticks in
    event-time order and emits the updated smoothed level."""
    wm = ticks.withWatermark("datetime", watermark) if ticks.isStreaming else ticks
    return wm.groupBy("symbol").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
