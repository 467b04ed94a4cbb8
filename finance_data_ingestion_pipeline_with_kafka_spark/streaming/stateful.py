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
