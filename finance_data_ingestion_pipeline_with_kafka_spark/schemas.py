"""Stream and sink schemas — the reference's declared contracts, verbatim
semantics (SURVEY §1.3–1.4).

Fixed, declared, applied-at-read: each source has a hand-written
``StructType`` passed into ``from_json``; malformed JSON → NULL struct
(dropped by the validity predicate downstream). No inference, no evolution.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: 1-minute OHLCV bar message — mirrors
#: scripts/spark_streaming_processing/yfinance_processing.py:16-27
#: (all fields nullable, field names as produced by the Yahoo poller).
YFINANCE_SCHEMA = StructType(
    [
        StructField("Datetime", TimestampType(), True),
        StructField("Open", FloatType(), True),
        StructField("High", FloatType(), True),
        StructField("Low", FloatType(), True),
        StructField("Close", FloatType(), True),
        StructField("Adj Close", FloatType(), True),
        StructField("Volume", IntegerType(), True),
        StructField("Dividends", FloatType(), True),
        StructField("Stock Splits", FloatType(), True),
        StructField("ticker", StringType(), True),
    ]
)

#: Trade tick message — mirrors
#: scripts/spark_streaming_processing/finnhub_processing.py:17-23
#: (alphabetical keys c,p,s,t,v; ``t`` is epoch milliseconds).
FINNHUB_SCHEMA = StructType(
    [
        StructField("c", ArrayType(StringType()), True),
        StructField("p", FloatType(), True),
        StructField("s", StringType(), True),
        StructField("t", LongType(), True),
        StructField("v", IntegerType(), True),
    ]
)

#: Sink contract of the yfinance pipeline — rename block at
#: dags/ingestion_yfinance_data_to_cassandra_db.py:257-268, DDL :122-137.
#: ``id`` is a deterministic sha2 key here (not ``uuid()``) so replays are
#: idempotent (SURVEY §7.2).
STOCK_DATA_COLUMNS = (
    "id",
    "datetime",
    "open",
    "high",
    "low",
    "close",
    "adj_close",
    "volume",
    "dividends",
    "stock_splits",
    "ticker",
)

#: Sink contract of the finnhub pipeline — DDL at
#: dags/ingestion_finnhub_data_to_cassandra_db.py:122-133 with the
#: *intended* semantics: ``datetime`` = timestamp_millis(t) is KEPT (the
#: reference computes then drops it — SURVEY §2.8 F1).
STOCK_TRADE_COLUMNS = (
    "id",
    "trade_conditions",
    "last_price",
    "symbol",
    "datetime",
    "volume",
)
