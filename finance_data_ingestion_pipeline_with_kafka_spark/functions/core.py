"""Scalar/aggregate helper functions (SURVEY §2.8 F1–F11).

All helpers are built-in-expression compositions — they stay JVM-side
inside whole-stage codegen; no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Exact accumulator type for float aggregation. Summing doubles is
#: order-sensitive (distributed partial aggregation reorders adds); summing
#: decimals is exact and order-independent, so results hash-match a
#: single-threaded oracle. 6 fractional digits is far below double ULP for
#: the price-scale values in play.
DEC = "decimal(30,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over a double column → DOUBLE.

    Oracle-SQL mirror: ``CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dsum_expr(sql_expr: str) -> str:
    """The oracle-SQL text mirroring :func:`dsum` for expression ``sql_expr``."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(30,6))) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in DOUBLE.

    Oracle mirror: ``CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def deterministic_id(*cols: str, sep: str = "§") -> Column:
    """Deterministic surrogate key replacing the reference's ``uuid()``
    (``dags/ingestion_yfinance_data_to_cassandra_db.py:269``) so replayed
    micro-batches are idempotent (SURVEY §7.2)."""
    return F.sha2(F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]), 256)


def epoch_millis_to_ts(col: Column | str) -> Column:
    """Epoch-milliseconds → TimestampType — the conversion the reference
    computes then accidentally drops (``dags/ingestion_finnhub_data_to_cassandra_db.py:252-259``,
    SURVEY §2.8 F1). We keep the converted column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def log_return(price: Column | str, prev_price: Column | str) -> Column:
    """ln(p_t / p_{t-1}) — the standard finance return transform (F6)."""
    p = F.col(price) if isinstance(price, str) else price
    q = F.col(prev_price) if isinstance(prev_price, str) else prev_price
    return F.log(p / q)
