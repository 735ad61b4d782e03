"""Scalar time helpers mirroring the reference's conversions.

The Binance wire format is epoch-milliseconds; storage is tz-naive
UTC timestamps (pd.to_datetime(unit='ms'),
crypto_data_pipeline_duckdb.py:1069-1070); display occasionally
converts to Asia/Shanghai (duckdb:1762). All are thin wrappers over
built-in JVM functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Epoch milliseconds -> TimestampType (UTC session)."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def ts_to_epoch_ms(col: Column | str) -> Column:
    """TimestampType -> epoch milliseconds (LongType)."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def minutes_between(start: Column, end: Column) -> Column:
    """Whole minutes from start to end — DATEDIFF('minute', a, b)
    (crypto_data_pipeline_duckdb.py:1748)."""
    return (F.unix_timestamp(end) - F.unix_timestamp(start)) / 60.0


def tz_display(col: Column | str, tz: str = "Asia/Shanghai") -> Column:
    """UTC-naive timestamp shifted for display (duckdb:1762)."""
    return F.from_utc_timestamp(F.col(col) if isinstance(col, str) else col, tz)
