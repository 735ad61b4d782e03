"""Online stateful gap detection with ``applyInPandasWithState``.

The reference audits kline continuity with a batch LEAD-window query
(`validate_data`, crypto_data_pipline_clickhouse.py:1920-1953) run on
a cron. This is the streaming-native form (SURVEY T6 "stretch"): per
symbol, keep the last seen bar timestamp in group state and emit a gap
row whenever the next bar arrives more than ``interval_hours`` later.
State is one timestamp per key, so it holds at any symbol cardinality;
a processing-time timeout finalizes symbols that stop sending bars.

Batch semantics of the same operator live in ``operators/gaps.py``
(LEAD window) — the streaming variant exists for pipelines that need
alerts online rather than at the next cron tick.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("gap_start", TimestampType()),
        StructField("gap_end", TimestampType()),
        StructField("gap_hours", DoubleType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_ts", TimestampType())])


def _gap_fn(interval_hours: float):
    max_gap_s = interval_hours * 3600.0

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        out: list[tuple] = []
        ts_all = pd.concat([p["timestamp"] for p in pdfs]).sort_values()
        for ts in ts_all:
            ts = ts.to_pydatetime()
            if last is not None:
                gap_s = (ts - last).total_seconds()
                if gap_s > max_gap_s:
                    out.append((symbol, last, ts, gap_s / 3600.0))
            last = ts
        state.update((last,))
        state.setTimeoutDuration(int(max_gap_s * 2 * 1000))
        if out:
            yield pd.DataFrame(out, columns=["symbol", "gap_start", "gap_end", "gap_hours"])

    return fn


def stream_gap_monitor(
    klines: DataFrame,
    interval_hours: float = 1.0,
    entity_col: str = "symbol",
    time_col: str = "timestamp",
) -> DataFrame:
    """Streaming DataFrame of gap alerts: (symbol, gap_start, gap_end,
    gap_hours), emitted as soon as the bar after a gap arrives."""
    cols = klines.select(
        klines[entity_col].alias("symbol"), klines[time_col].alias("timestamp")
    )
    return cols.groupBy("symbol").applyInPandasWithState(
        _gap_fn(interval_hours),
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
