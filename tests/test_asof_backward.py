"""As-of join vs pandas merge_asof; backward pagination + keep-first
dedup; stride windows; ban-retry wrapper."""

from __future__ import annotations

import pandas as pd
import pytest

from binancedatapipeline_spark.operators.asof import asof_join
from binancedatapipeline_spark.operators.dedup import dedup_keep_first
from binancedatapipeline_spark.sources.binance import (
    SyntheticBinanceApi,
    TransientBanError,
    call_with_ban_retry,
    fetch_klines_backward_distributed,
    parse_kline_records,
    stride_windows,
)

H = 3_600_000
START = 1_700_000_000_000 // H * H


def test_asof_join_matches_pandas_merge_asof(spark):
    left = pd.DataFrame({
        "key": ["a"] * 5 + ["b"] * 3,
        "lt": pd.to_datetime([
            "2024-01-01 00:05", "2024-01-01 00:10", "2024-01-01 00:30",
            "2024-01-01 01:00", "2024-01-01 02:00",
            "2024-01-01 00:02", "2024-01-01 00:20", "2024-01-01 03:00",
        ]).astype("datetime64[us]"),
        "lv": range(8),
    })
    right = pd.DataFrame({
        "key": ["a"] * 3 + ["b"] * 2,
        "rt": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:30",
            "2024-01-01 00:20", "2024-01-01 02:59",
        ]).astype("datetime64[us]"),
        "rv": [100, 200, 300, 400, 500],
    })
    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on=["key"], left_time="lt", right_time="rt", right_values=["rv"],
        )
        .toPandas()
        .sort_values(["key", "lt"], ignore_index=True)
    )
    exp = pd.merge_asof(
        left.sort_values("lt"), right.sort_values("rt"),
        left_on="lt", right_on="rt", by="key", direction="backward",
    ).sort_values(["key", "lt"], ignore_index=True)
    assert list(got["rv"].fillna(-1)) == list(exp["rv"].fillna(-1))
    assert list(got["rt_right"].fillna(pd.Timestamp(0))) == list(exp["rt"].fillna(pd.Timestamp(0)))


def test_asof_join_tolerance(spark):
    left = pd.DataFrame({
        "key": ["a", "a"],
        "lt": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 05:00"]).astype("datetime64[us]"),
        "lv": [1, 2],
    })
    right = pd.DataFrame({
        "key": ["a"],
        "rt": pd.to_datetime(["2024-01-01 00:00"]).astype("datetime64[us]"),
        "rv": [9],
    })
    got = (
        asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on=["key"], left_time="lt", right_time="rt", right_values=["rv"],
            tolerance="1 hour",
        )
        .toPandas().sort_values("lt", ignore_index=True)
    )
    assert got["rv"].iloc[0] == 9  # within tolerance
    assert pd.isna(got["rv"].iloc[1])  # stale match suppressed


def test_backward_pagination_same_rows_as_forward(spark):
    api = lambda: SyntheticBinanceApi(page_limit=100)  # noqa: E731
    wire = fetch_klines_backward_distributed(
        spark, ["ZUSDT"], START, START + 999 * H, "1h",
        api_factory=api, parallelism=1,
    )
    typed = parse_kline_records(wire.drop("__page_seq"), "OPTION", "1h")
    assert typed.count() == 1000
    assert typed.select("timestamp").distinct().count() == 1000
    first = typed.orderBy("timestamp").first()
    assert first["timestamp"] == pd.Timestamp(START, unit="ms")


def test_backward_pages_keep_first_dedup(spark):
    """Overlapping backward pages: keep-FIRST by page sequence keeps
    the newest-fetched copy (ch:1181-1185 semantics)."""
    api = lambda: SyntheticBinanceApi(page_limit=100)  # noqa: E731
    wire = fetch_klines_backward_distributed(
        spark, ["ZUSDT"], START, START + 999 * H, "1h",
        api_factory=api, parallelism=1,
    )
    deduped = dedup_keep_first(wire, ["symbol", "timestamp_ms"], "__page_seq")
    assert deduped.count() == wire.count() == 1000  # no dupes here, but stable


def test_stride_windows():
    d30 = 30 * 86_400_000
    w = stride_windows(0, int(2.5 * d30), 30)
    assert w[0] == (0, d30)
    assert w[1] == (d30, 2 * d30)
    assert w[-1][1] == int(2.5 * d30)
    assert len(w) == 3


def test_ban_retry():
    calls = []
    until = (pd.Timestamp.now().timestamp() + 0.05) * 1000

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise TransientBanError(int(until))
        return "ok"

    slept = []
    assert call_with_ban_retry(flaky, sleep_fn=slept.append) == "ok"
    assert len(calls) == 3 and len(slept) == 2

    def always_banned():
        raise TransientBanError(int(until))

    with pytest.raises(TransientBanError):
        call_with_ban_retry(always_banned, max_retries=1, sleep_fn=slept.append)
