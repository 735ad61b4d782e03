"""Deterministic bn_* domain fixtures (FIXTURES.md section A).

Synthesizes the reference's nine-table world — symbols dims, 1h
kline facts with injected gaps, funding/margin rates — as plain
pandas frames / parquet files, seed-pinned so every test run and
the DuckDB oracle see identical bytes. ~20 symbols x 30 days of 1h
bars keeps the joins and 120-row windows non-trivial but fast.

All timestamps are tz-naive UTC (the reference convention,
crypto_data_pipeline_duckdb.py:908).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
N_DAYS = 30
BARS_PER_SYMBOL = N_DAYS * 24  # 720 1h bars ≥ 120 (WMA) + 30 (LAG)
T0 = pd.Timestamp("2024-01-01 00:00:00")

_BASES = [
    "BTC", "ETH", "SOL", "BNB", "XRP", "ADA", "DOGE", "AVAX", "DOT", "LINK",
    "LTC", "ATOM", "UNI", "APT", "ARB", "TUSD", "WBTC", "FIL", "NEAR", "OP",
]


def spot_symbols() -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    rows = []
    for i, base in enumerate(_BASES):
        quote = "USDC" if i % 7 == 3 else "USDT"
        rows.append(
            {
                "symbol": base + quote,
                "base_asset": base,
                "quote_asset": quote,
                "exchange": "binance",
                "type": "SPOT",
                "status": "BREAK" if i % 11 == 10 else "TRADING",
                "is_spot_trading_allowed": True,
                "is_margin_trading_allowed": bool(i % 3),
                "base_precision": 8,
                "quote_precision": 8,
                "min_price": 0.0001,
                "max_price": 1e6,
                "tick_size": 0.0001,
                "min_qty": 0.001,
                "max_qty": float(rng.integers(1e5, 9e6)),
                "step_size": 0.001,
            }
        )
    return pd.DataFrame(rows)


def perp_symbols() -> pd.DataFrame:
    """First 15 bases have perps (⊂ spot set) plus one perp-only symbol
    so the premium inner join drops rows."""
    rows = []
    for i, base in enumerate(_BASES[:15] + ["PERPONLY"]):
        # stagger onboard so some symbols fail `ts > onboard + 5 days`
        onboard = T0 + pd.Timedelta(days=-400 + i * 2) if i % 4 else T0 + pd.Timedelta(days=i)
        delivery = (
            pd.Timestamp("2100-12-25")
            if i % 5
            else T0 + pd.Timedelta(days=20)
        )
        rows.append(
            {
                "symbol": base + "USDT",
                "base_asset": base,
                "quote_asset": "USDT",
                "margin_asset": "USDT",
                "exchange": "binance",
                "type": "PERPETUAL",
                "underlyingSubType": "Layer-1" if i % 2 else "PoW",
                "status": "TRADING",
                "onboard_date": onboard,
                "delivery_date": pd.NaT if i == 7 else delivery,
                "price_precision": 2 + i % 3,
                "quantity_precision": 3,
                "min_price": 0.01,
                "max_price": 1e6,
                "tick_size": 0.01,
                "min_qty": 0.001,
                "max_qty": 1e6,
                "step_size": 0.001,
            }
        )
    return pd.DataFrame(rows)


def _base_walk(rng: np.random.Generator, n: int, start_price: float) -> np.ndarray:
    steps = rng.normal(0, 0.004, size=n)
    return start_price * np.exp(np.cumsum(steps))


def klines(kind: str) -> pd.DataFrame:
    """1h OHLCV bars. kind='SPOT' or 'PERPETUAL'. Perp close = spot
    close * (1 + premium_eps) with occasional spikes so the WMA-120
    and the extreme-event thresholds both fire. Gaps injected in a
    few symbols feed the gap audit."""
    rng = np.random.default_rng(SEED + 1)
    symbols = [b + "USDT" for b in _BASES[:15]] + (
        ["PERPONLYUSDT"] if kind == "PERPETUAL" else []
    )
    ts_grid = pd.date_range(T0, periods=BARS_PER_SYMBOL, freq="1h")
    frames = []
    for i, sym in enumerate(symbols):
        close_spot = _base_walk(rng, BARS_PER_SYMBOL, float(10 + 1000 * rng.random()))
        eps = rng.normal(0.0005, 0.002, size=BARS_PER_SYMBOL)
        # a few sustained negative-premium squeezes to trip the detector
        n_spikes = rng.integers(1, 4)
        for _ in range(n_spikes):
            at = int(rng.integers(200, BARS_PER_SYMBOL - 40))
            eps[at : at + 36] -= rng.uniform(0.01, 0.03)
        close = close_spot if kind == "SPOT" else close_spot * (1 + eps)
        high = close * (1 + np.abs(rng.normal(0, 0.002, BARS_PER_SYMBOL)))
        low = close * (1 - np.abs(rng.normal(0, 0.002, BARS_PER_SYMBOL)))
        opn = np.roll(close, 1)
        opn[0] = close[0]
        vol = np.abs(rng.normal(1000, 300, BARS_PER_SYMBOL))
        pdf = pd.DataFrame(
            {
                "symbol": sym,
                "exchange": "binance",
                "type": kind,
                "interval": "1h",
                "timestamp": ts_grid,
                "close_time": ts_grid + pd.Timedelta(minutes=59, seconds=59),
                "open": opn,
                "high": high,
                "low": low,
                "close": close,
                "volume": vol,
                "quote_volume": vol * close,
                "taker_buy_volume": vol * 0.5,
                "taker_buy_quote_volume": vol * close * 0.5,
                "trades_count": rng.integers(100, 5000, BARS_PER_SYMBOL).astype("int32"),
            }
        )
        # inject 2-3 gaps into every third symbol
        if i % 3 == 0:
            drop_at = rng.choice(np.arange(150, BARS_PER_SYMBOL - 150), size=3, replace=False)
            drop_idx = np.concatenate([np.arange(d, d + int(rng.integers(2, 5))) for d in drop_at])
            pdf = pdf.drop(pdf.index[np.unique(drop_idx)])
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


def funding_rates() -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 2)
    symbols = [b + "USDT" for b in _BASES[:15]]
    ts_grid = pd.date_range(T0, periods=N_DAYS * 3, freq="8h")
    frames = []
    for sym in symbols:
        rate = rng.normal(0.0001, 0.0003, size=len(ts_grid))
        spikes = rng.integers(0, len(ts_grid), size=2)
        rate[spikes] = -rng.uniform(0.006, 0.02, size=2)
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "exchange": "binance",
                    "type": "PERPETUAL",
                    "fundingTime": ts_grid,
                    "fundingRate": rate,
                    "markPrice": np.abs(rng.normal(100, 30, len(ts_grid))),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def margin_interest_rates() -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 3)
    assets = _BASES[:12] + ["USDT"]
    ts_grid = pd.date_range(T0, periods=N_DAYS * 24, freq="1h")
    frames = []
    for a in assets:
        frames.append(
            pd.DataFrame(
                {
                    "asset": a,
                    "exchange": "binance",
                    "type": "MARGIN",
                    "timestamp": ts_grid,
                    "dailyInterestRate": np.abs(rng.normal(2e-4, 5e-5, len(ts_grid))),
                    "vipLevel": np.int32(0),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def write_all(out_dir: str) -> dict[str, str]:
    """Write every fixture table as one parquet file; returns
    name -> path."""
    os.makedirs(out_dir, exist_ok=True)
    tables = {
        "bn_spot_symbols": spot_symbols(),
        "bn_perp_symbols": perp_symbols(),
        "bn_spot_klines": klines("SPOT"),
        "bn_perp_klines": klines("PERPETUAL"),
        "bn_funding_rates": funding_rates(),
        "bn_margin_interest_rates": margin_interest_rates(),
    }
    paths = {}
    for name, pdf in tables.items():
        # Spark's parquet reader rejects TIMESTAMP(NANOS); store micros
        for col in pdf.columns:
            if pd.api.types.is_datetime64_any_dtype(pdf[col]):
                pdf[col] = pdf[col].astype("datetime64[us]")
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            pdf.to_parquet(path, index=False)
        paths[name] = path
    return paths
