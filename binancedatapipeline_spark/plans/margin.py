"""Margin-asset derivation: which assets to fetch margin rates for.

Reference: the CTE feeding
``fetch_market_margin_interest_rates_threadpool``
(crypto_data_pipeline_duckdb.py:286-318 /
crypto_data_pipline_clickhouse.py:566-598):

1. per-symbol MIN/MAX(timestamp) over bn_spot_klines (grouped agg);
2. inner join to bn_spot_symbols (small dim → broadcast);
3. DISTINCT base_asset with a NOT IN exclusion list;
4. append a synthetic USDT row spanning the global min/max.

Note the reference's DISTINCT is over (asset, list_date,
delist_date) — an asset listed under several symbols with different
date ranges yields several rows, faithfully preserved here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXCLUDED_ASSETS = ("TUSD", "XUSD", "WBTC", "WBETH", "BNSOL", "USDP")


def margin_assets(
    spot_klines: DataFrame,
    spot_symbols: DataFrame,
    excluded: tuple[str, ...] = EXCLUDED_ASSETS,
) -> DataFrame:
    """Columns: asset, list_date, delist_date."""
    ranges = spot_klines.groupBy("symbol").agg(
        F.min("timestamp").alias("list_date"),
        F.max("timestamp").alias("delist_date"),
    )
    assets = (
        ranges.join(F.broadcast(spot_symbols), on="symbol", how="inner")
        .filter(~F.col("base_asset").isin(*excluded))
        .select(F.col("base_asset").alias("asset"), "list_date", "delist_date")
        .distinct()
    )
    usdt = assets.agg(
        F.lit("USDT").alias("asset"),
        F.min("list_date").alias("list_date"),
        F.max("delist_date").alias("delist_date"),
    )
    return assets.unionByName(usdt)
