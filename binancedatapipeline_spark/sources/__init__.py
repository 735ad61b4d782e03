from binancedatapipeline_spark.sources.binance import (
    SyntheticBinanceApi,
    fetch_klines_distributed,
    fetch_funding_rates_distributed,
    flatten_exchange_info,
    parse_kline_records,
)

__all__ = [
    "SyntheticBinanceApi",
    "fetch_klines_distributed",
    "fetch_funding_rates_distributed",
    "flatten_exchange_info",
    "parse_kline_records",
]
