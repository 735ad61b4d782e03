from binancedatapipeline_spark.streaming.jobs import (
    resample_klines,
    sessionize_windows,
    stream_curate_upsert,
    stream_incremental_dedup,
    stream_dedup,
    stream_near_dedup,
    stream_premium,
    stream_upsert,
)

__all__ = [
    "resample_klines",
    "sessionize_windows",
    "stream_curate_upsert",
    "stream_incremental_dedup",
    "stream_dedup",
    "stream_near_dedup",
    "stream_premium",
    "stream_upsert",
]
