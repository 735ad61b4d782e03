from binancedatapipeline_spark.streaming.jobs import (
    resample_klines,
    stream_upsert,
)

__all__ = ["resample_klines", "stream_upsert"]
