from binancedatapipeline_spark.streaming.jobs import (
    resample_klines,
    sessionize_windows,
    batch_token_sketch,
    compact_corpus_sketch,
    read_corpus_sketch,
    stream_curate_upsert,
    stream_incremental_dedup,
    stream_dedup,
    stream_near_dedup,
    stream_premium,
    stream_token_sketch,
    stream_upsert,
)

__all__ = [
    "resample_klines",
    "sessionize_windows",
    "batch_token_sketch",
    "compact_corpus_sketch",
    "read_corpus_sketch",
    "stream_curate_upsert",
    "stream_incremental_dedup",
    "stream_dedup",
    "stream_near_dedup",
    "stream_premium",
    "stream_token_sketch",
    "stream_upsert",
]
