from binancedatapipeline_spark.functions.timeutils import (
    epoch_ms_to_ts,
    minutes_between,
    ts_to_epoch_ms,
    tz_display,
)

__all__ = ["epoch_ms_to_ts", "ts_to_epoch_ms", "minutes_between", "tz_display"]
