from windflow_spark.streaming.engine import (
    stream_source,
    stream_win_tb,
    stream_session,
    stream_cb_windows,
    stream_accumulate,
    stream_interval_join,
    run_available_now,
    MetricsListener,
)

__all__ = [
    "stream_source",
    "stream_win_tb",
    "stream_session",
    "stream_cb_windows",
    "stream_accumulate",
    "stream_interval_join",
    "run_available_now",
    "MetricsListener",
]
