"""Structured Streaming operators (SURVEY §2.10)."""

from aws_etl_spark.streaming.sessions import (
    session_rollup,
    sessionize,
    streaming_session_window,
)
from aws_etl_spark.streaming.cdc import apply_cdc_batch, cdc_writer, latest_per_key
from aws_etl_spark.streaming.stateful import running_user_totals
from aws_etl_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    sliding_window_avg,
    tumbling_counts,
    watermark_dedup,
)
