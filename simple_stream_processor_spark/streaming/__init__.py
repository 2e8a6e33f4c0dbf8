"""Structured Streaming surface: the unbounded twins of the batch operators
(SURVEY §2.5/§2.3) — event-time windows with watermark late-drop, streaming
dedup with bounded state, stateful count windows, rate-limited sources
(the backpressure mechanism), and managed sinks.

The reference is streaming in API but batch in execution for its event-time
pipes (it drains the whole stream before emitting, reference
Node.scala:293-306); this module is genuinely incremental — state lives in
the state store, watermarks bound it, and sources admit data at a
controlled rate (maxFilesPerTrigger / maxOffsetsPerTrigger) which is
Spark's block-not-drop backpressure (ADR-0004 parity).
"""

from simple_stream_processor_spark.streaming.runner import run_stream_to_memory, stream_events
from simple_stream_processor_spark.streaming.windows import (
    streaming_count_window,
    streaming_session_window,
    streaming_tumbling_window,
)
from simple_stream_processor_spark.streaming.dedup import streaming_dedup

__all__ = [
    "run_stream_to_memory",
    "stream_events",
    "streaming_count_window",
    "streaming_dedup",
    "streaming_session_window",
    "streaming_tumbling_window",
]
