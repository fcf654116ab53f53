"""Sliding-window meter rates on a stream — the live twin of
queries.q_meter_rates (the logstash metrics filter surface).

Batch computes trailing 5-minute counts per (event_type, minute) with a
RANGE frame over the minute aggregate; the streaming form is the same
relation expressed as an EVENT-TIME SLIDING WINDOW: ``window(ts, size,
slide)`` assigns each event to size/slide overlapping windows, the
watermark bounds state (a window's accumulator is dropped once the
watermark passes its end, so state is |types| × size/slide × active
windows — never data-sized), and append mode emits each window EXACTLY
ONCE when it can no longer change. A trailing count ending at minute M
is the sliding window [M-4, M+1) — proven equal to the batch RANGE
frame in tests/test_meter_stream.py across micro-batch boundaries.

This is the third point on the lateness spectrum the streaming tier
documents: windowed.py drops late rows (append tumbling),
sessionize_stream buffers them until the watermark (event-time-exact),
and the sliding meter here re-aggregates them into every window they
belong to as long as those windows are still open.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_meter(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    size: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(key, window end, count) per sliding window. Works identically on
    a batch DataFrame (no watermark applied) — the parity test runs the
    SAME call both ways."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(key_col).alias("key"),
            F.window(ts_col, size, slide).alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("key", F.col("win.end").alias("win_end"), "n")
    )
