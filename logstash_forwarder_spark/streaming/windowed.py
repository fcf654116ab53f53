"""Event-time windowed aggregation with a watermark — the streaming twin of
the batch ``events_hourly`` query (SURVEY §2.11).

The reference ships events as fast as files grow and its spooler flushes on
a timer (spooler.go:22-61) — wall-clock batching. A distributed streaming
engine instead aggregates on EVENT time with a watermark bounding both
lateness and state: a window is finalized (emitted in append mode) once the
watermark passes its end, rows later than the watermark are dropped (Spark
filters late input against the PREVIOUS trigger's watermark —
``eventTimeWatermarkForLateEvents`` lags eviction by one batch, so "late"
means later than the horizon as of the last trigger), and the state store
holds only open windows — state ∝ (#sources × windows inside the lateness
horizon), not stream lifetime. That bounded-state shape
is the only one that survives 100 TB/day; an unbounded ``groupBy(window)``
without a watermark grows state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_source_counts(
    stream_df: DataFrame,
    *,
    event_time_col: str = "ts",
    key_col: str = "source",
    window_len: str = "1 hour",
    lateness: str = "1 hour",
    size_col: str | None = None,
) -> DataFrame:
    """Per-(window, key) row counts — plus a ``size_col`` sum if given —
    over an event-time stream. Append-mode compatible: every output row is
    final (emitted once, when the watermark closes its window), so the sink
    never sees a retraction — the property the exactly-once registrar
    pipeline (plans/registrar.py) relies on downstream.
    """
    aggs = [F.count(F.lit(1)).alias("row_count")]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias(f"{size_col}_total"))
    return (
        stream_df.withWatermark(event_time_col, lateness)
        .groupBy(F.window(event_time_col, window_len).alias("win"), key_col)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            *(
                [F.col("row_count")]
                + ([F.col(f"{size_col}_total")] if size_col is not None else [])
            ),
        )
    )
