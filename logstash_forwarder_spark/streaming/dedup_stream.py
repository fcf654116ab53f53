"""Streaming exact dedup — the training-data dedup operators in Structured
Streaming form (SURVEY §2.11 × the dedup family).

The reference processes each file line exactly once via its registrar
(/root/reference/registrar.go:12-29); a streaming ingest additionally wants
CONTENT dedup across micro-batches — the same document arriving in two
files, or replayed by an at-least-once upstream. The idiomatic Spark shape:

* fingerprint = md5 of normalized text (the exact-dedup key from
  operators/dedup.py, identical normalization on both batch and stream)
* ``dropDuplicatesWithinWatermark`` keyed on the fingerprint — the state
  store keeps one entry per fingerprint and EVICTS entries older than the
  event-time watermark, so state is bounded by the dedup horizon, not by
  stream lifetime. (Plain ``dropDuplicates`` on a stream grows state
  forever; keying the event time alongside would only dedup equal-ts rows.)

At 100 TB/day this is the only viable shape: state ∝ unique docs per
horizon, shuffled once on the fingerprint — no cross-batch joins, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _norm


def streaming_exact_dedup(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str | None = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop content-duplicate rows across micro-batches.

    ``horizon`` bounds both lateness and the dedup memory: two copies of a
    document arriving within the horizon dedup to one; a copy arriving
    later than the watermark may pass (bounded-state tradeoff, same
    contract as Kafka/Flink dedup operators). With ``event_time_col=None``
    state is unbounded — only for short drain-everything runs.
    """
    fingerprinted = stream_df.withColumn("fp", F.md5(_norm(F.col(text_col))))
    if event_time_col is None:
        return fingerprinted.dropDuplicates(["fp"])
    return fingerprinted.withWatermark(
        event_time_col, horizon
    ).dropDuplicatesWithinWatermark(["fp"])
