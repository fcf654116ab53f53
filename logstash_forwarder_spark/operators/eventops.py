"""Event flow-control operators — the logstash `throttle` and `elapsed`
filters re-expressed relationally.

The forwarder ships events and leaves rate control / latency pairing to
the downstream stack (reference: the event channel the spooler feeds,
`spooler.go:7-62`, has no per-key policy at all); these are the two
filters a log pipeline reaches for first once volume matters.

* ``throttle`` — per-key, per-period admission cap: the first
  ``max_per_period`` events of each (key, period) pass, the rest are
  flagged. ``row_number`` over (key, date_trunc(period, ts)) — the
  window partition is bounded by exactly the hot-key volume the cap
  exists to contain, so the skewed key that motivates throttling is
  also the one whose partition the cap keeps finite.
* ``elapsed`` — start/end event pairing: per correlation key, the first
  *start*-type event opens a span, the earliest *end*-type event at or
  after it closes it. Two hash-aggs and one equi-join on the key —
  never a window over raw interleaved events, so no per-key sort of
  the full stream.

Both are pure DataFrame plans: no UDF, no Python, oracle-checkable SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def throttle(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    period: str = "hour",
    max_per_period: int = 3,
) -> DataFrame:
    """Flag events beyond ``max_per_period`` per (key, period).

    Adds ``period_start`` (date_trunc of ``ts_col``) and ``throttled``
    (boolean). Admission order is (ts, tiebreak) within the period —
    deterministic under replay, matching the registrar's replay-stable
    identity discipline.
    """
    per = F.date_trunc(period, F.col(ts_col))
    w = (
        Window.partitionBy(F.col(key_col), per)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
    )
    rn = F.row_number().over(w)
    return events.withColumn("period_start", per).withColumn(
        "throttled", rn > F.lit(max_per_period)
    )


def elapsed(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "signup",
    end_type: str = "purchase",
) -> DataFrame:
    """Pair each key's FIRST ``start_type`` event with the EARLIEST
    ``end_type`` event at-or-after it; emit one row per key that has a
    start: ``key``, ``start_ts``, ``end_ts`` (NULL when never closed),
    and ``elapsed_us`` (microseconds, NULL when open).

    Plan: one hash-agg for starts (min ts per key), one equi-join back
    to the end-typed subset with the at-or-after predicate riding the
    join, one closing hash-agg — both aggs are map-side-combinable and
    the join is a key equi-join, so the only data-sized exchange is on
    the correlation key.
    """
    starts = (
        events.filter(F.col(type_col) == start_type)
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("start_ts"))
    )
    ends = events.filter(F.col(type_col) == end_type).select(
        F.col(key_col).alias("__k"), F.col(ts_col).alias("__end")
    )
    joined = starts.join(
        ends,
        (starts[key_col] == ends["__k"]) & (F.col("__end") >= F.col("start_ts")),
        "left",
    )
    out = joined.groupBy(key_col, "start_ts").agg(
        F.min("__end").alias("end_ts")
    )
    micros = F.expr("timestampdiff(MICROSECOND, start_ts, end_ts)")
    return out.withColumn("elapsed_us", micros.cast("long"))
