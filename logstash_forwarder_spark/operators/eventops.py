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


def aggregate_correlate(
    events: DataFrame,
    *,
    task_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    end_predicate: Column,
    sum_exprs: dict[str, Column] | None = None,
    emit_open: bool = False,
) -> DataFrame:
    """The logstash `aggregate` filter: correlate every event of a task,
    merge fields across the task's events, and emit ONE summary row when
    the task's *end* event arrives (push-map-as-event-on-task-end).

    Reference semantics (public logstash aggregate filter contract): events
    sharing a task id accumulate into a per-task map in arrival order; an
    end-typed event pushes the map as a new event and deletes it, so a
    later event with the same task id opens a FRESH map (a new *span*).
    The relational re-expression: a task's span index is the number of end
    events STRICTLY BEFORE it in (ts, tiebreak) order — a running sum over
    a rows-frame — and the map-merge is a (task, span) hash-agg.

    Emits, per closed span: ``task_cols...``, ``span`` (0-based),
    ``n_events``, ``started_ts`` (first event), ``ended_ts`` (the end
    event), ``span_us`` (microseconds start→end, timezone-free), plus one
    column per ``sum_exprs`` entry (per-row expression summed across the
    span — pre-convert floats to exact integers per the house rule).
    With ``emit_open=True`` the unclosed tail span is emitted too with
    ``timed_out=true`` and NULL ``ended_ts``/``span_us`` — the batch
    analog of push_map_as_event_on_timeout (a closed input IS the
    timeout horizon).

    100 TB shape: ONE exchange on the task key. The window partition is
    bounded by per-task volume (tasks are request/session-sized by
    construction, the same bound `throttle` rides), and the follow-on
    groupBy(task, span) is satisfied by the window's hash(task)
    clustering — same-task rows are already co-located — so Spark plans
    NO second exchange (asserted in tests/test_eventops.py).
    """
    sums = sum_exprs or {}
    is_end = F.when(end_predicate, 1).otherwise(0)
    w = (
        Window.partitionBy(*task_cols)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    span = F.coalesce(F.sum(is_end).over(w), F.lit(0)).cast("long")
    spanned = events.withColumn("__is_end", is_end).withColumn("span", span)
    agg = spanned.groupBy(*task_cols, "span").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("started_ts"),
        F.max(F.when(F.col("__is_end") == 1, F.col(ts_col))).alias("ended_ts"),
        *[F.sum(c).alias(n) for n, c in sums.items()],
    )
    out = agg.withColumn(
        "span_us",
        F.expr("timestampdiff(MICROSECOND, started_ts, ended_ts)").cast("long"),
    ).withColumn("timed_out", F.col("ended_ts").isNull())
    if not emit_open:
        out = out.where(~F.col("timed_out")).drop("timed_out")
    return out


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
