"""Watermarked stream-stream join — event attribution over the live flow.

The log-pipeline shape: match each action event (e.g. ``purchase``) to
EVERY trigger event (e.g. ``login``) of the same user within a time
bound, as both arrive on the stream — one output row per (trigger,
action) pair; collapsing to the most recent trigger is a downstream
``groupBy(action).agg(max_by(...))`` over this append stream.
Structured Streaming's stream-stream inner join with watermarks on BOTH
sides + a time-interval join condition
keeps state bounded: each side buffers only rows younger than its
watermark, and the interval condition lets the engine evict trigger rows
older than ``within`` from the join state (the state-cleanup contract the
watermark exists for).

Semantics are append-only and deterministic: a (trigger, action) pair is
emitted exactly when both sides have arrived and the action's timestamp
lies in [trigger_ts, trigger_ts + within]. Late rows beyond the watermark
are dropped by the engine (counted in the progress metrics), the same
late-data policy as streaming/windowed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    events_stream: DataFrame,
    trigger_type: str = "login",
    action_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, trigger_ts, action_ts, action_value) for every action
    within ``within`` of the same user's trigger."""
    trig = (
        events_stream.filter(F.col("event_type") == trigger_type)
        .select(
            F.col("user_id").alias("t_user"),
            F.col("ts").alias("trigger_ts"),
        )
        .withWatermark("trigger_ts", watermark)
    )
    act = (
        events_stream.filter(F.col("event_type") == action_type)
        .select(
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("action_ts"),
            F.col("value").alias("action_value"),
        )
        .withWatermark("action_ts", watermark)
    )
    joined = trig.join(
        act,
        F.expr(
            f"""t_user = a_user
                AND action_ts >= trigger_ts
                AND action_ts <= trigger_ts + interval {within}"""
        ),
    )
    return joined.select(
        F.col("t_user").alias("user_id"),
        "trigger_ts",
        "action_ts",
        "action_value",
    )
