"""Throttle + elapsed + aggregate filters: admission caps, deterministic
tiebreaks, span pairing edge cases, multi-span correlation."""

import datetime as dt

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.eventops import (
    aggregate_correlate,
    elapsed,
    throttle,
)

E_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 10, m, s)


def test_throttle_caps_per_period(spark):
    rows = [
        (1, _ts(0), 1, "x"),
        (2, _ts(1), 1, "x"),
        (3, _ts(2), 1, "x"),
        (4, dt.datetime(2024, 1, 1, 11, 0), 1, "x"),  # next hour: cap resets
        (5, _ts(0), 2, "x"),  # other key: own budget
    ]
    out = throttle(
        spark.createDataFrame(rows, E_SCHEMA),
        key_col="user_id",
        period="hour",
        max_per_period=2,
    )
    got = {r.event_id: r.throttled for r in out.collect()}
    assert got == {1: False, 2: False, 3: True, 4: False, 5: False}


def test_throttle_tiebreak_deterministic(spark):
    # identical timestamps: admission order falls back to event_id
    rows = [(i, _ts(0), 1, "x") for i in (9, 3, 7)]
    out = throttle(
        spark.createDataFrame(rows, E_SCHEMA),
        key_col="user_id",
        period="hour",
        max_per_period=1,
    )
    got = {r.event_id: r.throttled for r in out.collect()}
    assert got == {3: False, 7: True, 9: True}


def test_elapsed_pairs_first_start_earliest_end(spark):
    rows = [
        (1, _ts(0), 1, "start"),
        (2, _ts(5), 1, "start"),  # later start ignored (first opens the span)
        (3, _ts(9), 1, "end"),
        (4, _ts(20), 1, "end"),  # later end ignored (earliest closes it)
        (5, _ts(3), 2, "end"),  # end BEFORE the start: not a close
        (6, _ts(4), 2, "start"),
        (7, _ts(0), 3, "start"),  # never closed
    ]
    out = elapsed(
        spark.createDataFrame(rows, E_SCHEMA),
        key_col="user_id",
        start_type="start",
        end_type="end",
    )
    got = {r.user_id: r for r in out.collect()}
    assert got[1].start_ts == _ts(0) and got[1].end_ts == _ts(9)
    assert got[1].elapsed_us == 9 * 60 * 1_000_000
    assert got[2].end_ts is None and got[2].elapsed_us is None
    assert got[3].end_ts is None
    assert set(got) == {1, 2, 3}  # one row per key with a start


AGG_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double"
)


def _agg_rows():
    # user 1: two closed spans + an open tail; user 2: end-only span;
    # user 3: never closes
    return [
        (1, _ts(0), 1, "view", 1.00),
        (2, _ts(1), 1, "click", 2.00),
        (3, _ts(2), 1, "purchase", 4.00),   # closes span 0 (n=3, 700c, 2min)
        (4, _ts(3), 1, "purchase", 8.00),   # closes span 1 alone (n=1, 800c, 0us)
        (5, _ts(4), 1, "view", 16.00),      # open tail (span 2)
        (6, _ts(0), 2, "purchase", 0.01),   # end with no prior events
        (7, _ts(0), 3, "view", 0.99),       # never closed
    ]


def test_aggregate_correlate_spans(spark):
    df = spark.createDataFrame(_agg_rows(), AGG_SCHEMA)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    out = aggregate_correlate(
        df,
        end_predicate=F.col("event_type") == "purchase",
        sum_exprs={"cents": cents},
    )
    got = {(r.user_id, r.span): r for r in out.collect()}
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    assert (got[(1, 0)].n_events, got[(1, 0)].cents) == (3, 700)
    assert got[(1, 0)].span_us == 2 * 60 * 1_000_000
    assert (got[(1, 1)].n_events, got[(1, 1)].cents, got[(1, 1)].span_us) == (
        1, 800, 0,
    )
    assert (got[(2, 0)].n_events, got[(2, 0)].cents) == (1, 1)


def test_aggregate_correlate_emit_open(spark):
    df = spark.createDataFrame(_agg_rows(), AGG_SCHEMA)
    out = aggregate_correlate(
        df,
        end_predicate=F.col("event_type") == "purchase",
        emit_open=True,
    )
    got = {(r.user_id, r.span): r for r in out.collect()}
    # open tails surface with timed_out=true and NULL close metadata
    assert got[(1, 2)].timed_out and got[(1, 2)].span_us is None
    assert got[(3, 0)].timed_out and got[(3, 0)].n_events == 1
    assert not got[(1, 0)].timed_out


def test_aggregate_correlate_single_exchange(spark):
    """The span window's hash(user_id) clustering satisfies the
    (user_id, span) group-by: ONE Exchange in the whole plan."""
    df = spark.createDataFrame(_agg_rows(), AGG_SCHEMA)
    out = aggregate_correlate(
        df, end_predicate=F.col("event_type") == "purchase"
    )
    out.collect()  # settle AQE on the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial plan sections; count only the final one
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final
