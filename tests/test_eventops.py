"""Throttle + elapsed filters: admission caps, deterministic tiebreaks,
span pairing edge cases."""

import datetime as dt

from logstash_forwarder_spark.operators.eventops import elapsed, throttle

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
