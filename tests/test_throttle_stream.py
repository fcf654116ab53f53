"""Streaming throttle == batch throttle under time-ordered replay —
including a period budget that SPANS a micro-batch boundary (position
check against state, not batch-local rank)."""

from __future__ import annotations

import datetime as dt

from logstash_forwarder_spark.operators.eventops import throttle
from logstash_forwarder_spark.streaming.throttle_stream import throttle_stream

EV_SCHEMA = "event_id long, ts timestamp, user_id long"


def test_throttle_stream_equals_batch(spark, tmp_path):
    t0 = dt.datetime(2026, 3, 1, 0, 0, 0)

    def ev(eid, user, hours):
        return (eid, t0 + dt.timedelta(hours=hours), user)

    rows = [
        # user 1, day 1: budget (2) split across the batch boundary —
        # events 1,2 admitted in batch 1, event 3 throttled in batch 2
        ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 30 - 24),
        # user 1, day 2: fresh budget
        ev(4, 1, 25), ev(5, 1, 26), ev(6, 1, 27),
        # user 2: under budget everywhere
        ev(7, 2, 2), ev(8, 2, 26),
    ]
    rows.sort(key=lambda r: (r[1], r[0]))
    cut = len(rows) // 2
    in_dir = str(tmp_path / "thr_in")
    for chunk in (rows[:cut], rows[cut:]):
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        throttle_stream(stream, period="day", max_per_period=2)
        .writeStream.format("memory")
        .queryName("thr_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.event_id: r.throttled
        for r in spark.sql("SELECT event_id, throttled FROM thr_out").collect()
    }

    batch = {
        r.event_id: r.throttled
        for r in throttle(
            spark.createDataFrame(rows, EV_SCHEMA),
            key_col="user_id",
            period="day",
            max_per_period=2,
        ).collect()
    }
    assert got == batch
    assert got[3] is True and got[1] is False and got[2] is False
    assert got[4] is False and got[5] is False and got[6] is True
