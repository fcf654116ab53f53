"""Streaming spike detector: final stream flags must equal the batch
rate_anomaly query on the same events ACROSS the state-pruning boundary
(>_KEEP distinct hours), with state accumulating over micro-batches."""

from __future__ import annotations

import datetime

from logstash_forwarder_spark.streaming.anomaly import _KEEP, spike_stream

from .conftest import EVENTS_SCHEMA


def _events(h0, hours_counts, eid0=0):
    rows, eid = [], eid0
    for h, n in hours_counts:
        for _ in range(n):
            rows.append(
                (eid, h0 + datetime.timedelta(hours=h), 1, "login", 1.0, "{}")
            )
            eid += 1
    return rows


def test_stream_flags_match_batch_across_pruning(spark, tmp_path):
    from logstash_forwarder_spark.queries import q_rate_anomaly

    h0 = datetime.datetime(2024, 3, 1)
    # 11 distinct hours (> _KEEP = 8): quiet 0-6, 10x burst at 7,
    # then quiet 8-10 — the post-burst batches cross the pruning boundary
    assert 11 > _KEEP
    b1 = _events(h0, [(h, 10) for h in range(6)])
    b2 = _events(h0, [(6, 10), (7, 100)], eid0=len(b1))
    b3 = _events(h0, [(8, 10), (9, 10), (10, 10)], eid0=len(b1) + len(b2))

    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    for i, b in enumerate((b1, b2, b3)):
        w = spark.createDataFrame(b, EVENTS_SCHEMA).coalesce(1).write
        (w if i == 0 else w.mode("append")).parquet(in_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        spike_stream(stream)
        .writeStream.format("memory")
        .queryName("spikes")
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream timed out"

    # only touched hours emit, and a re-touched hour emits with strictly
    # more events — max_by(n_events) is the deterministic latest
    got = {
        (r.event_type, r.hour): (r.n_events, r.trailing_sum, r.spike)
        for r in spark.sql(
            """SELECT event_type, hour,
                      max_by(n_events, n_events) AS n_events,
                      max_by(trailing_sum, n_events) AS trailing_sum,
                      max_by(spike, n_events) AS spike
               FROM spikes GROUP BY event_type, hour"""
        ).collect()
    }

    sf = str(tmp_path / "batchsf")
    spark.createDataFrame(b1 + b2 + b3, EVENTS_SCHEMA).write.parquet(
        f"{sf}/events.parquet"
    )
    want = {
        (r.event_type, r.hour): (r.n_events, r.trailing_sum, r.spike)
        for r in q_rate_anomaly(spark, sf).collect()
    }
    assert got == want
    burst = ("login", "2024-03-01 07")
    assert got[burst][2] == 1  # the planted burst stays flagged
    # post-burst hours see the burst in their trailing window: no flags
    assert all(got[("login", f"2024-03-01 {h:02d}")][2] == 0 for h in (8, 9, 10))
