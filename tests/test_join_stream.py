"""Stream-stream attribution join: planted trigger/action pairs across
micro-batches must match the equivalent batch join exactly."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from logstash_forwarder_spark.streaming.join_stream import attribution_join

from .conftest import EVENTS_SCHEMA


def test_attribution_join_matches_batch(spark, tmp_path):
    t0 = datetime.datetime(2024, 5, 1, 12, 0)

    def ev(eid, minutes, user, etype, value=0.0):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user, etype, value, "{}")

    # batch 1: logins; batch 2: purchases (cross-batch matching is the point)
    b1 = [
        ev(1, 0, 100, "login"),
        ev(2, 5, 200, "login"),
        ev(3, 10, 300, "login"),
    ]
    b2 = [
        ev(10, 30, 100, "purchase", 9.5),   # within 1h of login@0 → match
        ev(11, 70, 200, "purchase", 3.25),  # 65 min after login@5 → no match
        ev(12, 20, 999, "purchase", 1.0),   # no login for this user
        ev(13, 40, 100, "purchase", 2.0),   # second action, same trigger → match
    ]
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(b1, EVENTS_SCHEMA).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(b2, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        attribution_join(stream)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream timed out"

    got = {
        (r.user_id, r.trigger_ts, r.action_ts, r.action_value)
        for r in spark.sql("SELECT * FROM attrib").collect()
    }

    all_events = spark.read.parquet(in_dir)
    trig = all_events.filter(F.col("event_type") == "login").select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("trigger_ts")
    )
    act = all_events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("action_ts"),
        F.col("value").alias("action_value"),
    )
    want = {
        (r.t_user, r.trigger_ts, r.action_ts, r.action_value)
        for r in trig.join(
            act,
            F.expr(
                "t_user = a_user AND action_ts >= trigger_ts "
                "AND action_ts <= trigger_ts + interval 1 hour"
            ),
        ).collect()
    }
    assert got == want
    assert {(u, a) for u, _, _, a in got} == {(100, 9.5), (100, 2.0)}
