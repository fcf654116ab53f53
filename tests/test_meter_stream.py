"""Sliding-window streaming meter (streaming/meter_stream.py): append-
mode sliding windows across micro-batch boundaries equal (a) the same
call on the batch DataFrame and (b) the batch RANGE-frame trailing
count of queries.q_meter_rates, window for window."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logstash_forwarder_spark.streaming.meter_stream import sliding_meter

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_SEQ = iter(range(1, 100))


def _write_file(spark, path, rows):
    # deterministic micro-batch order: pinned names + mtimes (see
    # test_windowed_stream.py for the FileStreamSource rationale)
    idx = next(_SEQ)
    stage = f"{path}__stage{idx}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    os.makedirs(path, exist_ok=True)
    (part,) = glob.glob(f"{stage}/part-*.parquet")
    dest = os.path.join(path, f"{idx:02d}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(stage, ignore_errors=True)
    os.utime(dest, (idx * 1000, idx * 1000))


def _ts(minute, second=0):
    return dt.datetime(2024, 3, 1, 10, minute, second)


def test_sliding_meter_stream_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    # batch 1: minutes 0-3, two types; batch 2: minutes 4-9 — a 5-minute
    # window spanning the batch boundary (minutes 1-5) must merge counts
    # from both batches; minute 7 is silent for type a (gap handling).
    rows1 = [("a", _ts(0, 5)), ("a", _ts(1, 10)), ("b", _ts(1, 30)),
             ("a", _ts(2, 0)), ("a", _ts(3, 59)), ("b", _ts(3, 1))]
    rows2 = [("a", _ts(4, 20)), ("b", _ts(5, 5)), ("a", _ts(6, 40)),
             ("a", _ts(8, 15)), ("b", _ts(9, 50)), ("a", _ts(20, 0))]
    _write_file(spark, in_dir, rows1)
    _write_file(spark, in_dir, rows2)

    batch_df = spark.read.schema(SCHEMA).parquet(in_dir)
    batch = {
        (r.key, r.win_end): r.n for r in sliding_meter(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        sliding_meter(stream)
        .writeStream.format("memory")
        .queryName("meter_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.win_end): r.n
        for r in spark.sql("SELECT * FROM meter_stream").collect()
    }

    # every emitted window matches the batch count exactly
    assert got, "no windows were finalized"
    for k, n in got.items():
        assert batch[k] == n, k
    # the final event (minute 20) pushes the watermark far enough that
    # every window over minutes 0-9 is closed and emitted
    closed = {k: n for k, n in batch.items() if k[1] <= _ts(15)}
    assert set(closed) <= set(got)
    # spot-check the boundary-spanning window [1,6): events from BOTH
    # micro-batches (minutes 1,2,3 in batch 1 + 4,5 in batch 2)
    assert got[("a", _ts(6))] == 4 and got[("b", _ts(6))] == 3


def test_sliding_meter_matches_range_frame(spark, tmp_path):
    """The sliding window [M-4, M+1) equals the batch RANGE frame
    trailing count at minute M — the q_meter_rates n_5m contract."""
    in_dir = str(tmp_path / "ev2")
    rows = [
        ("a", _ts(m, s))
        for m, s in [(0, 1), (0, 30), (1, 0), (3, 12), (4, 4), (6, 59),
                     (10, 0), (11, 30), (11, 45), (12, 0)]
    ]
    _write_file(spark, in_dir, rows)
    ev = spark.read.schema(SCHEMA).parquet(in_dir)

    minute = F.floor(F.unix_timestamp("ts") / 60).cast("long")
    per_min = ev.groupBy(F.col("event_type").alias("key"), minute.alias("m")).agg(
        F.count(F.lit(1)).alias("n_1m")
    )
    w5 = W.partitionBy("key").orderBy("m").rangeBetween(-4, 0)
    trailing = {
        (r.key, r.m): r.n5
        for r in per_min.select(
            "key", "m", F.sum("n_1m").over(w5).alias("n5")
        ).collect()
    }
    sliding = {
        (r.key, r.win_end): r.n for r in sliding_meter(ev).collect()
    }
    # minute number -> the window end datetime, by pure arithmetic from
    # the fixture's base (no tz round-trips: both sides stay naive)
    m0 = min(r.m for r in per_min.collect())
    for (key, m), n5 in trailing.items():
        win_end = _ts(0) + dt.timedelta(minutes=int(m - m0) + 1)
        assert sliding[(key, win_end)] == n5, (key, m)
