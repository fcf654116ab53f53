"""Watermark semantics of the streaming windowed aggregation: a window is
emitted exactly once after the watermark passes its end, and a row arriving
later than the watermark is dropped — never a retraction in append mode."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import types as T

from logstash_forwarder_spark.streaming.windowed import windowed_source_counts

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tok", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_SEQ = iter(range(1, 100))


def _write_file(spark, path, rows):
    # FileStreamSource gives no arrival-order guarantee for files already
    # present at start (part-file names are uuid-random); pin BOTH the path
    # order and the mtime order so micro-batch order is deterministic
    idx = next(_SEQ)
    stage = f"{path}__stage{idx}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        stage
    )
    os.makedirs(path, exist_ok=True)
    (part,) = glob.glob(f"{stage}/part-*.parquet")
    dest = os.path.join(path, f"{idx:02d}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(stage, ignore_errors=True)
    os.utime(dest, (idx * 1000, idx * 1000))


def test_late_row_dropped_and_window_final(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    h12 = dt.datetime(2026, 1, 1, 12, 0, 0)

    # batch 1: two rows inside the 12:00 window
    _write_file(
        spark,
        in_dir,
        [
            (1, "s0", 10, h12 + dt.timedelta(minutes=1)),
            (2, "s0", 20, h12 + dt.timedelta(minutes=30)),
        ],
    )
    # batch 2: a 15:00 row — after this batch the watermark is 14:00
    # (15:00 − 1 h lateness), which closes the 12:00 window
    _write_file(spark, in_dir, [(3, "s0", 5, h12 + dt.timedelta(hours=3))])
    # batch 3: one more on-time row. Spark filters late input against the
    # PREVIOUS trigger's watermark (eventTimeWatermarkForLateEvents lags
    # eviction by one batch), so this batch is what arms the 14:00 filter
    _write_file(spark, in_dir, [(5, "s0", 7, h12 + dt.timedelta(hours=3, minutes=10))])
    # batch 4: a LATE row back in the 12:00 window, behind the watermark —
    # must be dropped, not trigger a corrected re-emission
    _write_file(spark, in_dir, [(4, "s0", 99, h12 + dt.timedelta(minutes=5))])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    agg = windowed_source_counts(
        stream, window_len="1 hour", lateness="1 hour", size_col="n_tok"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM win_out").collect()
    # exactly one finalized window: [12:00, 13:00) with the two on-time rows;
    # the late doc 4 (n_tok=99) is absent, and the still-open 15:00 window
    # has not been emitted
    assert len(rows) == 1
    r = rows[0]
    assert r.win_start == h12 and r.win_end == h12 + dt.timedelta(hours=1)
    assert r.source == "s0" and r.row_count == 2 and r.n_tok_total == 30
    # the late row was dropped by the watermark, not silently merged
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
