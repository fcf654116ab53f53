"""Cross-micro-batch streaming dedup: a duplicate document arriving in a
LATER file (= later micro-batch with maxFilesPerTrigger=1) must be dropped
by the fingerprint state store, and the batch/stream fingerprints must
agree (same normalization)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from logstash_forwarder_spark.streaming.dedup_stream import streaming_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # file 1: two docs; file 2: one NEW doc + one duplicate of doc 1 (same
    # text modulo case/whitespace — the normalizer must catch it)
    _write_file(
        spark,
        in_dir,
        [(1, "alpha beta gamma", t0), (2, "delta epsilon", t0)],
    )
    _write_file(
        spark,
        in_dir,
        [(3, "zeta eta theta", t0), (4, "  ALPHA   BETA GAMMA ", t0)],
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    deduped = streaming_exact_dedup(stream, horizon="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT doc_id, fp FROM dedup_out").collect()
    ids = sorted(r.doc_id for r in got)
    # doc 4 is a content-duplicate of doc 1 arriving in a later micro-batch
    assert ids == [1, 2, 3]
    # stream fingerprints equal the batch operator's fingerprints
    batch_fp = {
        r.doc_id: r.fp
        for r in spark.read.parquet(in_dir)
        .withColumn(
            "fp",
            F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))),
        )
        .collect()
    }
    for r in got:
        assert r.fp == batch_fp[r.doc_id]
    assert batch_fp[4] == batch_fp[1]  # the duplicate really collides
