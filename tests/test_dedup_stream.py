"""Cross-micro-batch streaming dedup: a duplicate document arriving in a
LATER file (= later micro-batch with maxFilesPerTrigger=1) must be dropped
by the fingerprint state store, and the batch/stream fingerprints must
agree (same normalization)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from logstash_forwarder_spark.streaming.dedup_stream import streaming_exact_dedup

SCHEMA_STR = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

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


def test_streaming_minhash_candidates_equal_batch(spark, tmp_path):
    """Batch ≡ stream: the streaming near-dup candidate stage must find
    exactly the batch minhash_lsh_pairs set — including pairs whose two
    members arrive in DIFFERENT micro-batches."""
    import random

    from logstash_forwarder_spark.operators.dedup import minhash_lsh_pairs
    from logstash_forwarder_spark.streaming.dedup_stream import (
        streaming_minhash_candidates,
    )

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(200)]

    def text():
        return " ".join(rng.choice(vocab) for _ in range(30))

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    docs = []
    for i in range(12):
        base = text()
        words = base.split()
        words[rng.randrange(len(words))] = rng.choice(vocab)
        near = " ".join(words)
        docs.append((f"d{i:03d}a", base, t0))
        docs.append((f"d{i:03d}b", near, t0))
    for i in range(16):
        docs.append((f"u{i:03d}", text(), t0))
    rng.shuffle(docs)

    bdf = spark.createDataFrame(docs, SCHEMA_STR)
    batch = {
        (r.doc_a, r.doc_b, r.est_jaccard_pct)
        for r in minhash_lsh_pairs(bdf).collect()
    }
    assert len(batch) >= 10  # the planted near-dups actually collide

    # stream the same rows as two files = two micro-batches, split so that
    # several planted pairs straddle the boundary
    in_dir = str(tmp_path / "nd_in")
    half = len(docs) // 2
    straddle = sum(
        1
        for i in range(12)
        if (any(d[0] == f"d{i:03d}a" for d in docs[:half]))
        != (any(d[0] == f"d{i:03d}b" for d in docs[:half]))
    )
    assert straddle >= 3  # the boundary really cuts through pairs
    spark.createDataFrame(docs[:half], SCHEMA_STR).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    spark.createDataFrame(docs[half:], SCHEMA_STR).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = (
        spark.readStream.schema(SCHEMA_STR)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        streaming_minhash_candidates(stream, horizon="1 hour")
        .writeStream.format("memory")
        .queryName("nd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r.doc_a, r.doc_b, r.est_jaccard_pct)
        for r in spark.sql(
            "SELECT doc_a, doc_b, est_jaccard_pct FROM nd_out"
        ).collect()
    ]
    # exactly-once emission: MULTISET equality, no downstream distinct —
    # a pair colliding in several bands is emitted by its minimal band only
    assert len(got) == len(set(got))
    assert set(got) == batch


def test_streaming_minhash_replay_is_idempotent(spark, tmp_path):
    """An at-least-once upstream replaying a document in a later micro-batch
    must not duplicate bucket state or re-emit its pairs: output equals the
    batch pair set of the DEDUPED corpus, each pair exactly once."""
    import datetime as dt

    from logstash_forwarder_spark.operators.dedup import minhash_lsh_pairs
    from logstash_forwarder_spark.streaming.dedup_stream import (
        streaming_minhash_candidates,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    rows1 = [("a", base, t0), ("x", "completely different words here entirely", t0)]
    rows2 = [("a", base, t0), ("b", near, t0)]  # 'a' replayed, 'b' new

    in_dir = str(tmp_path / "rp_in")
    spark.createDataFrame(rows1, SCHEMA_STR).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(rows2, SCHEMA_STR).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(SCHEMA_STR)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        streaming_minhash_candidates(stream, horizon="1 hour")
        .writeStream.format("memory")
        .queryName("rp_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.doc_a, r.doc_b, r.est_jaccard_pct)
        for r in spark.sql("SELECT * FROM rp_out").collect()
    ]
    deduped = spark.createDataFrame(
        [("a", base, t0), ("x", "completely different words here entirely", t0), ("b", near, t0)],
        SCHEMA_STR,
    )
    batch = {
        (r.doc_a, r.doc_b, r.est_jaccard_pct)
        for r in minhash_lsh_pairs(deduped).collect()
    }
    assert set(got) == batch
    assert len(got) == len(set(got))  # exactly once, even across bands
    assert ("a", "a", 100) not in set(got)  # replay produced no self-pair


def test_streaming_minhash_int64_ids(spark, tmp_path):
    """ADVICE r3: id typing must follow id_col's actual type — int64
    doc_ids (the repo's canonical documents schema) must round-trip the
    applyInPandasWithState boundary, state ids included."""
    import datetime as dt

    from logstash_forwarder_spark.streaming.dedup_stream import (
        streaming_minhash_candidates,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    in_dir = str(tmp_path / "int_in")
    spark.createDataFrame([(7, base, t0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    spark.createDataFrame([(9, near, t0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        streaming_minhash_candidates(stream, horizon="1 hour")
        .writeStream.format("memory")
        .queryName("int_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.doc_a, r.doc_b) for r in spark.sql("SELECT * FROM int_out").collect()
    ]
    assert got == [(7, 9)]
    assert all(isinstance(a, int) and isinstance(b, int) for a, b in got)
