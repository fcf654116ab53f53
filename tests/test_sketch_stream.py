"""Count-Min on a STREAM: cms_build is a plain groupBy aggregation, so
the identical operator call runs on a streaming DataFrame (complete
mode) and, after all micro-batches, the counters equal the batch sketch
bit-for-bit — the bounded-state frequency monitor for the live-tail
path (the metrics-filter analog: per-key rates without per-key state).
Also proves sketch mergeability: shard-local sketches merged with
cms_merge equal the sketch of the union."""

from __future__ import annotations

import numpy as np

from logstash_forwarder_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _write_keys(spark, path, keys, n_files):
    df = spark.createDataFrame([(int(k),) for k in keys], "h long")
    df.repartition(n_files).write.parquet(path)


def test_streaming_cms_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 200, size=5000).astype(np.int64) * 31 + 11
    _write_keys(spark, in_dir, keys, n_files=4)

    width = 32
    batch = sorted(
        map(tuple, cms_build(spark.read.parquet(in_dir), "h", width=width).collect())
    )

    stream = (
        spark.readStream.schema("h long")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(in_dir)
    )
    q = (
        cms_build(stream, "h", width=width)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM cms_stream").collect())
    )
    assert streamed == batch and len(streamed) > 0


def test_cms_merge_is_union(spark):
    rng = np.random.default_rng(13)
    a = (rng.integers(0, 100, size=3000).astype(np.int64) * 13 + 1).tolist()
    b = (rng.integers(50, 150, size=3000).astype(np.int64) * 13 + 1).tolist()
    width = 32
    df_a = spark.createDataFrame([(k,) for k in a], "h long")
    df_b = spark.createDataFrame([(k,) for k in b], "h long")
    merged = cms_merge(
        cms_build(df_a, "h", width=width), cms_build(df_b, "h", width=width)
    )
    whole = cms_build(df_a.unionByName(df_b), "h", width=width)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # and estimates from the merged sketch keep the one-sided guarantee
    probes = spark.createDataFrame(
        [(k,) for k in sorted(set(a))[:50]], "h long"
    )
    est = {
        r.h: r.est
        for r in cms_estimate(probes, "h", merged, width=width).collect()
    }
    from collections import Counter

    exact = Counter(a) + Counter(b)
    assert all(est[k] >= exact[k] for k in est)


def test_streaming_hll_equals_batch(spark, tmp_path):
    """hll_registers is one idempotent-max hash-agg, so the identical
    call runs on a streaming DataFrame (complete mode) and the final
    registers equal the batch sketch — live distinct-cardinality
    monitoring with <= m rows of state."""
    from logstash_forwarder_spark.operators.sketch import hll_registers

    in_dir = str(tmp_path / "hin")
    rng = np.random.default_rng(21)
    keys = rng.integers(0, 2**50, size=4000).astype(np.int64)
    _write_keys(spark, in_dir, keys, n_files=4)

    batch = sorted(
        map(tuple, hll_registers(spark.read.parquet(in_dir), "h", m=64).collect())
    )
    stream = (
        spark.readStream.schema("h long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        hll_registers(stream, "h", m=64)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM hll_stream").collect())
    )
    assert streamed == batch and len(streamed) > 0


def test_cms_merge_width_guard(spark):
    """Merging sketches of different widths with the width guard set
    fails loudly (the min-over-d bound would silently break)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    rng = np.random.default_rng(3)
    keys = (rng.integers(0, 50, size=500).astype(np.int64) * 7 + 1).tolist()
    df = spark.createDataFrame([(k,) for k in keys], "h long")
    narrow = cms_build(df, "h", width=32)
    wide = cms_build(df, "h", width=64)
    with pytest.raises(Exception) as ei:
        cms_merge(narrow, wide, width=32).collect()
    assert "geometr" in str(ei.value) or "assert" in str(ei.value).lower()
    # same-width merge under the guard stays clean
    ok = cms_merge(narrow, cms_build(df, "h", width=32), width=32)
    assert ok.count() > 0
