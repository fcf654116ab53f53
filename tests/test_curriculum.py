"""curriculum_buckets (operators/stats.py): exact global rank by
(length, id) with NO global sort — equals the naive sorted rank on any
input, stays correct on the degenerate all-one-length corpus (the skew
case the two-level prefix sum exists for), and shard sizes follow the
integer (rank-1)*S DIV total formula."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.stats import curriculum_buckets


def _model(rows, n_buckets):
    """Naive reference: sort by (len, id), rank 1..n, shard formula."""
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    total = len(order)
    return {
        doc: (ln, i + 1, i * n_buckets // total)
        for i, (doc, ln) in enumerate(order)
    }


def test_rank_equals_naive_sorted_rank(spark):
    rows = [(i, (i * 37) % 23 + 5) for i in range(500)]  # repeating lengths
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.n_tok, r.rank, r.bucket)
        for r in curriculum_buckets(df, 8, bucket_width=64).collect()
    }
    assert got == _model(rows, 8)


def test_all_same_length_skew_case(spark):
    """One length holding EVERY doc: ranks must still be 1..n (by id) and
    no window partition may exceed one id-bucket (bucket_width)."""
    rows = [(i * 3, 42) for i in range(300)]  # sparse ids, one length
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = curriculum_buckets(df, 4, bucket_width=50).collect()
    got = {r.doc_id: (r.rank, r.bucket) for r in out}
    assert got == {d: (m[1], m[2]) for d, m in _model(rows, 4).items()}
    # shard sizes near-equal: 300/4 = exactly 75 each
    sizes = {}
    for r in out:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert sizes == {0: 75, 1: 75, 2: 75, 3: 75}


def test_bucket_monotone_in_length(spark):
    """Shard boundaries respect the curriculum: max length of shard k <=
    min length of shard k+1 (ties may straddle only via id order, which
    still keeps the length ordering non-decreasing)."""
    rows = [(i, 1000 - i) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    stats = (
        curriculum_buckets(df, 8, bucket_width=97)
        .groupBy("bucket")
        .agg(F.min("n_tok").alias("lo"), F.max("n_tok").alias("hi"))
        .orderBy("bucket")
        .collect()
    )
    assert len(stats) == 8
    for a, b in zip(stats, stats[1:]):
        assert a.hi <= b.lo


def test_empty_and_guardrails(spark):
    import pytest

    df = spark.createDataFrame([], "doc_id long, n_tok long")
    assert curriculum_buckets(df, 4).count() == 0
    with pytest.raises(ValueError):
        curriculum_buckets(df, 0)
