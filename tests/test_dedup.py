"""Dedup operator tests: planted duplicates must be found; disjoint docs
must not pair; minhash estimates must track exact Jaccard."""

from __future__ import annotations

from logstash_forwarder_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one word differs
FAR = "completely different text about spark shuffles and parquet readers here"


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE.upper()),  # exact dup after normalization
        (3, NEAR),  # near dup
        (4, FAR),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    got = exact_duplicates(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].keeper == 1


def test_dedup_exact_keeps_one(spark):
    kept = dedup_exact(_docs(spark))
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3, 4, 5]


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(r.shingle for r in shingles(df, n=3).collect())
    assert got == ["a b c", "b c d"]
    # short doc: no 3-shingles
    df2 = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert shingles(df2, n=3).count() == 0


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold_pct=50).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in got  # identical after norm → jaccard 100
    assert (1, 3) in got  # one word change in a 20-word doc
    assert all(4 not in p for p in got)  # disjoint text never pairs


def test_minhash_lsh_pairs(spark):
    pairs = minhash_lsh_pairs(_docs(spark)).collect()
    got = {(r.doc_a, r.doc_b): r.est_jaccard_pct for r in pairs}
    assert got.get((1, 2)) == 100  # identical signatures
    assert (1, 3) in got and got[(1, 3)] >= 30  # near dup collides in a band
    assert all(4 not in p for p in got)


LONG_BASE = " ".join(
    f"token{i} word{i % 7} item{i % 11}" for i in range(40)
)  # 120 words → 118 shingles
LONG_NEAR = LONG_BASE.replace("token39", "token39x")  # last word: ≤3 shingles differ


def test_simhash_pairs(spark):
    rows = [(1, LONG_BASE), (2, LONG_BASE.upper()), (3, LONG_NEAR), (4, FAR)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_pairs(df, max_hamming=15, n_chunks=16).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0  # identical sketch
    assert (1, 3) in got  # 3/118 shingles differ → small hamming
    assert all(4 not in p for p in got)
