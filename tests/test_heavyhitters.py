"""Two-pass Misra-Gries heavy hitters: exactness vs a pandas oracle on
skewed random corpora, the capacity guard, and the MG merge invariants."""

import numpy as np
import pytest

from logstash_forwarder_spark.operators.heavyhitters import (
    _mg_merge,
    heavy_hitters,
)


def _exact_bigrams(texts):
    from collections import Counter

    c = Counter()
    n = 0
    for t in texts:
        w = " ".join(t.split()).lower().strip().split(" ")
        for a, b in zip(w, w[1:]):
            c[f"{a} {b}"] += 1
            n += 1
    return c, n


def _rand_corpus(rng, n_docs=400, vocab=60, zipf_a=1.6):
    # zipf-ish word draw → genuinely heavy bigrams plus a long tail
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for _ in range(n_docs):
        ln = int(rng.integers(3, 25))
        idx = np.minimum(rng.zipf(zipf_a, ln) - 1, vocab - 1)
        docs.append(" ".join(words[i] for i in idx))
    return docs


@pytest.mark.parametrize("seed", [1, 7])
def test_exact_on_skewed_corpus(spark, seed):
    rng = np.random.default_rng(seed)
    docs = _rand_corpus(rng)
    exact, n = _exact_bigrams(docs)
    inv = 200
    want = {g: c for g, c in exact.items() if c * inv > n}
    df = spark.createDataFrame([(d,) for d in docs], "text string").repartition(8)
    got = {
        r.gram: r.cnt
        for r in heavy_hitters(
            df, inv_threshold=inv, capacity=256
        ).collect()
    }
    assert got == want and want  # non-vacuous: skew guarantees hitters


def test_small_capacity_still_exact_at_its_threshold(spark):
    # capacity equal to inv_threshold is the boundary the proof needs
    rng = np.random.default_rng(3)
    docs = _rand_corpus(rng, n_docs=150)
    exact, n = _exact_bigrams(docs)
    inv = 64
    want = {g: c for g, c in exact.items() if c * inv > n}
    df = spark.createDataFrame([(d,) for d in docs], "text string").repartition(4)
    got = {
        r.gram: r.cnt
        for r in heavy_hitters(df, inv_threshold=inv, capacity=64).collect()
    }
    assert got == want


def test_capacity_guard(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="can miss"):
        heavy_hitters(df, inv_threshold=700, capacity=100)


def test_mg_merge_error_bound():
    # after merging a stream in chunks, every retained estimate must
    # satisfy true - n/k <= est <= true (the MG invariant)
    rng = np.random.default_rng(11)
    k = 16
    stream = np.minimum(rng.zipf(1.3, 5000) - 1, 99)
    sketch = {}
    for chunk in np.array_split(stream, 13):
        u, c = np.unique(chunk, return_counts=True)
        _mg_merge(sketch, u.astype(np.int64), c.astype(np.int64),
                  [str(x) for x in u], k)
    assert len(sketch) <= k
    true = {int(v): int(c) for v, c in zip(*np.unique(stream, return_counts=True))}
    bound = len(stream) / k
    for h, (est, _rep) in sketch.items():
        assert est <= true[h]
        assert true[h] - est <= bound
    # every item above the bound must be IN the sketch
    for v, c in true.items():
        if c > bound:
            assert v in sketch
