"""Bigram LM quality scoring (operators/lm.py)."""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.lm import (
    bigram_model,
    bigram_relation,
    lm_score,
)


def _py_scores(texts: dict[int, str]):
    """Independent Python reference: MLE bigram model over the corpus,
    per-doc integer-ppm sum + float logprob."""
    bags = {
        i: [w for w in t.lower().split() if w]
        for i, t in texts.items()
    }
    bigrams = {
        i: list(zip(ws, ws[1:])) for i, ws in bags.items() if len(ws) >= 2
    }
    cb: Counter = Counter()
    cw: Counter = Counter()
    for bgs in bigrams.values():
        for w1, w2 in bgs:
            cb[(w1, w2)] += 1
            cw[w1] += 1
    out = {}
    for i, bgs in bigrams.items():
        ppm = sum((cb[(w1, w2)] * 1_000_000) // cw[w1] for w1, w2 in bgs)
        lp = sum(math.log(cb[(w1, w2)] / cw[w1]) for w1, w2 in bgs)
        out[i] = (len(bgs), ppm, ppm // len(bgs), lp)
    return out


def test_bigram_relation_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a"), (3, "  x   y "), (4, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.w1, r.w2) for r in bigram_relation(df).collect()
    )
    # doc 2 (one token), doc 4 (empty) contribute nothing; whitespace runs
    # in doc 3 collapse so no empty tokens appear.
    assert rows == [
        (1, "a", "b"),
        (1, "a", "b"),
        (1, "b", "a"),
        (1, "b", "c"),
        (3, "x", "y"),
    ]


def test_lm_score_hand_case(spark):
    # cw: a->2, b->2; cb: (a,b)->2, (b,a)->1, (b,c)->1
    # doc1 bigrams ab, ba, ab, bc -> ppm 1e6 + 5e5 + 1e6 + 5e5 = 3e6
    df = spark.createDataFrame(
        [(1, "a b a b c"), (3, "x y")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_score(df).collect()}
    assert got[1].n_bigrams == 4
    assert got[1].cond_ppm_sum == 3_000_000
    assert got[1].mean_cond_ppm == 750_000
    assert abs(got[1].lm_logprob - 2 * math.log(0.5)) < 1e-12
    # doc 3's bigram (x,y) is the only x-left bigram: p = 1 exactly
    assert got[3].cond_ppm_sum == 1_000_000
    assert got[3].lm_logprob == 0.0


def test_lm_score_randomized_vs_python_reference(spark):
    rng = random.Random(20260818)
    vocab = [f"w{k}" for k in range(12)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for i in range(80)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    want = _py_scores(texts)
    got = {
        r.doc_id: (r.n_bigrams, r.cond_ppm_sum, r.mean_cond_ppm, r.lm_logprob)
        for r in lm_score(df).collect()
    }
    assert set(got) == set(want)
    for i, (nb, ppm, mean, lp) in want.items():
        gnb, gppm, gmean, glp = got[i]
        assert (gnb, gppm, gmean) == (nb, ppm, mean), i
        assert abs(glp - lp) < 1e-9, i


def test_lm_model_is_vocab_sized_and_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, "a b c a b") for i in range(50)], "doc_id long, text string"
    )
    model = bigram_model(bigram_relation(df))
    # 50 identical docs realize exactly 3 bigram types over 3 words:
    # the model relation scales with vocab, not with corpus rows.
    rows = model.collect()
    assert len(rows) == 3
    assert {(r.w1, r.w2, r.cb, r.cw) for r in rows} == {
        ("a", "b", 100, 100), ("b", "c", 50, 50), ("c", "a", 50, 50),
    }
    plan = lm_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_lm_score_probabilities_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"t{i % 7} u{i % 3} t{(i + 1) % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    bad = lm_score(df).where(
        (F.col("mean_cond_ppm") < 0) | (F.col("mean_cond_ppm") > 1_000_000)
        | (F.col("lm_logprob") > 1e-12)
    )
    assert bad.count() == 0
