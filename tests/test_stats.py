"""length_quantiles: exact bounded-domain quantiles must agree with a
naive Python quantile_disc on hand-countable data, and the plan must
never sort or window the raw rows — only the histogram."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.stats import length_quantiles


def _naive_disc(values: list[int], p: int) -> int:
    """Smallest v whose cumulative count >= ceil(p/100 * n)."""
    s = sorted(values)
    need = math.ceil(p / 100 * len(s))
    return s[need - 1]


def test_quantiles_match_naive(spark):
    data = {
        "a": [5, 1, 3, 3, 9, 2, 2, 2],
        "b": [10],
        "c": [7, 7, 7, 7],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    out = {r.source: r for r in length_quantiles(df).collect()}
    for g, vs in data.items():
        r = out[g]
        assert r.n_docs == len(vs)
        for p in (25, 50, 75, 95):
            assert r[f"p{p}"] == _naive_disc(vs, p), (g, p)


def test_quantiles_tie_heavy_domain(spark):
    # every value identical: all quantiles collapse to it
    df = spark.createDataFrame([("x", 4)] * 50, "source string, n_tok long")
    r = length_quantiles(df).collect()[0]
    assert (r.p25, r.p50, r.p75, r.p95) == (4, 4, 4, 4) and r.n_docs == 50


def test_window_runs_on_histogram_not_raw(spark):
    """The Window must consume the HashAggregate output (histogram), never
    the scan: in the executed plan the Window sits strictly above the
    final aggregate, and there is no Sort over the raw relation."""
    df = spark.createDataFrame(
        [("s", i % 7) for i in range(1000)], "source string, n_tok long"
    )
    q = length_quantiles(df)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the Window's child chain must include the histogram HashAggregate
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:], plan


def test_mixture_weights_hand_math(spark):
    from logstash_forwarder_spark.operators.stats import mixture_weights

    # tokens: a=600, b=300, c=100 → total=1000, k=3, budget=333.33/group
    rows = [("a", 600), ("b", 300), ("c", 100)]
    df = spark.createDataFrame(
        [(g, v) for g, v in rows], "source string, n_tok long"
    )
    out = {r.source: r for r in mixture_weights(df).collect()}
    assert out["a"].tok_total == 600 and out["a"].share_ppm == 600000
    # a is over budget: keep (1000/3)/600 → 555555 ppm
    assert out["a"].weight_ppm == 555555
    # b, c at or under budget: keep everything
    assert out["b"].weight_ppm == 1000000
    assert out["c"].weight_ppm == 1000000


def test_mixture_weights_uniform_corpus_keeps_all(spark):
    from logstash_forwarder_spark.operators.stats import mixture_weights

    df = spark.createDataFrame(
        [(f"s{i}", 100) for i in range(5)], "source string, n_tok long"
    )
    assert all(
        r.weight_ppm == 1000000 and r.share_ppm == 200000
        for r in mixture_weights(df).collect()
    )


def test_rebalance_application_semantics(spark):
    """Applying mixture weights: under-budget sources keep every row;
    the over-budget source is thinned; the kept set is identical at any
    input partitioning (hash Bernoulli is row-intrinsic)."""
    from pyspark.sql import functions as F

    from logstash_forwarder_spark.operators.stats import mixture_weights

    rows = [(i, "big", 10) for i in range(400)] + [
        (1000 + i, "small", 10) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    w = mixture_weights(df)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "source")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    kept = df.join(F.broadcast(w.select("source", "weight_ppm")), "source").filter(
        bucket < F.col("weight_ppm")
    )
    by_src = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["small"] == 20          # under budget: untouched
    assert 0 < by_src["big"] < 400        # over budget: thinned, not emptied
    ids1 = sorted(r.doc_id for r in kept.select("doc_id").collect())
    kept2 = (
        df.repartition(13)
        .join(F.broadcast(w.select("source", "weight_ppm")), "source")
        .filter(bucket < F.col("weight_ppm"))
    )
    assert sorted(r.doc_id for r in kept2.select("doc_id").collect()) == ids1


def test_quantiles_randomized_many_groups(spark):
    """One-shot randomized sweep: 50 groups with random sizes/values/ties,
    every percentile checked against the naive reference."""
    import random

    rng = random.Random(7)
    data = {
        f"g{i}": [rng.randint(0, 40) for _ in range(rng.randint(1, 60))]
        for i in range(50)
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, n_tok long").repartition(7)
    out = {r.source: r for r in length_quantiles(df).collect()}
    assert set(out) == set(data)
    for g, vs in data.items():
        for p in (25, 50, 75, 95):
            assert out[g][f"p{p}"] == _naive_disc(vs, p), (g, p, sorted(vs))


def test_quantiles_null_values_excluded(spark):
    """NULLs are excluded from the distribution and from n (engines
    disagree on NULL ordering; the operator must not depend on it)."""
    rows = [("g", 10), ("g", None), ("g", 20), ("g", None), ("g", 30)]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    r = length_quantiles(df).collect()[0]
    assert r.n_docs == 3
    assert (r.p25, r.p50, r.p75, r.p95) == (10, 20, 30, 30)


def test_grouped_median_histogram_path(spark):
    """q_grouped_median runs on the bounded-domain histogram
    (length_quantiles), NOT a whole-group applyInPandas: values must equal
    the naive lower median, and the executed plan must contain no
    FlatMapGroupsInPandas node (a hot source's full row set never lands on
    one worker)."""
    from logstash_forwarder_spark.queries import q_grouped_median

    q = q_grouped_median(spark, "/root/testdata/sf0.001")
    rows = {r.source: r for r in q.collect()}
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    # cross-check against a direct pandas lower median on the same table
    import pandas as pd

    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
        ["source", "n_chars"]
    ]
    for src, grp in pdf.groupby("source"):
        v = grp["n_chars"].sort_values().reset_index(drop=True)
        assert rows[src].median_chars == int(v.iloc[(len(v) - 1) // 2]), src
        assert rows[src].n_docs == len(v)


def test_token_budget_cap_hand_math(spark):
    """Hard quota semantics: scanning ids ascending, a doc is kept while
    tokens admitted BEFORE it are under budget (the crossing doc is
    admitted whole). bucket_width=2 forces the two-level prefix-sum path
    (bucket hash-agg + bucket window + intra-bucket window)."""
    from logstash_forwarder_spark.operators.stats import token_budget_cap

    rows = [
        ("a", 0, 40), ("a", 1, 40), ("a", 2, 40), ("a", 3, 40),
        ("b", 10, 200),  # first doc always admitted (0 < budget)
        ("b", 11, 1),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    out = {r.doc_id: r for r in token_budget_cap(df, budget=100, bucket_width=2).collect()}
    assert [out[i].keep for i in (0, 1, 2, 3)] == [1, 1, 1, 0]
    assert [out[i].cum_tok for i in (0, 1, 2, 3)] == [40, 80, 120, 160]
    assert out[10].keep == 1 and out[11].keep == 0  # 200 >= 100 already
    # parallelism invariance: same result at 1 partition
    one = {
        r.doc_id: (r.cum_tok, r.keep)
        for r in token_budget_cap(df.coalesce(1), budget=100, bucket_width=2).collect()
    }
    assert one == {i: (out[i].cum_tok, out[i].keep) for i in one}


def test_log_templates_hand_check(spark):
    from logstash_forwarder_spark.operators.text import log_template_stage

    rows = [
        (1, "ERROR   1234 connection lost to host 10 0 0 1 retrying"),
        (2, "error 99 connection lost to host 172 16 0 9"),
        (3, "user alice logged in"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.template: r for r in log_template_stage(df).collect()}
    t = "error <n> connection lost to host"
    assert out[t].n_docs == 2 and out[t].example_doc == 1
    assert out[t].tok_total == 12 + 9  # masked word counts of docs 1,2
    assert out["user alice logged in"].n_docs == 1


def test_token_budget_cap_property(spark):
    """Randomized sweep: the two-level prefix sum equals a naive Python
    cumsum at any bucket width and any partitioning."""
    import random

    from logstash_forwarder_spark.operators.stats import token_budget_cap

    rng = random.Random(5)
    for trial in range(3):
        rows = [
            (rng.choice(["a", "b", "c"]), i, rng.randrange(0, 50))
            for i in rng.sample(range(1000), 60)
        ]
        budget = rng.randrange(50, 400)
        width = rng.choice([1, 3, 16, 1024])
        exp = {}
        cums: dict = {}
        for src, i, tok in sorted(rows, key=lambda r: (r[0], r[1])):
            pre = cums.get(src, 0)
            cums[src] = pre + tok
            exp[i] = (cums[src], 1 if pre < budget else 0)
        df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
        got = {
            r.doc_id: (r.cum_tok, r.keep)
            for r in token_budget_cap(
                df.repartition(7), budget=budget, bucket_width=width
            ).collect()
        }
        assert got == exp, (trial, budget, width)
