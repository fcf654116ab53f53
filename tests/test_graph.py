"""Connected components vs a union-find reference on random and adversarial
graphs; determinism across parallelism."""

from __future__ import annotations

import random

import pytest

from logstash_forwarder_spark.operators.graph import connected_components


def _reference(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), set()).add(n)
    return {n: min(g) for g in groups.values() for n in g}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.cluster for r in connected_components(df).collect()}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _reference(edges)


def test_chain_and_separate_clusters(spark):
    # a 9-node path (worst diameter per node count here) + a triangle + a pair
    edges = [(i, i + 1) for i in range(8)] + [(100, 101), (101, 102), (102, 100), (200, 201)]
    got = _run(spark, edges)
    assert {got[i] for i in range(9)} == {0}
    assert got[100] == got[101] == got[102] == 100
    assert got[200] == got[201] == 200


def test_parallelism_invariant(spark):
    edges = [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    a = {r.node: r.cluster for r in connected_components(df1).collect()}
    b = {r.node: r.cluster for r in connected_components(df7).collect()}
    assert a == b


def test_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=2)


def _stored_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_checkpoint_storage_released(spark):
    """Superseded round checkpoints and sym are freed; only the final
    labels checkpoint (which backs the returned DataFrame) survives, and
    the returned result is still fully readable after the frees."""
    base = _stored_rdds(spark)
    edges = [(0, i) for i in range(1, 20)] + [(100, 100 + i) for i in range(1, 21)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df)
    rows = out.collect()
    assert len(rows) == 41 and {r.cluster for r in rows} == {0, 100}
    assert _stored_rdds(spark) <= base + 1  # final labels only
    # still readable: the surviving checkpoint is the one the result needs
    assert out.count() == 41


def test_checkpoint_storage_released_on_failure(spark):
    """The max_iter error path must not leak any checkpoint blocks."""
    base = _stored_rdds(spark)
    chain = spark.createDataFrame([(i, i + 1) for i in range(64)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    assert _stored_rdds(spark) <= base


def _run_star(spark, edges):
    from logstash_forwarder_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.cluster for r in connected_components_star(df).collect()
    }


def test_star_matches_union_find_on_random_graph(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(100)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_star(spark, edges) == _reference(edges)


def test_star_long_chain_logarithmic_rounds(spark):
    """The case propagation cannot do: a 400-node path (diameter 399).
    Star contraction must converge well within 20 rounds (≈ log² n) —
    propagation would need 399."""
    edges = [(i, i + 1) for i in range(400)]
    from logstash_forwarder_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.cluster
        for r in connected_components_star(df, max_iter=20).collect()
    }
    assert got == {i: 0 for i in range(401)}


def test_star_agrees_with_propagation(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_star(spark, edges) == _run(spark, edges)


def test_star_parallelism_invariant_and_storage(spark):
    from logstash_forwarder_spark.operators.graph import connected_components_star

    base = _stored_rdds(spark)
    edges = [(i, i + 1) for i in range(30)] + [(100, 101)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df5 = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    a = {r.node: r.cluster for r in connected_components_star(df1).collect()}
    b = {r.node: r.cluster for r in connected_components_star(df5).collect()}
    assert a == b == _reference(edges)
    assert _stored_rdds(spark) <= base + 2  # final edge sets only
