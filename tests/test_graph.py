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
