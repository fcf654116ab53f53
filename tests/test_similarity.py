from __future__ import annotations

import numpy as np
from pyspark.sql import types as T

from logstash_forwarder_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    lsh_topk,
)

DIM = 16

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vecs(spark, n=60, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = rng.normal(size=DIM)
        v = (v / np.linalg.norm(v)).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    # planted near-duplicate of vec 0
    v0 = np.array(rows[0][1])
    dup = v0 + 0.01 * rng.normal(size=DIM).astype(np.float32)
    dup = dup / np.linalg.norm(dup)
    rows.append((999, [float(x) for x in dup]))
    return spark.createDataFrame(rows, SCHEMA)


def _np_topk(rows, queries, k):
    import numpy as np

    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        q = q / np.linalg.norm(q)
        sims = mat @ q
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
        out[qid] = [ids[i] for i in order[:k]]
    return out


def test_brute_force_topk_matches_numpy(spark):
    df = _vecs(spark)
    rows = [(r.vec_id, r.embedding) for r in df.collect()]
    queries = [r for r in rows if r[0] < 3]
    cands = [r for r in rows if r[0] >= 3]
    got = brute_force_topk(
        spark.createDataFrame(queries, SCHEMA),
        spark.createDataFrame(cands, SCHEMA),
        k=5,
    ).collect()
    want = _np_topk(cands, queries, 5)
    for qid in (0, 1, 2):
        g = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert g == want[qid]
    # planted dup of vec 0 must rank first for query 0
    assert want[0][0] == 999
    cos0 = next(r.cos for r in got if r.query_id == 0 and r.neighbor_id == 999)
    assert cos0 > 0.99


def test_lsh_topk_recall(spark):
    df = _vecs(spark)
    rows = [(r.vec_id, r.embedding) for r in df.collect()]
    queries = [r for r in rows if r[0] < 3]
    cands = [r for r in rows if r[0] >= 3]
    got = lsh_topk(
        spark.createDataFrame(queries, SCHEMA),
        spark.createDataFrame(cands, SCHEMA),
        k=5,
        dim=DIM,
        n_planes=8,
        hamming_radius=2,
    ).collect()
    want = _np_topk(cands, queries, 5)
    # LSH guarantees: truly-near vectors (the planted dup, cos≈0.99) share a
    # bucket w.h.p.; mid-similarity "neighbors" of random queries are only
    # found probabilistically → assert planted-dup recall + mean recall ≥ 50%
    recalls = []
    for qid in (0, 1, 2):
        g = {r.neighbor_id for r in got if r.query_id == qid}
        recalls.append(len(g & set(want[qid])) / 5)
    assert sum(recalls) / len(recalls) >= 0.5
    assert any(r.query_id == 0 and r.neighbor_id == 999 for r in got)


def test_ivf_topk_recall(spark):
    from logstash_forwarder_spark.operators.similarity import ivf_topk

    df = _vecs(spark)
    rows = [(r.vec_id, r.embedding) for r in df.collect()]
    queries = [r for r in rows if r[0] < 3]
    cands = [r for r in rows if r[0] >= 3]
    got = ivf_topk(
        spark.createDataFrame(queries, SCHEMA),
        spark.createDataFrame(cands, SCHEMA),
        k=5,
        n_cells=8,
        n_probe=4,
    ).collect()
    want = _np_topk(cands, queries, 5)
    recalls = []
    for qid in (0, 1, 2):
        g = {r.neighbor_id for r in got if r.query_id == qid}
        recalls.append(len(g & set(want[qid])) / 5)
    assert sum(recalls) / len(recalls) >= 0.5
    # the planted near-dup shares the query's cell w.h.p. → found
    assert any(r.query_id == 0 and r.neighbor_id == 999 for r in got)


def test_cosine_near_dup_pairs(spark):
    df = _vecs(spark)
    pairs = cosine_near_dup_pairs(df, threshold=0.95, dim=DIM, n_planes=8).collect()
    got = {(r.vec_a, r.vec_b) for r in pairs}
    # only the planted pair reaches τ=0.95 in this fixture
    assert got == {(0, 999)}
