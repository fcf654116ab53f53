"""Sequence packing & chunking (operators/pack.py).

Invariants, not samples: packing is cross-checked against a naive
sequential Python packer on the same rows; chunking must reconstruct the
original arrays exactly and respect window/stride geometry.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logstash_forwarder_spark.operators.pack import (
    chunk_tokens,
    pack_contiguous,
    pack_stats,
)


def _seqs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tok long"
    )


def _naive_pack(rows, capacity):
    """Sequential reference: stream offsets per source in doc_id order."""
    out = {}
    by_src = {}
    for doc_id, source, n_tok in sorted(rows):
        off = by_src.get(source, 0)
        out[doc_id] = off // capacity
        by_src[source] = off + n_tok
    return out


def test_pack_matches_sequential_reference(spark):
    rows = [
        (i, f"s{i % 3}", (i * 37) % 900 + 1)  # sizes 1..900, three sources
        for i in range(200)
    ]
    got = {
        r.doc_id: r.pack_id
        for r in pack_contiguous(_seqs(spark, rows), capacity=2048).collect()
    }
    assert got == _naive_pack(rows, 2048)


def test_pack_is_parallelism_invariant(spark):
    rows = [(i, f"s{i % 2}", 100 + i) for i in range(60)]
    df = _seqs(spark, rows)
    a = pack_contiguous(df.repartition(1), 512).collect()
    b = pack_contiguous(df.repartition(7), 512).collect()
    assert {(r.doc_id, r.pack_id) for r in a} == {(r.doc_id, r.pack_id) for r in b}


def test_pack_stats_conserve_totals(spark):
    rows = [(i, "s0", 300) for i in range(20)]
    stats = pack_stats(_seqs(spark, rows), capacity=1000).collect()
    assert sum(r.n_docs for r in stats) == 20
    assert sum(r.tok_total for r in stats) == 20 * 300
    # 300-token docs, 1000 capacity: packs hold docs starting in each
    # 1000-token window of the 6000-token stream
    assert {r.pack_id for r in stats} == set(range(6))


def test_pack_rejects_bad_capacity(spark):
    with pytest.raises(ValueError):
        pack_contiguous(_seqs(spark, [(1, "s", 1)]), capacity=0)


def _tok_df(spark, arrays):
    return spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "doc_id long, tokens array<int>"
    )


def test_chunk_reconstructs_with_disjoint_stride(spark):
    arrays = [list(range(n)) for n in (1, 7, 8, 9, 31)]
    out = chunk_tokens(_tok_df(spark, arrays), window=8, stride=8).collect()
    rebuilt: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        rebuilt.setdefault(r.doc_id, []).extend(r.chunk)
        assert r.chunk_len == len(r.chunk) <= 8
    assert rebuilt == {i: a for i, a in enumerate(arrays)}


def test_chunk_overlap_geometry(spark):
    # window 8, stride 4 over 10 tokens → offsets 0,4,8: lens 8, 6, 2
    out = sorted(
        chunk_tokens(_tok_df(spark, [list(range(10))]), window=8, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_len for r in out] == [8, 6, 2]
    assert out[0].chunk == list(range(8))
    assert out[1].chunk == list(range(4, 10))
    assert out[2].chunk == [8, 9]
    # consecutive chunks overlap by window - stride tokens
    assert out[0].chunk[4:] == out[1].chunk[:4]


def test_chunk_empty_array_emits_nothing(spark):
    out = chunk_tokens(_tok_df(spark, [[], [1, 2]]), window=4, stride=4).collect()
    assert {r.doc_id for r in out} == {1}


@settings(max_examples=5, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40),
    capacity=st.integers(min_value=1, max_value=600),
)
def test_pack_property_matches_reference(spark, sizes, capacity):
    rows = [(i, f"s{i % 2}", n) for i, n in enumerate(sizes)]
    got = {
        r.doc_id: r.pack_id
        for r in pack_contiguous(_seqs(spark, rows), capacity).collect()
    }
    assert got == _naive_pack(rows, capacity)


@settings(max_examples=5, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=10),
    window=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=12),
)
def test_chunk_property_matches_reference(spark, lens, window, stride):
    arrays = [list(range(n)) for n in lens]
    got = {}
    for r in chunk_tokens(_tok_df(spark, arrays), window=window, stride=stride).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = list(r.chunk)
    expect = {}
    for i, a in enumerate(arrays):
        for ci, off in enumerate(range(0, len(a), stride)):
            expect.setdefault(i, {})[ci] = a[off : off + window]
    assert got == expect


def test_chunk_plan_has_no_shuffle(spark):
    df = _tok_df(spark, [[1, 2, 3]])
    plan = chunk_tokens(df, window=2, stride=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: generate/slice only


def test_shift_labels_alignment(spark):
    from logstash_forwarder_spark.operators.pack import shift_labels

    df = _tok_df(spark, [[10, 11, 12, 13], [7, 8], [99], []])
    out = {r.doc_id: r for r in shift_labels(df).collect()}
    assert out[0].input_ids == [10, 11, 12] and out[0].labels == [11, 12, 13]
    assert out[0].pair_len == 3
    # label[i] is always input[i]'s successor in the original sequence
    assert out[1].input_ids == [7] and out[1].labels == [8]
    # <2 tokens: empty pair, never an error
    assert out[2].input_ids == [] and out[2].labels == [] and out[2].pair_len == 0
    assert out[3].pair_len == 0


def test_shift_labels_plan_has_no_shuffle(spark):
    from logstash_forwarder_spark.operators.pack import shift_labels

    df = _tok_df(spark, [[1, 2, 3]] * 8)
    plan = shift_labels(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shift_labels_oracle_agrees_on_single_word_docs(spark, tmp_path):
    """Cross-engine edge: docs with <2 words must yield '' (not NULL) on
    BOTH engines — DuckDB array_to_string of an empty slice is NULL
    without the coalesce in SQL_SHIFT_LABELS."""
    import duckdb

    from logstash_forwarder_spark.queries import SQL_SHIFT_LABELS, q_shift_labels

    df = spark.createDataFrame(
        [(1, "solo", "s", 4), (2, "two words", "s", 9)],
        "doc_id long, text string, source string, n_chars long",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: r for r in q_shift_labels(spark, sf).collect()}
    assert got[1].input_text == "" and got[1].label_text == "" and got[1].pair_len == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    orc = {r[0]: r for r in con.sql(SQL_SHIFT_LABELS).fetchall()}
    assert orc[1][1] == "" and orc[1][2] == "" and orc[1][3] == 0
    assert orc[2][1] == got[2].input_text == "two"


def test_assemble_packs_bounded_groups(spark):
    """Packed examples: stream-order concatenation per pack, straddle doc
    charged to the pack of its first token; group sizes bounded by
    capacity so the grouped-map applyInPandas is legitimate here."""
    from logstash_forwarder_spark.operators.pack import assemble_packs

    rows = [
        ("s", 1, ["a", "b", "c"], 3),
        ("s", 2, ["d", "e"], 2),      # starts at 3 -> pack 0 (straddles)
        ("s", 3, ["f"], 1),           # starts at 5 -> pack 1
        ("t", 9, ["x"], 1),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, tokens array<string>, n_tok long"
    )
    out = {(r.source, r.pack_id): r for r in assemble_packs(df, capacity=4).collect()}
    assert out[("s", 0)].packed == ["a", "b", "c", "d", "e"]
    assert out[("s", 0)].n_docs == 2 and out[("s", 0)].tok_total == 5
    assert out[("s", 1)].packed == ["f"]
    assert out[("t", 0)].packed == ["x"]


def test_assemble_packs_drops_zero_token_rows(spark):
    """Zero-token rows never advance start_off, so unboundedly many could
    share one pack frame (ADVICE r4) — assemble_packs drops them, keeping
    the <= capacity-docs-per-group invariant true by construction and the
    pack content/offsets identical to a clean corpus."""
    from logstash_forwarder_spark.operators.pack import assemble_packs

    rows = [
        ("s", 1, ["a", "b", "c"], 3),
        ("s", 2, [], 0),              # dirty: empty doc between members
        ("s", 3, ["d", "e"], 2),      # starts at 3 -> pack 0 (straddles)
        ("s", 4, [], 0),
        ("s", 5, ["f"], 1),           # starts at 5 -> pack 1
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, tokens array<string>, n_tok long"
    )
    out = {(r.source, r.pack_id): r for r in assemble_packs(df, capacity=4).collect()}
    assert out[("s", 0)].packed == ["a", "b", "c", "d", "e"]
    assert out[("s", 0)].n_docs == 2  # empty docs not counted
    assert out[("s", 1)].packed == ["f"]
    assert len(out) == 2


def test_shard_plan_balance_and_determinism(spark):
    from logstash_forwarder_spark.operators.pack import shard_plan

    df = spark.createDataFrame(
        [(i, (i % 7) * 10) for i in range(8_000)], "doc_id long, w long"
    )
    plan = {r.shard: (r.n_rows, r.weight_total) for r in
            shard_plan(df, 16, weight_col="w").collect()}
    assert set(plan) == set(range(16))
    sizes = [n for n, _ in plan.values()]
    assert max(sizes) <= 1.3 * min(sizes)  # hash-uniform balance
    assert sum(sizes) == 8_000
    # parallelism-invariant: same plan from a different partitioning
    plan2 = {r.shard: (r.n_rows, r.weight_total) for r in
             shard_plan(df.repartition(3), 16, weight_col="w").collect()}
    assert plan2 == plan


def test_export_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from logstash_forwarder_spark.operators.pack import export_shards, shard_plan

    df = spark.createDataFrame(
        [(i, i * 3) for i in range(2_000)], "doc_id long, w long"
    )
    path = str(tmp_path / "shards")
    export_shards(df, path, 8)
    back = spark.read.option("basePath", path).parquet(path)
    # shard column restored; contents complete and shard-consistent
    assert back.count() == 2_000
    got = {r.shard: r.n for r in
           back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {r.shard: r.n_rows for r in shard_plan(df, 8).collect()}
    assert got == want
    # every shard directory exists on disk
    import os

    assert {f"shard={i}" for i in range(8)} <= set(os.listdir(path))


def test_export_shards_curriculum_order(spark, tmp_path):
    """sort_col: rows inside each shard FILE are ordered by the
    curriculum column (parquet preserves row order per file; whole-shard
    consumers iterate files in name order — the bin-packing gotcha is
    the operator docstring's contract, not re-tested here)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from logstash_forwarder_spark.operators.pack import export_shards

    rows = [(i, (i * 7919) % 513 + 1) for i in range(3_000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    path = str(tmp_path / "cshards")
    export_shards(df, path, 4, sort_col="n_tok")
    files = _glob.glob(f"{path}/shard=*/*.parquet")
    assert files
    total = 0
    for f in files:
        col = pq.read_table(f, columns=["n_tok"]).column("n_tok").to_pylist()
        assert col == sorted(col), f
        total += len(col)
    assert total == 3_000
