"""Bloom / Count-Min sketch properties (operators/sketch.py): the
guarantees the 100 TB design leans on, proven on deterministic inputs —
no false negatives, one-sided count error, bounded sketch cardinality,
and bit-exact agreement with an independent numpy model of the hash
algebra (the same algebra the DuckDB oracles replay)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.sketch import (
    BLOOM_COEFFS,
    CMS_COEFFS,
    P,
    bloom_bits,
    bloom_member,
    cms_build,
    cms_estimate,
)


def _np_positions(keys: np.ndarray, coeffs, width: int) -> np.ndarray:
    """(len(keys), k) probe positions — independent model of _positions."""
    h = np.mod(keys.astype(np.int64), P)
    return np.stack([((h * a + b) % P) % width for a, b in coeffs], axis=1)


def _keys_df(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "h long")


def test_bloom_no_false_negatives(spark):
    """Every inserted key passes all k probes — the Bloom contract."""
    ins = np.arange(0, 4000, 7, dtype=np.int64) * 1_000_003  # 572 keys
    bits = bloom_bits(_keys_df(spark, ins), "h", width=1024)
    got = bloom_member(_keys_df(spark, ins), "h", bits, width=1024)
    assert got.count() == len(ins)


def test_bloom_bits_bounded_and_fp_match_model(spark):
    """bits ≤ k·width rows regardless of insert count; the survivor set
    for DISJOINT probe keys (pure false positives) equals the numpy
    model's prediction exactly — determinism, not luck."""
    width = 256
    # 150 keys into width 256: ~44% fill per row → FP ≈ 9%, partial pass
    ins = np.arange(1, 450, 3, dtype=np.int64) * 7919
    probes = np.arange(1_000_000, 1_002_000, dtype=np.int64)  # disjoint
    bits_df = bloom_bits(_keys_df(spark, ins), "h", width=width)
    nbits = bits_df.count()
    assert nbits <= len(BLOOM_COEFFS) * width

    got = sorted(
        r.h
        for r in bloom_member(
            _keys_df(spark, probes), "h", bits_df, width=width
        ).collect()
    )
    # numpy model: a probe passes iff each of its k positions was set
    set_pos = _np_positions(ins, BLOOM_COEFFS, width)
    sets = [np.unique(set_pos[:, i]) for i in range(len(BLOOM_COEFFS))]
    pp = _np_positions(probes, BLOOM_COEFFS, width)
    ok = np.ones(len(probes), dtype=bool)
    for i, s in enumerate(sets):
        ok &= np.isin(pp[:, i], s)
    want = sorted(probes[ok].tolist())
    assert got == want
    assert 0 < len(want) < len(probes)  # saturated enough to see FPs


def test_cms_one_sided_and_model_exact(spark):
    """est ≥ exact for every key (Count-Min guarantee) and est equals the
    numpy sketch replay bit-exactly; counters stay ≤ d·width rows."""
    width = 32  # narrow on purpose: forces collisions
    rng = np.random.default_rng(20240817)
    keys = rng.integers(0, 500, size=20_000).astype(np.int64) * 97 + 5
    df = _keys_df(spark, keys)
    counters = cms_build(df, "h", width=width)
    assert counters.count() <= len(CMS_COEFFS) * width

    probes = np.unique(keys)
    est = {
        r.h: r.est
        for r in cms_estimate(
            _keys_df(spark, probes), "h", counters, width=width
        ).collect()
    }
    assert set(est) == set(probes.tolist())

    # numpy replay of the sketch
    pos = _np_positions(keys, CMS_COEFFS, width)
    table = np.zeros((len(CMS_COEFFS), width), dtype=np.int64)
    for j in range(len(CMS_COEFFS)):
        np.add.at(table[j], pos[:, j], 1)
    ppos = _np_positions(probes, CMS_COEFFS, width)
    model = np.min(
        np.stack([table[j][ppos[:, j]] for j in range(len(CMS_COEFFS))], axis=1),
        axis=1,
    )
    exact = {int(k): int(c) for k, c in zip(*np.unique(keys, return_counts=True))}
    for k, m in zip(probes.tolist(), model.tolist()):
        assert est[k] == m
        assert est[k] >= exact[k]
    # narrow width must actually have produced over-estimates somewhere
    assert any(est[k] > exact[k] for k in probes.tolist())


def test_cms_estimate_tolerates_duplicate_probes(spark):
    """Duplicate probe rows collapse to ONE output row per distinct probe
    with the SAME estimate — not silently dropped (ADVICE r5: the old
    ``_d == d`` guard removed any probe appearing twice)."""
    keys = np.repeat(np.arange(30, dtype=np.int64) * 1009, 4)
    counters = cms_build(_keys_df(spark, keys), "h", width=8192)
    probes = np.unique(keys)
    dup_probes = np.concatenate([probes, probes[:10], probes[:3]])
    rows = cms_estimate(
        _keys_df(spark, dup_probes), "h", counters, width=8192
    ).collect()
    got = {r.h: r.est for r in rows}
    assert len(rows) == len(probes)  # one row per DISTINCT probe
    assert got == {int(k): 4 for k in probes}


def test_cms_exact_when_wide(spark):
    """With width >> distinct keys and no collisions, est == exact."""
    keys = np.repeat(np.arange(40, dtype=np.int64) * 1009, 3)
    counters = cms_build(_keys_df(spark, keys), "h", width=8192)
    probes = np.unique(keys)
    rows = cms_estimate(
        _keys_df(spark, probes), "h", counters, width=8192
    ).collect()
    pos = _np_positions(probes, CMS_COEFFS, 8192)
    collision_free = all(
        len(np.unique(pos[:, j])) == len(probes) for j in range(len(CMS_COEFFS))
    )
    assert collision_free  # deterministic given the fixed keys
    assert {r.h: r.est for r in rows} == {int(k): 3 for k in probes}


def test_bloom_probe_is_broadcast(spark):
    """The probe join ships the BIT SET, not the data: executed plan
    carries a broadcast exchange feeding the (i, pos) join."""
    ins = np.arange(0, 512, dtype=np.int64)
    bits = bloom_bits(_keys_df(spark, ins), "h", width=128)
    out = bloom_member(_keys_df(spark, ins), "h", bits, width=128)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hll_registers_model_and_duplicates(spark):
    """Registers equal an independent numpy replay; duplicating the
    input changes NOTHING (max is idempotent — the no-distinct-needed
    property the query leans on)."""
    from logstash_forwarder_spark.operators.sketch import (
        HLL_COEFF,
        hll_estimate,
        hll_registers,
    )

    m = 64
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**55, size=30_000).astype(np.int64)
    df = _keys_df(spark, keys)
    got = sorted(
        (r.register, r.max_rank) for r in hll_registers(df, "h", m=m).collect()
    )

    a, b = HLL_COEFF
    h2 = ((np.mod(keys, P)) * a + b) % P
    reg = h2 % m
    w = h2 // m
    maxbits = (P // m).bit_length()
    rank = np.where(
        w == 0, maxbits + 1, maxbits + 1 - np.floor(np.log2(np.maximum(w, 1))).astype(np.int64) - 1
    )
    model = {}
    for r_, k_ in zip(reg.tolist(), rank.tolist()):
        model[r_] = max(model.get(r_, 0), int(k_))
    assert got == sorted(model.items())

    # duplicate the whole input: identical registers
    dup = df.unionByName(df)
    got_dup = sorted(
        (r.register, r.max_rank)
        for r in hll_registers(dup, "h", m=m).collect()
    )
    assert got_dup == got

    # estimate lands inside the 64-register error envelope on 3 key sets
    for n, seed in ((500, 1), (5_000, 2), (30_000, 3)):
        ks = np.unique(
            np.random.default_rng(seed).integers(0, 2**55, size=n).astype(np.int64)
        )
        rows = [
            (r.register, r.max_rank)
            for r in hll_registers(_keys_df(spark, ks), "h", m=m).collect()
        ]
        est = hll_estimate(rows, m)
        assert abs(est - len(ks)) / len(ks) < 0.30


def test_hll_rejects_non_power_of_two(spark):
    from logstash_forwarder_spark.operators.sketch import hll_registers

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hll_registers(_keys_df(spark, [1]), "h", m=48)


def test_hll_ignores_null_keys(spark):
    """count(distinct) ignores NULLs; so must the sketch — no
    (NULL, NULL) register row, estimate unchanged by NULL rows."""
    from logstash_forwarder_spark.operators.sketch import hll_registers

    base = spark.createDataFrame([(int(k),) for k in range(500)], "h long")
    with_nulls = base.unionByName(
        spark.createDataFrame([(None,)] * 7, "h long")
    )
    a = sorted(map(tuple, hll_registers(base, "h", m=64).collect()))
    b = sorted(map(tuple, hll_registers(with_nulls, "h", m=64).collect()))
    assert a == b
    assert all(r is not None for row in b for r in row)


def test_hll_registers_by_equals_per_group_global(spark):
    """Grouped HLL slices are bit-identical to running the global
    sketch on each group's rows — one (grp, register) hash-agg replaces
    |groups| separate jobs."""
    from logstash_forwarder_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
        hll_registers_by,
    )

    import hashlib

    # keys must be hash-distributed (the operator's contract — the
    # production path feeds md5-derived shingle hashes): md5 the value
    def h(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    rows = [(f"s{i % 3}", h((i * 7919) % 500)) for i in range(4_000)]
    rows += [("s0", None)]  # NULL keys ignored, as in count(distinct)
    df = spark.createDataFrame(rows, "src string, k long")

    grouped = {
        (r.grp, r.register): r.max_rank
        for r in hll_registers_by(df, "src", "k").collect()
    }
    for g in ("s0", "s1", "s2"):
        solo = {
            (g, r.register): r.max_rank
            for r in hll_registers(df.where(F.col("src") == g), "k").collect()
        }
        assert solo == {k: v for k, v in grouped.items() if k[0] == g}, g
        true = (
            df.where(F.col("src") == g).select("k").na.drop().distinct().count()
        )
        est = hll_estimate(
            [(reg, rk) for (grp, reg), rk in grouped.items() if grp == g]
        )
        assert abs(est - true) / true < 0.35  # m=64 → 13% expected sigma
