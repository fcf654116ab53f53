"""Streaming dedup — the training-data dedup operators in Structured
Streaming form (SURVEY §2.11 × the dedup family): exact content dedup via
``dropDuplicatesWithinWatermark`` and NEAR-dup candidate detection via the
batch minhash-LSH machinery keyed into bounded per-bucket state
(``streaming_minhash_candidates``).

The reference processes each file line exactly once via its registrar
(/root/reference/registrar.go:12-29); a streaming ingest additionally wants
CONTENT dedup across micro-batches — the same document arriving in two
files, or replayed by an at-least-once upstream. The idiomatic Spark shape:

* fingerprint = md5 of normalized text (the exact-dedup key from
  operators/dedup.py, identical normalization on both batch and stream)
* ``dropDuplicatesWithinWatermark`` keyed on the fingerprint — the state
  store keeps one entry per fingerprint and EVICTS entries older than the
  event-time watermark, so state is bounded by the dedup horizon, not by
  stream lifetime. (Plain ``dropDuplicates`` on a stream grows state
  forever; keying the event time alongside would only dedup equal-ts rows.)

At 100 TB/day this is the only viable shape: state ∝ unique docs per
horizon, shuffled once on the fingerprint — no cross-batch joins, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _norm


def streaming_exact_dedup(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str | None = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop content-duplicate rows across micro-batches.

    ``horizon`` bounds both lateness and the dedup memory: two copies of a
    document arriving within the horizon dedup to one; a copy arriving
    later than the watermark may pass (bounded-state tradeoff, same
    contract as Kafka/Flink dedup operators). With ``event_time_col=None``
    state is unbounded — only for short drain-everything runs.
    """
    fingerprinted = stream_df.withColumn("fp", F.md5(_norm(F.col(text_col))))
    if event_time_col is None:
        return fingerprinted.dropDuplicates(["fp"])
    return fingerprinted.withWatermark(
        event_time_col, horizon
    ).dropDuplicatesWithinWatermark(["fp"])


def streaming_minhash_candidates(
    stream_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
    n: int | None = None,
    k: int | None = None,
    bands: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Streaming NEAR-dup candidate pairs — batch minhash LSH
    (operators/dedup.py minhash_lsh_pairs) recast as a bounded-state
    streaming stage.

    Shape: the signature kernel (mapInArrow, row-local — streams fine) and
    the banded bucket explosion are the SAME code the batch path uses
    (band_bucket_struct), then ``applyInPandasWithState`` keyed on
    (band, bucket) holds each bucket's members seen within the watermark
    horizon and emits a (doc_a, doc_b, est_jaccard_pct) row whenever a new
    arrival collides with one — including collisions ACROSS micro-batch
    boundaries. State per key is the bucket's live membership; entries
    older than the event-time watermark are evicted every batch, so total
    state ∝ docs per horizon × bands, independent of stream lifetime.

    Pair semantics match the batch operator (doc_a < doc_b, est =
    floor(matching_slots × 100 / k)), and emission is EXACTLY-ONCE per
    pair with no second stage and no downstream distinct: every band's
    state holds both members' FULL signatures, so each band locally
    computes the set of bands whose signature slices match and only the
    MINIMAL matching band emits. All bands see the same arrivals in the
    same order with the same eviction horizon, so exactly one of them
    elects itself. (The election criterion is slice equality, which is
    what bucket = xxhash64(slice) equality means short of a 64-bit hash
    collision; a freak bucket-only collision with differing slices is
    suppressed here while the batch path would emit it as a candidate.)

    ``doc_a``/``doc_b`` and the state ids take ``id_col``'s actual type
    (string or int64 both work at the Arrow boundary).
    """
    from ..operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_MINHASH_K,
        DEFAULT_SHINGLE,
        band_bucket_struct,
        minhash_signatures,
    )

    n = DEFAULT_SHINGLE if n is None else n
    k = DEFAULT_MINHASH_K if k is None else k
    bands = DEFAULT_BANDS if bands is None else bands
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows_per_band = k // bands

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sigs = minhash_signatures(
        stream_df,
        id_col=id_col,
        text_col=text_col,
        n=n,
        k=k,
        seed=seed,
        passthrough=(ts_col,),
    )
    banded = (
        sigs.withWatermark(ts_col, horizon)
        .select(id_col, ts_col, "sig", band_bucket_struct(bands, rows_per_band))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("_ts"),
            "sig",
            "bb.band",
            "bb.bucket",
        )
    )

    def update(key, pdfs, state: GroupState):
        band = int(key[0])
        ids, sig_flat, tss = state.get if state.exists else ([], [], [])
        ids, sig_flat, tss = list(ids), list(sig_flat), list(tss)
        out_a, out_b, out_est = [], [], []
        for pdf in pdfs:
            for doc, sig, ts in zip(pdf["doc_id"], pdf["sig"], pdf["_ts"]):
                if doc in ids:
                    # at-least-once replay: the first arrival already
                    # emitted this doc's pairs; re-appending would both
                    # duplicate state and re-emit on every later collision
                    continue
                s = np.asarray(sig, dtype=np.int64)
                sm = s.reshape(bands, rows_per_band)
                for j, other in enumerate(ids):
                    o = np.asarray(sig_flat[j * k : (j + 1) * k], dtype=np.int64)
                    # exactly-once election: emit only from the minimal
                    # band whose signature slices match for this pair
                    eq = (sm == o.reshape(bands, rows_per_band)).all(axis=1)
                    if not eq.any() or int(np.flatnonzero(eq)[0]) != band:
                        continue
                    a, b = (doc, other) if doc < other else (other, doc)
                    out_a.append(a)
                    out_b.append(b)
                    out_est.append(int((s == o).sum()) * 100 // k)
                ids.append(doc)
                sig_flat.extend(int(x) for x in s)
                tss.append(int(pd.Timestamp(ts).value // 1_000_000))
        # evict members older than the event-time watermark: bounded state
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and tss:
            keep = [i for i, t in enumerate(tss) if t >= wm]
            if len(keep) < len(ids):
                ids = [ids[i] for i in keep]
                sig_flat = [
                    x for i in keep for x in sig_flat[i * k : (i + 1) * k]
                ]
                tss = [tss[i] for i in keep]
        if ids:
            state.update((ids, sig_flat, tss))
        else:
            state.remove()
        yield pd.DataFrame(
            {"doc_a": out_a, "doc_b": out_b, "est_jaccard_pct": out_est}
        )

    idt = stream_df.schema[id_col].dataType.simpleString()
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=f"doc_a {idt}, doc_b {idt}, est_jaccard_pct long",
        stateStructType=f"ids array<{idt}>, sigs array<long>, tss array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
