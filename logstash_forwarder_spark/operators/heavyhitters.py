"""Exact distributed heavy hitters — two-pass Misra-Gries: the "top
talkers" / boilerplate-n-gram question a log pipeline asks of unbounded
token streams, answered EXACTLY without ever shuffling a raw token.

The reference forwards events and leaves frequency analytics downstream;
at 100 TB the naive `explode → groupBy` shuffles the whole token stream
(the anti-pattern CLAUDE.md measured at 27 s of a 92 s bench for
sketches). The classic 2-pass algorithm avoids it:

* **Pass 1 (candidates)** — each partition folds its word n-grams into a
  Misra-Gries summary of capacity k inside a ``mapInArrow`` kernel
  (vectorized: per-batch ``np.unique`` counts merged into the sketch;
  the MG reduction subtracts the (size-k)-th count and drops ≤0).
  Guarantee: an item with global count > n/k exceeds its per-partition
  threshold n_p/k in at least one partition (averaging argument), so the
  UNION of partition sketches contains every global heavy hitter. Output
  is ≤ k+1 rows per partition — bounded by design, like the k-means
  pools the repo already collects. The union is then MERGED IN SPARK
  (one hash-agg over sketch rows) and pruned by the provable count
  upper bound ``c(g) ≤ Σ est + n/k`` before the driver collect, so the
  driver holds only certifiable candidates, not O(k × partitions) rows.
* **Pass 2 (exact recount)** — a second scan counts ONLY the candidate
  set (np.isin against the broadcast candidates inside the kernel);
  per-partition partials hash-agg to exact global counts. The only
  exchange in either pass carries candidate-key partials.

``heavy_hitters(df, inv_threshold=T)`` returns items with
``cnt * T > n`` (n = total n-grams). Provably exact whenever the MG
capacity k ≥ T — which the function enforces.

Grams are tracked as 64-bit combined word-hashes in the sketch (never
materialized per occurrence); representative strings are rebuilt
vectorally only for per-batch UNIQUE new sketch keys (Arrow ``take`` +
``binary_join_element_wise``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_SCHEMA = "gram string, h long, est long, n_part long"
PARTIAL_SCHEMA = "h long, cnt long"


def _batch_gram_counts(batch, text_name: str, n: int, seed: int):
    """Per Arrow batch: (unique gram hashes uint64, counts, first-occurrence
    representative strings, total gram count)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .dedup import _shingle_occurrences

    row_of_sh, within, sh, wlens = _shingle_occurrences(batch, text_name, n, seed)
    if not len(sh):
        return None
    uniq, first_idx, counts = np.unique(sh, return_index=True, return_counts=True)

    # rebuild representative strings ONLY for the uniques: word positions
    # of each first occurrence, then an Arrow take + element-wise join
    col = batch.column(batch.schema.get_field_index(text_name))
    txt = pc.fill_null(col, "")
    txt = pc.utf8_lower(
        pc.utf8_trim(pc.replace_substring_regex(txt, r"\s+", " "), " ")
    )
    words = pc.split_pattern(txt, " ")
    if isinstance(words, pa.ChunkedArray):  # pragma: no cover
        words = words.combine_chunks()
    offs = words.offsets.to_numpy(zero_copy_only=True).astype(np.int64)
    starts = offs[:-1]
    flat = words.values
    pos0 = starts[row_of_sh[first_idx]] + within[first_idx]
    parts = [flat.take(pa.array(pos0 + j, pa.int64())) for j in range(n)]
    reps = pc.binary_join_element_wise(*parts, " ").to_pylist()
    return uniq, counts.astype(np.int64), reps, int(counts.sum())


def _mg_merge(sketch: dict, uniq, counts, reps, capacity: int) -> None:
    """Merge per-batch unique counts into the MG sketch (hash -> [count,
    rep]); reduce back to ``capacity`` keys by subtracting the
    (size-capacity)-th largest count and dropping ≤0 (the summary-merge
    form of Misra-Gries — error grows by the subtracted amount, total
    ≤ n_p/capacity per partition)."""
    import numpy as np

    for h, c, r in zip(uniq.tolist(), counts.tolist(), reps):
        ent = sketch.get(h)
        if ent is not None:
            ent[0] += c
        else:
            sketch[h] = [c, r]
    excess = len(sketch) - capacity
    if excess > 0:
        vals = np.fromiter((e[0] for e in sketch.values()), np.int64, len(sketch))
        cut = int(np.partition(vals, excess - 1)[excess - 1])
        for h in [h for h, e in sketch.items() if e[0] <= cut]:
            del sketch[h]
        for e in sketch.values():
            e[0] -= cut


def heavy_hitters(
    df: DataFrame,
    *,
    text_col: str = "text",
    ngram: int = 2,
    inv_threshold: int = 700,
    capacity: int = 4096,
    seed: int = 9172,
) -> DataFrame:
    """Items (word n-grams of ``text_col``) with ``cnt * inv_threshold >
    n``, with EXACT counts. Returns (gram, cnt). Requires ``capacity >=
    inv_threshold`` (the MG exactness condition)."""
    if capacity < inv_threshold:
        raise ValueError(
            f"capacity {capacity} < inv_threshold {inv_threshold}: "
            "Misra-Gries can miss true heavy hitters"
        )
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    src = df.select(text_col)

    def pass1(batches):
        sketch: dict = {}  # signed int64 hash -> [count, rep string]
        n_part = 0
        for batch in batches:
            got = _batch_gram_counts(batch, text_col, ngram, seed)
            if got is None:
                continue
            uniq, counts, reps, tot = got
            n_part += tot
            _mg_merge(sketch, uniq.astype(np.int64), counts, reps, capacity)
        out = pd.DataFrame(
            {
                "gram": [e[1] for e in sketch.values()] + [None],
                "h": list(sketch.keys()) + [0],
                "est": [e[0] for e in sketch.values()] + [0],
                "n_part": [0] * len(sketch) + [n_part],
            }
        )
        yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    sketch_df = src.mapInArrow(pass1, SKETCH_SCHEMA).localCheckpoint()
    # ≤ capacity+1 rows per partition (the candidate summary, not data).
    # Merge sketches IN SPARK and prune by the provable upper bound before
    # anything reaches the driver: for any item g,
    #   c(g) ≤ Σ_p est_p(g) + n/capacity
    # (each partition's MG underestimates by ≤ n_p/capacity, present or
    # absent), while a true heavy hitter has Σ est ≥ c − n/capacity >
    # n/T − n/capacity. Keeping est·T·capacity > n·(capacity − T) is
    # therefore still a SUPERSET of the hitters, but the driver collect
    # shrinks from O(capacity × partitions) rows to the certifiable
    # candidates only — the shape that survives 10k-partition scans.
    n_total = (
        sketch_df.agg(F.sum("n_part").alias("n")).collect()[0].n or 0
    )
    cand_rows = (
        sketch_df.filter(F.col("gram").isNotNull())
        .groupBy("h")
        .agg(F.sum("est").alias("est"), F.first("gram").alias("gram"))
        .filter(
            F.col("est") * inv_threshold * capacity
            > F.lit(n_total) * (capacity - inv_threshold)
        )
        .collect()
    )
    from .graph import _release_checkpoint

    _release_checkpoint(sketch_df)  # both consumers done; free the blocks
    cand = {r.h: r.gram for r in cand_rows}
    cand_hashes = np.array(sorted(cand.keys()), dtype=np.int64)

    def pass2(batches):
        for batch in batches:
            got = _batch_gram_counts(batch, text_col, ngram, seed)
            if got is None:
                continue
            uniq, counts, _reps, _tot = got
            signed = uniq.astype(np.int64)
            m = np.isin(signed, cand_hashes)
            if not m.any():
                continue
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame({"h": signed[m], "cnt": counts[m]}),
                preserve_index=False,
            )

    spark = df.sparkSession
    exact = (
        src.mapInArrow(pass2, PARTIAL_SCHEMA)
        .groupBy("h")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cand_df = spark.createDataFrame(
        [(h, g) for h, g in cand.items()], "h long, gram string"
    )
    return (
        exact.join(F.broadcast(cand_df), "h")  # bounded candidate dim
        .filter(F.col("cnt") * inv_threshold > F.lit(n_total))
        .select("gram", "cnt")
    )
