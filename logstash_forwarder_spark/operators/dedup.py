"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

* exact          — hash-groupBy on a normalization fingerprint (one shuffle)
* ngram Jaccard  — shingle explode → self-join on shingle → integer-exact
                   Jaccard threshold (shuffle keyed by shingle; high-DF
                   shingles capped to bound the join fan-out)
* MinHash + LSH  — k-permutation minhash (one explode + k mins, JVM-side) →
                   banded bucket join so candidate generation is
                   O(near-dups), not O(n²)
* SimHash        — 64-bit sign-sketch in 4×16-bit chunks; pairs within small
                   hamming distance must collide on ≥1 exact chunk
                   (pigeonhole), so blocking is an equi-join
* embedding      — cosine near-dup via random-hyperplane bucketing, with a
                   brute-force variant as the small-scale baseline

Everything is built-in expressions — no Python in any per-row path. At
100 TB each strategy's candidate generation is a single hash-partitioned
shuffle on a bounded-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 3
DEFAULT_MINHASH_K = 32
DEFAULT_BANDS = 8  # 8 bands × 4 rows = 32 signature slots


def _norm(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (normalized) docs: (fp, n_dups, keeper)."""
    fp = F.md5(_norm(F.col(text_col))).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per normalized-text fingerprint.

    ONE hash-agg shuffle: ``min_by(struct(all columns), id)`` picks the
    keeper row inside the aggregation — no join back to the input (the
    groupBy + self-join formulation shuffles the table twice and was 12×
    slower at sf0.1). ``id_col`` must be unique (ties would pick an
    arbitrary row among equals)."""
    cols = df.columns
    return (
        df.withColumn("_fp", F.md5(_norm(F.col(text_col))))
        .groupBy("_fp")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_keep"))
        .select("_keep.*")
    )


def shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    words = F.split(_norm(F.col(text_col)), " ")
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty-array branch rather than an empty sequence
    grams = F.when(F.size(words) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        )
    )
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def shingle_hash_relation(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    seed: int = 42,
) -> DataFrame:
    """(id, sh:bigint) — one row per DISTINCT shingle per doc, with the
    shingle as its 64-bit kernel hash instead of a string. Same relation as
    ``shingles`` up to the (collision-negligible) hash, but produced by the
    Arrow kernel inside the scan and 8 bytes per key instead of a ~20-40
    byte string — the join/shuffle currency for exact-Jaccard at scale.

    Any shingle grain n: the kernel's n-step hash fold handles 3-grams
    (Jaccard/MinHash/SimHash) and 8-grams (span dedup) alike."""
    import numpy as np
    import pyarrow as pa

    id_type = df.schema[id_col].dataType.simpleString()

    def op(batches):
        for b in batches:
            seg_rows, _seg_starts, dhash, dcounts, _wl = _distinct_shingle_hashes(
                b, text_col, n, seed
            )
            idx = b.schema.get_field_index(id_col)
            ids = b.column(idx).take(
                pa.array(np.repeat(seg_rows, dcounts), pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(dhash.view(np.int64), pa.int64())],
                names=[id_col, "sh"],
            )

    return df.select(id_col, text_col).mapInArrow(
        op, schema=f"{id_col} {id_type}, sh bigint"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold_pct: int = 50,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Candidate pairs with Jaccard ≥ threshold_pct/100, integer-exact.

    ``common * 100 >= threshold_pct * (|A| + |B| - common)`` avoids float
    entirely. Shingles appearing in > max_shingle_df docs are dropped before
    the self-join (standard DF-cap: they would dominate the join fan-out
    while contributing little discrimination). Doc sizes are computed from
    the SAME capped relation, so the Jaccard is exact over the capped
    shingle universe — numerator and denominator see identical shingles.

    Shingle identity is the kernel's 64-bit hash, not the string: the
    relation comes out of the scan via mapInArrow (no interpreted
    ``transform``, no string shuffle) and the self-join moves 8-byte keys.
    Distinct shingles colliding in 64 bits would merge counts; at 1e9
    distinct shingles P(any collision) ≈ 2.7e-2 birthday-bounded and the
    DF-cap bounds the damage of any single merge — the exactness claim is
    "exact over the hashed shingle universe"."""
    sh = shingle_hash_relation(df, id_col=id_col, text_col=text_col, n=n)
    df_cap = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") <= max_shingle_df)
        .select("sh")
    )
    sh = sh.join(df_cap, "sh")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sh_count"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sh_count").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sh_count").alias("size_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_size", F.col("size_a") + F.col("size_b") - F.col("common"))
        .filter(F.col("common") * 100 >= threshold_pct * F.col("union_size"))
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.col("common").cast("long").alias("common"),
        F.col("union_size").cast("long").alias("union_size"),
    )


# ---------------------------------------------------------------------------
# Arrow sketch kernels — signatures are row-local, so they are computed
# inside the scan (mapInArrow), NEVER via a groupBy over exploded shingles:
# the exploded relation is 50-500× the input and shuffling it just to take
# per-row mins was the single largest cost in the round-1 bench (27 s of a
# 92 s e2e at sf0.1). Pattern follows operators/parse.py.
# ---------------------------------------------------------------------------


def _mix_n(wh, pos, n: int, seed: int):
    """Combine n consecutive word hashes (wh[pos+0..n-1]) into shingle
    hashes (uint64 wraps). The n-step XOR-multiply fold reduces to the
    original 3-gram combiner exactly at n = 3."""
    import numpy as np

    P = np.uint64(0x9E3779B97F4A7C15)
    s = np.uint64(seed * 2 + 1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash design
        h = np.full(pos.shape, s, np.uint64)
        for j in range(n):
            h = (h ^ wh[pos + np.int64(j)]) * P
        return h ^ (h >> np.uint64(29))


def _mix3(h1, h2, h3, seed: int):
    """3-gram combiner kept for reference/tests; _mix_n(n=3) is identical."""
    import numpy as np

    P = np.uint64(0x9E3779B97F4A7C15)
    s = np.uint64(seed * 2 + 1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash design
        h = (h1 ^ s) * P
        h = (h ^ h2) * P
        h = (h ^ h3) * P
        return h ^ (h >> np.uint64(29))


def _shingle_occurrences(batch, text_name: str, n: int, seed: int):
    """Per Arrow batch: EVERY normalized word n-gram occurrence with its
    0-based start word position. Returns (row_of_sh, within, sh, wlens):

    * row_of_sh — batch row index of each occurrence (ascending runs)
    * within    — 0-based word position of the gram's first word
    * sh        — uint64 shingle hash per occurrence
    * wlens     — word count per row (ALL rows)

    Word strings are hashed once (pandas' vectorized 64-bit string hash);
    shingle hashes combine n consecutive word hashes arithmetically, so no
    shingle string is ever materialized.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if n < 1:
        raise ValueError(f"shingle size n must be >= 1, got {n}")
    col = batch.column(batch.schema.get_field_index(text_name))
    txt = pc.fill_null(col, "")
    txt = pc.utf8_lower(pc.utf8_trim(pc.replace_substring_regex(txt, r"\s+", " "), " "))
    words = pc.split_pattern(txt, " ")
    if isinstance(words, pa.ChunkedArray):  # pragma: no cover
        words = words.combine_chunks()
    offs = words.offsets.to_numpy(zero_copy_only=True).astype(np.int64)
    base = int(offs[0])
    starts = offs[:-1] - base
    wlens = offs[1:] - offs[:-1]
    flat_words = words.values.slice(base, int(offs[-1]) - base)
    wh = pd.util.hash_array(flat_words.to_numpy(zero_copy_only=False))  # uint64

    slens = np.maximum(wlens - (n - 1), 0)
    total_sh = int(slens.sum())
    if not total_sh:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.uint64), wlens)
    row_of_sh = np.repeat(np.arange(len(slens), dtype=np.int64), slens)
    seg0 = np.cumsum(slens) - slens
    within = np.arange(total_sh, dtype=np.int64) - np.repeat(seg0, slens)
    pos = starts[row_of_sh] + within
    sh = _mix_n(wh, pos, n, seed)
    return row_of_sh, within, sh, wlens


def _distinct_shingle_hashes(batch, text_name: str, n: int, seed: int):
    """Per Arrow batch: normalized word n-gram shingle hashes, distinct per
    row. Returns (seg_rows, seg_starts, dhash, dcounts, wlens):

    * seg_rows   — batch row indices that have ≥1 shingle (ascending)
    * seg_starts — start offset of each row's segment inside ``dhash``
    * dhash      — uint64 distinct shingle hashes, grouped by row
    * dcounts    — distinct-shingle count per present row
    * wlens      — word count per row (ALL rows, not just present ones)
    """
    import numpy as np

    row_of_sh, _within, sh, wlens = _shingle_occurrences(batch, text_name, n, seed)
    total_sh = len(sh)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.uint64), np.empty(0, np.int64), wlens)
    if not total_sh:
        return empty

    # distinct per row: sort (row, hash), drop consecutive duplicates
    order = np.lexsort((sh, row_of_sh))
    srow, shash = row_of_sh[order], sh[order]
    keep = np.empty(total_sh, dtype=bool)
    keep[0] = True
    keep[1:] = (srow[1:] != srow[:-1]) | (shash[1:] != shash[:-1])
    drow, dhash = srow[keep], shash[keep]
    seg_starts = np.flatnonzero(
        np.concatenate(([True], drow[1:] != drow[:-1]))
    ).astype(np.int64)
    seg_rows = drow[seg_starts]
    dcounts = np.diff(np.append(seg_starts, len(drow)))
    return seg_rows, seg_starts, dhash, dcounts, wlens


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    k: int = DEFAULT_MINHASH_K,
    seed: int = 42,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, *passthrough], sig: array<bigint>[k]) — k-permutation minhash
    over distinct word n-gram shingles, computed entirely inside the scan
    (mapInArrow): per permutation p, sig[p] = min over shingles of
    (A_p * h + B_p) in uint64. Rows with no shingles are dropped (same as
    the exploded-groupBy formulation this replaces). No shuffle anywhere.

    ``passthrough`` columns ride along untouched (e.g. the event-time
    column a streaming consumer needs for its watermark)."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    A = (rng.integers(1, 1 << 62, size=k, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.integers(0, 1 << 62, size=k, dtype=np.uint64)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = ", ".join(
        [f"{id_col} {id_type}"]
        + [f"{c} {df.schema[c].dataType.simpleString()}" for c in passthrough]
        + ["sig array<bigint>"]
    )

    def op(batches):
        for b in batches:
            seg_rows, seg_starts, dhash, _, _wl = _distinct_shingle_hashes(
                b, text_col, n, seed
            )
            m = len(seg_rows)
            sig = np.empty((m, k), dtype=np.uint64)
            for p in range(k):
                v = dhash * A[p] + B[p]
                if m:
                    sig[:, p] = np.minimum.reduceat(v, seg_starts)
            idx = pa.array(seg_rows, pa.int64())
            ids = b.column(b.schema.get_field_index(id_col)).take(idx)
            extra = [
                b.column(b.schema.get_field_index(c)).take(idx)
                for c in passthrough
            ]
            sig_col = pa.ListArray.from_arrays(
                pa.array(np.arange(m + 1, dtype=np.int64) * k, pa.int32()),
                pa.array(sig.reshape(-1).view(np.int64), pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, *extra, sig_col], names=[id_col, *passthrough, "sig"]
            )

    return df.select(id_col, *passthrough, text_col).mapInArrow(
        op, schema=out_schema
    )


def band_bucket_struct(bands: int, rows_per_band: int):
    """The banded-LSH bucket expression over a ``sig`` column — exploding
    each signature into ``bands`` (band, bucket) structs where bucket =
    xxhash64 of the band's signature slots. ONE definition shared by the
    batch self-join (minhash_lsh_pairs) and the streaming candidate stage
    (streaming/dedup_stream.py), so batch and stream can never disagree on
    bucketing."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bb")


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 42,
    signatures: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over minhash signatures.

    Docs sharing any band (all rows of the band equal) become a candidate
    pair. Returns (doc_a, doc_b, est_jaccard_pct: long) where the estimate
    is the fraction of matching signature slots ×100 (integer).

    Pass ``signatures`` (a persisted ``minhash_signatures`` output) to avoid
    recomputing the kernel on both sides of the self-join — at scale the
    signature table is materialized once and reused across dedup runs.

    ``max_bucket`` is the web-scale guard: a (band, bucket) shared by g docs
    emits g² candidates, so one mega-cluster of identical boilerplate makes
    the join quadratic. Buckets larger than the cap are dropped (their
    members are still found through their other bands unless they are
    near-identical — run exact dedup first, which removes exactly those).
    """
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows_per_band = k // bands
    # internally-computed signatures are pinned: both self-join sides
    # consume them and Spark recomputes per DAG branch (no CSE across
    # branches), so without the pin the minhash kernel ran twice per
    # query (r8 plan audit) — exactly what the ``signatures`` parameter
    # avoids for persisted stores
    sigs = (
        signatures
        if signatures is not None
        else minhash_signatures(
            df, id_col=id_col, text_col=text_col, n=n, k=k, seed=seed
        ).localCheckpoint(eager=True)
    )
    banded = sigs.select(
        id_col, "sig", band_bucket_struct(bands, rows_per_band)
    ).select(id_col, "sig", "bb.band", "bb.bucket")
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    matches = F.size(
        F.filter(
            F.zip_with("a.sig", "b.sig", lambda x, y: x == y), lambda m: m
        )
    )
    # est_jaccard_pct is pair-intrinsic (a function of the two sigs), so
    # computing it BEFORE the dedup lets dropDuplicates run as a hash
    # aggregate over three BIGINTs — the r7 form deduped first and
    # carried both k-slot sig arrays through a Sort + SortAggregate
    # (arrays defeat hash aggregation), shuffling 2k longs per pair
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            (matches * 100 / F.lit(k)).cast("long").alias("est_jaccard_pct"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _cap_buckets(
    blocked: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop blocking buckets with more than max_bucket members (None = no
    cap). The size relation is tiny (one row per distinct bucket) and the
    filter is a broadcast-able semi-join, so the cap costs one cheap
    aggregate while bounding the self-join at O(max_bucket²) per bucket."""
    if max_bucket is None:
        return blocked
    ok = (
        blocked.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") <= max_bucket)
        .select(*keys)
    )
    return blocked.join(ok, keys, "left_semi")


def simhash_chunks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    n_chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash as n_chunks equal bit-chunks (c0..c{n_chunks-1}, ints),
    computed inside the scan (mapInArrow): bit i of the sketch is the sign
    of Σ over distinct shingles of ±1 by bit i of the shingle hash —
    i.e. ones_i * 2 > count. One bit-unpack + one reduceat per batch, no
    shuffle (this replaces 64 conditional sums through a groupBy over the
    exploded shingle relation). More chunks → blocking catches larger
    hamming distances (≤ n_chunks-1 guaranteed by pigeonhole) at the cost
    of more candidate pairs. Rows with no shingles are dropped.
    """
    import numpy as np
    import pyarrow as pa

    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    bits_per = 64 // n_chunks
    id_type = df.schema[id_col].dataType.simpleString()
    ccols = [f"c{c}" for c in range(n_chunks)]
    out_schema = ", ".join([f"{id_col} {id_type}"] + [f"{c} int" for c in ccols])

    def op(batches):
        for b in batches:
            seg_rows, seg_starts, dhash, dcounts, _wl = _distinct_shingle_hashes(
                b, text_col, n, seed
            )
            m = len(seg_rows)
            # (total_shingles, 64) 0/1 matrix, little-endian bit order
            bits = np.unpackbits(
                dhash.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            if m:
                # per-segment column sums via cumsum + boundary differences:
                # 2-D reduceat along axis 0 iterates per segment per column
                # (measured 11 s on 260k×64) — the cumsum formulation is two
                # sequential passes (~50 ms)
                csum = np.cumsum(bits, axis=0, dtype=np.int64)
                ends = np.append(seg_starts[1:], len(bits))
                upper = csum[ends - 1]
                lower = np.zeros_like(upper)
                nz = seg_starts > 0
                lower[nz] = csum[seg_starts[nz] - 1]
                ones = upper - lower
            else:
                ones = np.zeros((0, 64), dtype=np.int64)
            sketch = (ones * 2 > dcounts[:, None]).astype(np.int64)  # (m, 64)
            weights = np.left_shift(1, np.arange(bits_per, dtype=np.int64))
            chunks = sketch.reshape(m, n_chunks, bits_per) @ weights  # (m, n_chunks)
            ids = b.column(b.schema.get_field_index(id_col)).take(
                pa.array(seg_rows, pa.int64())
            )
            arrays = [ids] + [
                pa.array(chunks[:, c].astype(np.int32), pa.int32())
                for c in range(n_chunks)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=[id_col] + ccols)

    return df.select(id_col, text_col).mapInArrow(op, schema=out_schema)


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    max_hamming: int = 3,
    n_chunks: int = 4,
    seed: int = 42,
    chunks: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Blocking finds
    every pair with hamming ≤ n_chunks-1 (pigeonhole: some chunk matches
    exactly → equi-join); beyond that recall decays — raise n_chunks for
    small/noisy docs. Pass ``chunks`` (a persisted ``simhash_chunks``
    output) to avoid recomputing the kernel on both self-join sides;
    ``max_bucket`` drops hot blocking buckets (see minhash_lsh_pairs)."""
    sk = (
        chunks
        if chunks is not None
        else simhash_chunks(df, id_col=id_col, text_col=text_col, n=n, n_chunks=n_chunks, seed=seed)
    )
    ccols = [f"c{c}" for c in range(n_chunks)]
    blocked = sk.select(
        id_col,
        *ccols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk_id"), F.col(f"c{c}").alias("chunk"))
                    for c in range(n_chunks)
                ]
            )
        ).alias("blk"),
    ).select(id_col, *ccols, "blk.chunk_id", "blk.chunk")
    blocked = _cap_buckets(blocked, ["chunk_id", "chunk"], max_bucket)
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.c{c}").bitwiseXOR(F.col(f"b.c{c}")).cast("long")
        )
        for c in range(n_chunks)
    )
    return (
        a.join(b, ["chunk_id", "chunk"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        # hamming is pair-intrinsic, so filtering BEFORE the dedup shrinks
        # the dropDuplicates shuffle to just the surviving pairs
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def edit_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    len_bucket: int = 16,
    max_dist: int = 70,
    max_block_docs: int | None = 10_000,
) -> DataFrame:
    """Fuzzy-dedup verify stage: exact Levenshtein distance over BLOCKED
    candidate pairs — (block_col, floor(length/len_bucket)) equi-join, id
    ascending to emit each unordered pair once.

    This is the verify half of the classic block-then-verify fuzzy dedup:
    any blocking scheme (here a cheap length bucket; LSH buckets in
    minhash_lsh_pairs) bounds the candidate fan-out, then an exact string
    metric confirms. Two scale properties make it safe at 10^12 rows:

    * the equi-join shuffles on a bounded composite key — candidate count
      is sum over blocks of C(block_size, 2), never corpus^2;
    * Spark's 3-arg ``levenshtein(l, r, threshold)`` caps the DP band at
      ``threshold`` (O(len * threshold) not O(len^2)), returning -1 for
      over-threshold pairs, so a far pair costs almost nothing to reject.

    Pairs whose lengths differ across a bucket boundary are not candidates
    (documented blocking loss — identical in the oracle SQL, so the
    comparison is still exact over the same candidate set).

    A length bucket alone does NOT bound block size (one hot source+length
    could hold millions of near-identical-length docs), so blocks larger
    than ``max_block_docs`` are dropped via the same hot-bucket cap the
    LSH joins use (documented recall loss on pathological blocks; the cap
    is replicated in the oracle SQL so compared candidate sets stay
    identical). At 10^12 rows this caps worst-case work at
    O(#blocks * max_block_docs²).
    """
    norm = _norm(F.col(text_col))
    b = df.select(
        F.col(id_col).alias("_id"),
        norm.alias("_t"),
        F.col(block_col).alias("_blk"),
        F.floor(F.length(norm) / len_bucket).alias("_lb"),
    )
    b = _cap_buckets(b, ["_blk", "_lb"], max_block_docs)
    left = b.select(
        F.col("_id").alias("doc_a"), F.col("_t").alias("_ta"), "_blk", "_lb"
    )
    right = b.select(
        F.col("_id").alias("doc_b"), F.col("_t").alias("_tb"), "_blk", "_lb"
    )
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist)
    return (
        left.join(right, on=["_blk", "_lb"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("dist", dist.cast("long"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("doc_a", "doc_b", "dist")
    )


def shingle_pos_relation(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    seed: int = 42,
) -> DataFrame:
    """(id, pos:bigint, sh:bigint) — one row per n-gram OCCURRENCE with its
    0-based start word position. Same Arrow kernel as
    ``shingle_hash_relation`` but without the per-doc distinct: the input
    to positional span operations (``span_cut``), where repeated grams
    inside one doc matter."""
    import numpy as np
    import pyarrow as pa

    id_type = df.schema[id_col].dataType.simpleString()

    def op(batches):
        for b in batches:
            row_of_sh, within, sh, _wl = _shingle_occurrences(b, text_col, n, seed)
            idx = b.schema.get_field_index(id_col)
            ids = b.column(idx).take(pa.array(row_of_sh, pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(within, pa.int64()),
                 pa.array(sh.view(np.int64), pa.int64())],
                names=[id_col, "pos", "sh"],
            )

    return df.select(id_col, text_col).mapInArrow(
        op, schema=f"{id_col} {id_type}, pos bigint, sh bigint"
    )


def span_cut(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Span-level exact-substring REMOVAL (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): every duplicated word
    n-gram keeps its globally-first occurrence and every other occurrence
    is cut — a word is removed when any removed gram occurrence covers it.

    The suffix-array machinery of the paper is re-expressed relationally:

    1. kernel gram-occurrence relation (id, pos, sh) — 8-byte keys,
       emitted inside the scan, O(corpus words) rows;
    2. ONE sh-keyed exchange: ``row_number() OVER (PARTITION BY sh ORDER
       BY id, pos)`` — occurrence rn >= 2 is a removed span start (rn >= 2
       implies corpus frequency >= 2, and the min (id, pos) occurrence is
       the deterministic survivor). No df-count pre-pass, no pair
       enumeration — O(corpus), not O(pairs);
    3. ONE doc-keyed exchange: dense word positions + a
       ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`` running max over the
       span-start flags marks covered words (positions are dense, so the
       row-frame IS the word-distance predicate), and the same partition
       reassembles the kept text.

    Decisions depend only on gram IDENTITY (grouping), never on hash
    values, so an engine with a different hash — or the DuckDB oracle on
    gram strings — reproduces the output bit-for-bit (64-bit collisions
    birthday-bounded as in ``ngram_jaccard_pairs``).

    Hottest gram = largest window partition in step 2; boilerplate grams
    with millions of occurrences sort within one partition. AQE skew-join
    handles the join back; if one gram dominates a corpus, cap it upstream
    the way ``max_shingle_df`` does for Jaccard (every occurrence past the
    cap is removed anyway — only the survivor matters).

    Output: (id, n_words, n_removed, kept_text) — integer-exact counts
    over the normalized word list; ``kept_text`` is the space-joined
    surviving words ('' when everything was cut).
    """
    from pyspark.sql import Window as W

    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(_norm(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("w_pos", "word"),
    )
    occ = shingle_pos_relation(df, id_col=id_col, text_col=text_col, n=n)
    w_rn = W.partitionBy("sh").orderBy(id_col, "pos")
    spans = (
        occ.withColumn("_rn", F.row_number().over(w_rn))
        .filter(F.col("_rn") >= 2)
        .select(F.col(id_col), F.col("pos").alias("w_pos"), F.lit(1).alias("_cut"))
    )
    w_cov = (
        W.partitionBy(id_col)
        .orderBy("w_pos")
        .rowsBetween(-(n - 1), W.currentRow)
    )
    covered = F.max(F.coalesce("_cut", F.lit(0))).over(w_cov)
    marked = words.join(spans, [id_col, "w_pos"], "left").withColumn(
        "_cov", covered
    )
    kept_struct = F.when(F.col("_cov") == 0, F.struct("w_pos", "word"))
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("_cov").cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["word"]
            ),
            " ",
        ).alias("kept_text"),
    )


def span_share_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Cross-document span-sharing rate — the triage stat behind span-level
    (exact-substring) dedup a la Lee et al.: per doc, how many of its
    distinct word n-grams (default 8, the span grain) also occur in at
    least ``min_df - 1`` other docs, plus the integer ppm rate.

    Scale shape: the kernel emits the DISTINCT (doc, gram-hash) relation
    inside the scan (8-byte keys); ONE exchange keys it by gram for the
    document-frequency count, and the df relation joins back on the same
    key — co-partitioned, no second shuffle of the big side — before a
    final per-doc count. Nothing driver-side; no pair enumeration (this
    is the O(corpus) stat, not the O(pairs) join).

    Output: (doc_id, n_grams, n_shared_grams, shared_ppm) — BIGINT,
    integer-exact; docs shorter than n words report zeros.

    ``materialize`` (default True) pins the kernel relation with
    ``localCheckpoint``: the document-frequency agg AND the join side
    both consume it, and Spark recomputes per DAG branch (no CSE), so
    un-pinned the shingle kernel ran twice per query (r8 plan audit;
    1.24 s → 0.98 s at sf0.1). MEMORY_AND_DISK checkpoint storage
    spills gracefully — at production scale a span-dedup pipeline
    persists this relation anyway rather than re-scanning the corpus
    text (the Lee et al. suffix-table analog).
    """
    rel = shingle_hash_relation(df, id_col=id_col, text_col=text_col, n=n)
    if materialize:
        rel = rel.localCheckpoint(eager=True)
    dfreq = rel.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    per = (
        rel.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_n_grams"),
            F.sum(F.when(F.col("_df") >= min_df, 1).otherwise(0)).alias("_n_shared"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("_n_shared", F.lit(0)).cast("long").alias("n_shared_grams"),
            F.when(
                F.coalesce("_n_grams", F.lit(0)) > 0,
                F.expr("_n_shared * 1000000 DIV _n_grams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("shared_ppm"),
        )
    )


def sketch_text(
    text,
    *,
    minhash_p: int,
    minhash_perms: list,
    simhash_bits: int = 32,
):
    """Pure per-text sketch math of the portable witnesses: (minhash
    signature list | None, simhash | None). Engine-neutral definition —
    md5 of each distinct normalized 3-gram; affine permutations mod P;
    per-bit majorities with ties up — kept Spark-free so a hypothesis
    property test can sweep it against a naive reference directly."""
    import hashlib
    import re as _re

    words = (
        _re.sub(r"\s+", " ", (text or ""), flags=_re.ASCII).strip().lower().split(" ")
    )
    grams = (
        {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if len(words) >= 3
        else set()
    )
    if not grams:
        return None, None
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    hp = [h % minhash_p for h in hs]
    sigs = [
        min((h * a + b) % minhash_p for h in hp) for a, b in minhash_perms
    ]
    n = len(hs)
    sim = 0
    for bit in range(simhash_bits):
        if 2 * sum((h >> bit) & 1 for h in hs) >= n:
            sim |= 1 << bit
    return sigs, sim


def portable_sketches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    minhash_p: int,
    minhash_perms: list,
    simhash_bits: int = 32,
) -> DataFrame:
    """md5-based MinHash + SimHash signatures, computed in ONE mapInPandas
    pass — the fast Spark side of the cross-engine sketch witnesses.

    The mathematical definition is engine-neutral (md5 of the normalized
    3-gram, mod-P affine permutations / per-bit majorities) so a DuckDB
    explode + GROUP BY reproduces every value bit-exactly; HOW it is
    computed is free per engine, and the expression-HOF formulation was
    ~14 s at sf0.1 of pure interpreter overhead for the same values.
    Row-local: zero shuffle, partitioning preserved.
    """
    import pandas as pd

    n_perms = len(minhash_perms)
    sig_cols = ", ".join(f"sig{p} bigint" for p in range(n_perms))

    def op(batches):
        for pdf in batches:
            out = {
                id_col: pdf[id_col],
                **{f"sig{p}": [] for p in range(n_perms)},
                "simhash32": [],
            }
            for text in pdf[text_col]:
                sigs, sim = sketch_text(
                    text,
                    minhash_p=minhash_p,
                    minhash_perms=minhash_perms,
                    simhash_bits=simhash_bits,
                )
                for p in range(n_perms):
                    out[f"sig{p}"].append(sigs[p] if sigs else None)
                out["simhash32"].append(sim)
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        op, schema=f"{id_col} {id_type}, {sig_cols}, simhash32 bigint"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    w: int = 4,
    p: int = 1073741789,  # the sketch witnesses' prime (sketch.py P)
    fps_only: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): per position, hash the word
    k-gram; over every window of ``w`` consecutive hashes select the
    MINIMUM, rightmost occurrence on ties; a selection is recorded once
    per position. Guarantee: any match of ≥ w+k-1 words between two
    docs shares at least one fingerprint; expected density 2/(w+1) —
    the local fingerprinting primitive behind plagiarism detection and
    position-aware near-dup.

    One output row per selected fingerprint: (id, pos, fp). Docs with
    fewer than w k-grams winnow their single truncated window (the
    standard short-doc convention); docs shorter than k words emit
    nothing.

    Engine-portable by construction: the hash is the sketch witnesses'
    md5-mod-P family, and the rightmost-min tie rule is encoded in a
    single BIGINT key ``h * 2^33 + (2^33 - 1 - pos)`` whose window MIN
    both engines compute identically (h < 2^30 keeps the key within
    int64; pos is bounded by 2^33 — loudly asserted). Row-local
    mapInArrow kernel, zero shuffle (closes VERDICT r7 task 1: the r7
    per-row Python loop — md5 per gram string, ``min()`` over a list
    slice per window, O(m·w) interpreter work per doc — is replaced by
    batch-vectorized numpy: word offsets from the normalized Arrow
    buffer, gram bytes as zero-copy buffer slices, windowed minima via
    ``sliding_window_view``. md5 itself stays a per-gram hashlib call —
    the portable hash family the frozen oracle replays bit-exactly has
    no vectorized form — but it is the ONLY per-gram Python left and is
    a single C call on a buffer slice).

    ``fps_only=True`` emits the DISTINCT (id, fp) relation instead —
    the match step's join currency — deduplicated INSIDE the kernel
    (same-fp selections at different positions collapse), so the
    consumer pays no distinct exchange at all.
    """
    import hashlib

    id_type = df.schema[id_col].dataType.simpleString()
    M = 1 << 33

    def op(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        md5 = hashlib.md5
        from_bytes = int.from_bytes
        for b in batches:
            nrows = b.num_rows
            if not nrows:
                continue
            col = b.column(b.schema.get_field_index(text_col))
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            # identical normalization to the oracle: \s+ -> ' ', trim, lower
            # (both engines run RE2; the r7 Python-split form agreed on the
            # same corpus and the kernel now matches the SQL form literally)
            txt = pc.utf8_lower(
                pc.utf8_trim(
                    pc.replace_substring_regex(pc.fill_null(col, ""), r"\s+", " "),
                    " ",
                )
            )
            bufs = txt.buffers()
            toffs = np.frombuffer(bufs[1], np.int32)[
                txt.offset : txt.offset + nrows + 1
            ].astype(np.int64)
            data = (
                np.frombuffer(bufs[2], np.uint8)
                if bufs[2] is not None
                else np.empty(0, np.uint8)
            )
            s, e = toffs[:-1], toffs[1:]
            nonempty = e > s
            # word boundaries: every 0x20 byte is a separator (normalized
            # text is single-spaced; UTF-8 continuation bytes are >= 0x80)
            sp_all = np.flatnonzero(data[toffs[0] : toffs[-1]] == 32) + toffs[0]
            row_of_sp = np.searchsorted(e, sp_all, side="right")
            nw = np.bincount(row_of_sp, minlength=nrows) + nonempty
            assert int(nw.max(initial=0)) < M, (
                "winnow_fingerprints: doc exceeds 2^33 grams"
            )
            wstarts = np.sort(np.concatenate([s[nonempty], sp_all + 1]))
            ws0 = np.cumsum(nw) - nw
            m = np.maximum(nw - k + 1, 0) * (nw > 0)
            total = int(m.sum())
            if not total:
                continue
            row_of_g = np.repeat(np.arange(nrows, dtype=np.int64), m)
            seg0 = np.cumsum(m) - m
            within = np.arange(total, dtype=np.int64) - np.repeat(seg0, m)
            gidx = ws0[row_of_g] + within
            # gram i spans bytes [start of word i, end of word i+k-1): the
            # normalized text IS the gram string, so no gram is ever built
            gs = wstarts[gidx]
            is_last = within + k == nw[row_of_g]
            wst_pad = np.append(wstarts, 0)
            ge = np.where(
                is_last,
                e[row_of_g],
                wst_pad[np.minimum(gidx + k, len(wstarts))] - 1,
            )
            mv = memoryview(data)
            # md5 first-15-hex == (first 8 digest bytes as big-endian) >> 4
            fps = np.fromiter(
                (
                    (from_bytes(md5(mv[a:b2]).digest()[:8], "big") >> 4) % p
                    for a, b2 in zip(gs.tolist(), ge.tolist())
                ),
                np.int64,
                count=total,
            )
            keys = fps * M + (M - 1 - within)
            sel_rows: list = []
            sel_keys: list = []
            # full windows: end positions with within >= w-1 lie entirely
            # inside their own row, so one batch-wide sliding min serves all
            full = within >= w - 1
            if full.any():
                swv = np.lib.stride_tricks.sliding_window_view(keys, w).min(axis=1)
                pos_full = np.flatnonzero(full)
                sel_rows.append(row_of_g[pos_full])
                sel_keys.append(swv[pos_full - (w - 1)])
            # short docs (0 < m_r < w): the single truncated window is the
            # min of the whole segment (the standard short-doc convention)
            mg = m[m > 0]
            short = mg < w
            if short.any():
                seg_starts = np.cumsum(mg) - mg
                sel_rows.append(np.arange(nrows, dtype=np.int64)[m > 0][short])
                sel_keys.append(np.minimum.reduceat(keys, seg_starts)[short])
            srow = np.concatenate(sel_rows)
            skey = np.concatenate(sel_keys)
            # distinct selections per row: sort (row, key), drop dup pairs
            order = np.lexsort((skey, srow))
            srow, skey = srow[order], skey[order]
            keep = np.empty(len(srow), bool)
            keep[0] = True
            keep[1:] = (srow[1:] != srow[:-1]) | (skey[1:] != skey[:-1])
            srow, skey = srow[keep], skey[keep]
            if fps_only:
                fpv = skey // M
                # distinct (row, fp): srow is sorted; within a row, sort
                # fps and drop consecutive duplicates
                order2 = np.lexsort((fpv, srow))
                srow, fpv = srow[order2], fpv[order2]
                keep2 = np.empty(len(srow), bool)
                keep2[0] = True
                keep2[1:] = (srow[1:] != srow[:-1]) | (fpv[1:] != fpv[:-1])
                srow, fpv = srow[keep2], fpv[keep2]
                ids = b.column(b.schema.get_field_index(id_col)).take(
                    pa.array(srow, pa.int64())
                )
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(fpv, pa.int64())], names=[id_col, "fp"]
                )
                continue
            ids = b.column(b.schema.get_field_index(id_col)).take(
                pa.array(srow, pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(M - 1 - (skey % M), pa.int64()),
                    pa.array(skey // M, pa.int64()),
                ],
                names=[id_col, "pos", "fp"],
            )

    out_schema = (
        f"{id_col} {id_type}, fp long"
        if fps_only
        else f"{id_col} {id_type}, pos long, fp long"
    )
    return df.select(id_col, text_col).mapInArrow(op, schema=out_schema)


def winnow_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    w: int = 4,
    min_shared: int = 3,
    max_fp_df: int = 50,
) -> DataFrame:
    """Position-aware near-dup candidate pairs from winnowing
    fingerprints: docs sharing ≥ ``min_shared`` selected fingerprints —
    MOSS's match step as a relation. Same scale discipline as
    ngram_jaccard_pairs: fingerprints seen in > ``max_fp_df`` docs are
    dropped BEFORE the self-join (they dominate fan-out while carrying
    no discrimination), so candidate generation is one fp-keyed,
    DF-capped exchange — O(near-dups), never O(n²). Winnowing density
    2/(w+1) means this moves ~60% fewer keys than the full-shingle
    Jaccard join at the same k.

    The distinct fp relation is pinned with ``localCheckpoint``: the
    DF-cap aggregate and BOTH self-join sides consume it, and Spark
    recomputes a DataFrame per DAG branch (no CSE across branches —
    CLAUDE.md round-2), so without the pin the fingerprint kernel ran
    FOUR times per query (r8 plan audit). The pinned relation is
    density-thinned (2/(w+1) of gram count) — metadata-sized, not
    corpus-sized."""
    fps = winnow_fingerprints(
        df, id_col, text_col, k=k, w=w, fps_only=True
    ).localCheckpoint(eager=True)
    cap = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("fdf"))
        .filter(F.col("fdf") <= max_fp_df)
        .select("fp")
    )
    fps = fps.join(cap, "fp")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
