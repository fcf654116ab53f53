"""Distribution statistics over bounded integer domains.

``length_quantiles`` computes EXACT per-group quantiles of an integer
column (sequence length, token count) without a global sort and without
approximation. The trick is that training-pipeline length columns live on
a bounded domain (n_tok <= max sequence length, a few thousand distinct
values), so the full distribution fits in a tiny histogram:

  1. ``groupBy(group, value).count()`` — ONE shuffle, map-side partial
     aggregation; output size is |groups| x |domain|, independent of row
     count (at 10^12 rows the histogram is still ~groups x 4096 rows).
  2. per-group cumulative sum over the histogram — a window whose
     partitions are at most |domain| rows, never the raw data.
  3. quantile p = the smallest value whose cumulative count covers
     ceil(p% of n), selected with pure integer arithmetic
     (``cum * 100 >= p * n``) so any SQL engine reproduces it bit-exactly.

This is the scale-correct alternative to ``approx_percentile`` (sketch,
approximate) and to sorting 10^12 rows (a full-data range shuffle) when
the domain is known to be bounded.

Reference analog: the forwarder reports per-file progress stats from its
registrar snapshot (registrar.go:8-36) — tiny state summarizing a huge
stream; same shape here: a histogram summarizing the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def length_quantiles(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_tok",
    pcts: Sequence[int] = (25, 50, 75, 95),
) -> DataFrame:
    """Exact discrete quantiles (quantile_disc semantics: the smallest
    domain value v with cum_count(v) >= ceil(p/100 * n)) per group.

    Output: (group, n_docs, p<p1>, p<p2>, ...) — one row per group, all
    BIGINT, integer-exact across engines.

    NULL values are excluded from the distribution AND from n: engines
    disagree on NULL ordering (Spark windows sort NULLS FIRST, most SQL
    engines NULLS LAST), so a NULL-bearing histogram would silently skew
    every quantile differently per engine.
    """
    h = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        W.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(group_col)
    c = h.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum") * 100 >= F.lit(int(p)) * F.col("n"), F.col(value_col)
            )
        )
        .cast("long")
        .alias(f"p{int(p)}")
        for p in pcts
    ]
    return c.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n_docs"), *aggs
    )


def token_budget_cap(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
    bucket_width: int | None = None,
) -> DataFrame:
    """Deterministic hard token quota per group — the hard-cap complement
    to ``mixture_weights``' probabilistic downsampling: scanning each
    group's docs in ascending id order, a doc is kept while the tokens
    admitted BEFORE it are under ``budget`` (so the doc that crosses the
    line is admitted whole; everything after is cut). Reproducible at any
    parallelism, pure integer math.

    Scale shape — the naive form is one window over each group's ENTIRE
    doc set (a hot source at 100 TB = one executor sorting billions of
    rows). Instead, a two-level prefix sum:

      1. per-(group, id-bucket) token sums — ONE hash-agg shuffle whose
         output is |groups| x |id-buckets| rows, independent of doc count;
      2. running sum over BUCKETS per group — a window over the tiny
         bucket relation only;
      3. join back on (group, bucket) and an intra-bucket window — each
         window partition is one bucket's docs (<= bucket_width ids), so
         no partition ever holds a whole group.

    ``bucket_width=None`` (default) derives the width from the actual id
    range so the BUCKET relation itself stays bounded: width =
    range / 65536 (min 1024), i.e. at most ~65k bucket rows per group's
    window partition at ANY id scale — a fixed width would put
    range/width rows in one window partition (10^9 at 10^12 dense ids),
    recreating the hot-partition problem one level up. Costs one cheap
    min/max aggregation job.

    Requires non-negative integer ids (bucket = id DIV width must order
    like id). Output: (id, group, tok, cum_tok, keep) — cum_tok is the
    inclusive running total in id order; keep in {0,1}.
    """
    if bucket_width is None:
        lo, hi = df.agg(
            F.min(id_col).cast("long"), F.max(id_col).cast("long")
        ).first()
        span = (hi - lo + 1) if hi is not None else 1
        bucket_width = max(1024, -(-span // 65536))
    b = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(tok_col).cast("long").alias("_tok"),
        F.expr(f"{id_col} DIV {int(bucket_width)}").alias("_bkt"),
    )
    per_bucket = b.groupBy(group_col, "_bkt").agg(F.sum("_tok").alias("_btok"))
    w_bkt = (
        W.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    pre = per_bucket.withColumn(
        "_pre", F.coalesce(F.sum("_btok").over(w_bkt), F.lit(0))
    ).select(group_col, "_bkt", "_pre")
    w_intra = (
        W.partitionBy(group_col, "_bkt")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.col("_pre") + F.sum("_tok").over(w_intra)
    return (
        b.join(pre, [group_col, "_bkt"])
        .withColumn("cum_tok", cum.cast("long"))
        .select(
            id_col,
            group_col,
            F.col("_tok").alias("tok"),
            "cum_tok",
            (F.col("cum_tok") - F.col("_tok") < F.lit(int(budget)))
            .cast("long")
            .alias("keep"),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_tok",
) -> DataFrame:
    """Domain-mixing rebalance weights: per-group token share and the
    keep-probability (in ppm) that downsamples every over-represented
    group to a UNIFORM token budget of total/k per group.

    weight_ppm = min(1e6, floor((total/k) / group_tokens * 1e6)) — groups
    at or under budget keep everything (1e6); a group with 10x its share
    keeps ~100000 ppm. Applying the weight is a deterministic hash
    Bernoulli per row (xxhash64(doc_id) mod 1e6 < weight_ppm), so the
    rebalance is a map-side filter — no shuffle, reproducible at any
    parallelism.

    Scale shape: one hash-agg shuffle to |groups| rows, a 1-row total
    broadcast back — nothing else moves. The ppm math runs in DOUBLE
    with a final floor: both engines execute the identical IEEE-754 op
    sequence so the BIGINT outputs compare exactly (pure-BIGINT fixed
    point overflows at total*1e6 > 2^63, i.e. corpora past ~9e12 tokens).
    """
    per = df.groupBy(group_col).agg(F.sum(weight_col).alias("tok"))
    tot = per.agg(
        F.sum("tok").alias("t"), F.count(F.lit(1)).alias("k")
    )
    share = F.col("tok").cast("double") / F.col("t").cast("double")
    budget = F.col("t").cast("double") / F.col("k").cast("double")
    w = F.floor(budget / F.col("tok").cast("double") * F.lit(1000000.0))
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.col("tok").cast("long").alias("tok_total"),
        F.floor(share * F.lit(1000000.0)).cast("long").alias("share_ppm"),
        F.least(F.lit(1000000).cast("long"), w.cast("long")).alias("weight_ppm"),
    )


def curriculum_buckets(
    df: DataFrame,
    n_buckets: int,
    *,
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    bucket_width: int | None = None,
    total: int | None = None,
) -> DataFrame:
    """Length-curriculum shard assignment: rows ranked globally by
    ``(len_col, id_col)`` are cut into ``n_buckets`` near-equal shards —
    shard 0 holds the shortest docs, the last shard the longest. The
    standard curriculum-learning prep (train short-to-long) and the
    length-homogeneous packing precursor (same-length docs pack with
    minimal padding).

    A naive ``ntile`` is a GLOBAL window — one task sorts the world. The
    exact rank instead composes two bounded pieces (the
    ``length_quantiles`` / ``token_budget_cap`` discipline):

      1. base rank per length: ONE hash-agg to |domain| histogram rows,
         cumsum over that tiny relation (broadcast back);
      2. intra-length rank: two-level prefix sum over id-buckets, so no
         window partition ever exceeds |id-bucket| rows even when one
         length holds billions of docs (skew-proof — a corpus of
         identical lengths still ranks in bounded partitions).

    Shard = ``(rank - 1) * n_buckets DIV total`` — pure integer math,
    bit-reproducible by any engine (NOT ntile's ceil-first split; this
    formula is the deterministic shard assigner the pack/shard tier
    already uses). Output: ``(id_col, len_col, rank, bucket)``.

    ``bucket_width`` and ``total`` only tune INTERNAL partitioning /
    replace a count job — the rank (and therefore every output value)
    is identical for any valid width, and ``total`` must equal the
    non-NULL row count (callers with parquet-footer metadata pass both
    to skip two small driver jobs; r8).
    """
    if n_buckets <= 0:
        raise ValueError("curriculum_buckets: n_buckets must be positive")
    if bucket_width is None:
        lo, hi = df.agg(
            F.min(id_col).cast("long"), F.max(id_col).cast("long")
        ).first()
        span = (hi - lo + 1) if hi is not None else 1
        bucket_width = max(1024, -(-span // 65536))
    b = df.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias("_len"),
        F.expr(f"{id_col} DIV {int(bucket_width)}").alias("_bkt"),
    )
    # 1. per-length counts (bounded domain) -> exclusive base rank
    per_len = b.groupBy("_len").agg(F.count(F.lit(1)).alias("_ln"))
    w_len = W.orderBy("_len").rowsBetween(W.unboundedPreceding, -1)
    base = per_len.withColumn(
        "_base", F.coalesce(F.sum("_ln").over(w_len), F.lit(0))
    ).select("_len", "_base")
    if total is None:
        total = int(per_len.agg(F.sum("_ln")).first()[0] or 0)
    # 2. intra-length two-level prefix: per-(len, id-bucket) counts,
    # exclusive cumsum over buckets, then row_number within one bucket
    per_bucket = b.groupBy("_len", "_bkt").agg(F.count(F.lit(1)).alias("_bn"))
    w_bkt = (
        W.partitionBy("_len").orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    pre = per_bucket.withColumn(
        "_pre", F.coalesce(F.sum("_bn").over(w_bkt), F.lit(0))
    ).select("_len", "_bkt", "_pre")
    w_intra = W.partitionBy("_len", "_bkt").orderBy(id_col)
    rank = (
        F.col("_base") + F.col("_pre") + F.row_number().over(w_intra)
    ).cast("long")
    # integer DIV, never float division: (rank-1)*n_buckets exceeds 2^53
    # float mantissa precision long before 10^12 rows x n_buckets
    shard = (
        F.expr(f"((rank - 1) * {int(n_buckets)}) DIV {total}")
        if total
        else F.lit(0)
    ).cast("long")
    return (
        b.join(F.broadcast(base), "_len")
        .join(pre, ["_len", "_bkt"])
        .withColumn("rank", rank)
        .select(
            id_col,
            F.col("_len").alias(len_col),
            "rank",
            shard.alias("bucket"),
        )
    )
