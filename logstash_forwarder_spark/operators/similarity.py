"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the candidate corpus; dot products via ``F.zip_with`` +
  ``F.aggregate`` in double precision (JVM, codegen). The correctness
  baseline, and the right plan whenever |queries| is broadcast-sized.
* ``lsh_topk`` — random-hyperplane LSH: deterministic hash-derived planes,
  sign-bit signatures, hamming-ball bucket join, exact re-rank inside the
  candidate set. The 100 TB path: candidate generation is an equi-join on a
  bounded key, never |Q|×|C|.
* ``cosine_near_dup_pairs`` — embedding near-duplicate pairs (cos ≥ τ)
  via the same LSH blocking, exact verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_PLANES = 16


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm2(a) * _norm2(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, rank, neighbor_id, cos).

    Rank ties break on neighbor id, so output is deterministic. The query
    side is broadcast — the cross join is |C| tasks × |Q| rows, no shuffle
    of the candidate corpus.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def _plane(dim: int, plane_id: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j ∈ {-1, +1} from a
    counter-based hash — reproducible across engines and partitionings."""
    out = []
    for j in range(dim):
        h = hash((seed, plane_id, j)) & 0xFFFFFFFF  # noqa: S324 — not crypto
        out.append(1.0 if h & 1 else -1.0)
    return out


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as an int (bit p = 1 iff dot(vec, plane_p) > 0)."""
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig.cast("int")


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = DEFAULT_PLANES,
    hamming_radius: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, probe all buckets
    within ``hamming_radius`` bit-flips (multi-probe), exact re-rank inside
    candidates. Output shape matches brute_force_topk (+ ``probed`` count).
    """
    planes = [_plane(dim, p, seed) for p in range(n_planes)]
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    )
    # multi-probe: each query probes its own bucket plus radius-1..r flips
    probes = [F.lit(0)] + [F.lit(1 << p) for p in range(n_planes)]
    if hamming_radius >= 2:
        probes += [
            F.lit((1 << p) ^ (1 << q))
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            signature_col(F.col(vec_col), planes).alias("q_sig"),
        )
        .withColumn("_probe", F.explode(F.array(*probes)))
        .withColumn("bucket", F.col("_probe").bitwiseXOR(F.col("q_sig")).cast("int"))
        .drop("_probe")
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = DEFAULT_PLANES,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ threshold) via LSH blocking: vectors
    this similar almost surely share a signature bucket; exact verify after
    the equi-join keeps precision at 1."""
    planes = [_plane(dim, p, seed) for p in range(n_planes)]
    sk = df.select(
        F.col(id_col),
        F.col(vec_col),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    )
    a = sk.alias("a")
    b = sk.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
