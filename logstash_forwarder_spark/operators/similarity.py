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
    # multi-probe: each query probes its own bucket plus every bucket within
    # hamming_radius bit-flips (all C(n_planes, r) masks per radius r)
    import itertools

    probes = [
        F.lit(sum(1 << p for p in combo))
        for r in range(hamming_radius + 1)
        for combo in itertools.combinations(range(n_planes), r)
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


def _assign_cells_arrow(df: DataFrame, vec_col: str, centroids, out_col: str):
    """mapInArrow: nearest-centroid id per row via one numpy matmul on the
    reshaped flat buffer (embeddings are fixed-dim → values buffer reshapes
    (n, dim) zero-copy)."""
    import numpy as np
    import pyarrow as pa

    cmat = np.asarray(centroids, dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    dim = cmat.shape[1]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} int"]
    )

    def op(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index(vec_col))
            offs = col.offsets.to_numpy(zero_copy_only=True)
            flat = col.values.to_numpy(zero_copy_only=True)
            base, end = int(offs[0]), int(offs[-1])
            mat = flat[base:end].reshape(-1, dim).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cells = np.argmax((mat / norms) @ cmat.T, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                list(b.columns) + [pa.array(cells, pa.int32())],
                names=[f.name for f in b.schema] + [out_col],
            )

    return df.mapInArrow(op, schema=out_schema)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition candidates into Voronoi cells of
    sampled centroids, probe the query's ``n_probe`` nearest cells, exact
    cosine re-rank inside them. The classic scale path when |C| is huge:
    the search touches |C| * n_probe / n_cells candidates per query.

    Centroids are a deterministic sample of the candidate set (every
    ⌈|C|/n_cells⌉-th row by id order) — a k-means fit would drop in here
    unchanged; the cell-assignment and probe plumbing is what this
    implements. Assignment is one numpy matmul per Arrow batch.
    """
    import numpy as np

    cand_rows = (
        candidates.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(100_000)  # centroid sample pool; fine for any |C|
        .collect()
    )
    step = max(len(cand_rows) // n_cells, 1)
    centroids = [list(cand_rows[i][1]) for i in range(0, len(cand_rows), step)][
        :n_cells
    ]
    cmat = np.asarray(centroids, dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    c = _assign_cells_arrow(
        candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        centroids,
        "cell",
    )

    # query side: n_probe nearest cells, computed driver-side per query row
    # (queries are broadcast-sized by contract)
    q_rows = queries.select(id_col, vec_col).collect()
    probes = []
    for r in q_rows:
        v = np.asarray(r[1], dtype=np.float64)
        n = np.linalg.norm(v)
        v = v / (n if n else 1.0)
        order = np.argsort(-(cmat @ v))[:n_probe]
        for cell in order:
            probes.append((r[0], list(r[1]), int(cell)))
    spark = queries.sparkSession
    q = spark.createDataFrame(
        probes, f"query_id {queries.schema[id_col].dataType.simpleString()}, q_vec array<float>, cell int"
    )
    scored = c.join(F.broadcast(q), "cell").select(
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
