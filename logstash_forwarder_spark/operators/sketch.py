"""Bounded-state sketches for corpus curation at 100 TB — Bloom-filter
membership and Count-Min frequency estimation, both built from PORTABLE
arithmetic (affine hashes mod a prime < 2^30) so a DuckDB oracle can
reconstruct every bit of the sketch and the gate compares exact values,
false positives included.

Why these exist next to the exact operators:

* ``contamination_report`` (operators/curate.py) broadcasts the
  benchmark's exact distinct-shingle set. That is the right call while
  eval suites are MBs — but a *corpus-vs-corpus* decontamination (e.g.
  "remove anything the previous crawl already had") has a
  data-sized left side. The Bloom form broadcasts a BIT SET whose size
  is fixed by (k, m) regardless of how many keys were inserted: the
  100 TB shape. False positives are the price; they are deterministic
  functions of the hash algebra, so both engines flag the identical
  rows and the per-query docstring states the measured rate.
* Exact per-key counts (``groupBy key``) shuffle one row per distinct
  key — fine until the key is unbounded (user ids, token ids across a
  crawl). Count-Min keeps d×w counters TOTAL: per-partition map-side
  combine collapses the shuffle to ≤ d·w rows per task, and the merged
  sketch answers any point query with est ≥ exact (one-sided error,
  provable: every occurrence of key x increments all d of x's
  counters).

The reference forwards events and leaves analytics downstream
(/root/reference/publisher1.go:43); these extend SURVEY §2's
training-data tier the same way heavy-hitters (Misra-Gries) does —
bounded state, no raw-key shuffle, exactness claims proven by oracle
equality rather than asserted.

Hash family: ``pos_i(h) = ((a_i * pmod(h, P) + b_i) % P) % width`` with
P = 1073741789 (prime < 2^30, so a*h + b < 2^60 — BIGINT-safe in any
engine). ``pmod`` makes the algebra total over signed 64-bit inputs,
so the same operators run over the engine-fast xxhash64 shingle
relation (production path) or the md5-portable one (gated path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 1073741789  # prime < 2^30 — affine products stay BIGINT-safe

# (a, b) per hash function — same public-constant style as MINHASH_PERMS
BLOOM_COEFFS: list[tuple[int, int]] = [(389, 104729), (761, 95819), (1223, 88643)]
CMS_COEFFS: list[tuple[int, int]] = [
    (389, 104729),
    (761, 95819),
    (1223, 88643),
    (1543, 71993),
]


def _positions(key: Column, coeffs: list[tuple[int, int]], width: int) -> Column:
    """Array of (i, pos) structs — the k probe positions for ``key``."""
    h = F.pmod(key, F.lit(P))
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                ((h * F.lit(a) + F.lit(b)) % F.lit(P) % F.lit(width))
                .cast("long")
                .alias("pos"),
            )
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def bloom_bits(
    keys: DataFrame,
    key_col: str = "h",
    *,
    width: int,
    coeffs: list[tuple[int, int]] = BLOOM_COEFFS,
) -> DataFrame:
    """The filter's set bits as a (i int, pos long) relation.

    ≤ k·width rows no matter how many keys are inserted — the bounded
    artifact that gets broadcast. (A packed bitmap would be smaller
    still; the relational form keeps the probe a plain equi-join that
    any engine executes, and k·width rows of two ints is ~MBs at
    practical widths.)
    """
    return (
        keys.select(F.explode(_positions(F.col(key_col), coeffs, width)).alias("s"))
        .select(F.col("s.i").alias("i"), F.col("s.pos").alias("pos"))
        .distinct()
    )


def bloom_member(
    df: DataFrame,
    key_col: str,
    bits: DataFrame,
    *,
    width: int,
    coeffs: list[tuple[int, int]] = BLOOM_COEFFS,
) -> DataFrame:
    """Rows of ``df`` whose key passes ALL k probes (possible members).

    No false negatives by construction: a key inserted into ``bits``
    has all k of its positions set, so it always survives. ``df`` must
    be distinct on its columns (the k-way probe count below relies on
    it). The probe is posexplode → broadcast equi-join on (i, pos) →
    count == k per input row: ``df`` itself never re-shuffles on a data
    key, only on its own (already distinct) columns.
    """
    k = len(coeffs)
    probes = df.select(
        *df.columns, F.explode(_positions(F.col(key_col), coeffs, width)).alias("s")
    ).select(*df.columns, F.col("s.i").alias("i"), F.col("s.pos").alias("pos"))
    hit = probes.join(F.broadcast(bits), ["i", "pos"])
    return (
        hit.groupBy(*df.columns)
        .agg(F.count(F.lit(1)).alias("_k"))
        .filter(F.col("_k") == k)
        .drop("_k")
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    width: int,
    coeffs: list[tuple[int, int]] = CMS_COEFFS,
) -> DataFrame:
    """Count-Min counters as a (j int, bucket long, cnt long) relation.

    ONE hash-agg: the d-way explode happens map-side and the combine
    collapses each task's contribution to ≤ d·width partial rows, so
    the exchange carries sketch rows, never raw keys — the same
    discipline as heavyhitters.py. Missing counters are zero rows
    (absent), which ``cms_estimate`` must treat as 0.
    """
    return (
        df.select(F.explode(_positions(F.col(key_col), coeffs, width)).alias("s"))
        .groupBy(F.col("s.i").alias("j"), F.col("s.pos").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    key_col: str,
    counters: DataFrame,
    *,
    width: int,
    coeffs: list[tuple[int, int]] = CMS_COEFFS,
) -> DataFrame:
    """Point-query estimates: min over the d counters each key maps to.

    Output: probes' columns + ``est`` (BIGINT, ≥ the key's true count —
    the one-sided Count-Min guarantee). The counters relation is ≤
    d·width rows → broadcast; an inner join is safe for the estimate
    because a key with ANY empty counter has true count 0 and vanishing
    est is handled by the coalesce-to-0 left join below.

    Duplicate probe rows are tolerated: the groupBy collapses them to
    ONE output row per distinct probe tuple (same min, the duplicated
    (j, bucket, cnt) rows are identical), guarded by ``_d % d == 0``
    rather than ``_d == d`` so duplicates estimate instead of silently
    vanishing (ADVICE r5).
    """
    k = len(coeffs)
    pr = probes.select(
        *probes.columns,
        F.explode(_positions(F.col(key_col), coeffs, width)).alias("s"),
    ).select(*probes.columns, F.col("s.i").alias("j"), F.col("s.pos").alias("bucket"))
    joined = pr.join(F.broadcast(counters), ["j", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    # min over n·d probe rows per distinct key (n = duplicate multiplicity,
    # min unchanged); anything not a multiple of d is a real geometry bug
    est = (
        joined.groupBy(*probes.columns)
        .agg(F.min("cnt").cast("long").alias("est"), F.count(F.lit(1)).alias("_d"))
    )
    return est.filter(F.col("_d") % k == 0).drop("_d")


def cms_merge(*counters: DataFrame, width: int | None = None) -> DataFrame:
    """Merge independently-built Count-Min sketches (same coeffs/width)
    by summing counters per (j, bucket) — the property that makes the
    sketch distributable: shard-local sketches (or per-day sketches in
    a rolling corpus) merge into exactly the sketch of the union, so
    the exchange between shards carries ≤ d·width rows per shard, never
    data. Proven in tests/test_sketch.py::test_cms_merge_is_union.

    The min-over-d estimate bound only holds when every input shares
    the hash geometry — pass ``width`` to guard it: a bucket id ≥
    width (the signature of a sketch built wider) fails the plan at
    runtime instead of silently producing under-estimates. The guard is
    ONE-SIDED (ADVICE r5): a sketch built NARROWER than ``width`` has
    every bucket < width and cannot be detected from bucket ids alone —
    the relation carries no geometry metadata. Callers that persist
    sketches must carry the build width out-of-band (the registrar
    manifest's ``params`` field is the intended slot) and compare it
    exactly before merging; this guard is a last-line tripwire, not a
    proof of equality."""
    from functools import reduce

    if not counters:
        raise ValueError("cms_merge: need at least one sketch")
    allc = reduce(lambda a, b: a.unionByName(b), counters)
    if width is not None:
        allc = allc.filter(
            F.assert_true(
                F.col("bucket") < width,
                f"cms_merge: bucket id >= width={width} — input sketches "
                "were built with different geometries",
            ).isNull()
        )
    return allc.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


HLL_COEFF = (2029, 64763)  # fresh pair — decorrelates HLL from Bloom/CMS


def hll_registers(
    df: DataFrame,
    key_col: str,
    *,
    m: int = 64,
    coeff: tuple[int, int] = HLL_COEFF,
) -> DataFrame:
    """HyperLogLog register relation: (register, max_rank), ≤ m rows.

    h' = affine-mix(key) mod P; register = h' % m; the remaining value
    w = h' // m < 2^24 (for m = 64) contributes rank = 25 - len(bin(w))
    (w = 0 → 25, the all-zero convention). ``max`` per register is
    idempotent under duplicates, so NO distinct (and no distinct
    shuffle) is needed anywhere — the whole plan is one m-row hash-agg
    with map-side combine, the cheapest possible cardinality monitor at
    100 TB. The rank arithmetic is string-portable: Spark ``bin`` and
    DuckDB ``bin`` both render minimal binary, so the oracle rebuilds
    every register exactly. Estimate from the rows with
    :func:`hll_estimate` (driver-side fold over ≤ m rows).
    """
    if m & (m - 1):
        raise ValueError("hll_registers: m must be a power of two")
    a, b = coeff
    maxbits = (P // m).bit_length()  # 24 for m=64
    # count(distinct) ignores NULLs; so must the sketch (a NULL key
    # would otherwise emit a (NULL, NULL) register row)
    df = df.filter(F.col(key_col).isNotNull())
    h2 = (F.pmod(F.col(key_col), F.lit(P)) * F.lit(a) + F.lit(b)) % F.lit(P)
    w = F.shiftright(h2, m.bit_length() - 1)  # h2 // m, pure integer
    rank = F.when(w == 0, F.lit(maxbits + 1)).otherwise(
        F.lit(maxbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            (h2 % m).cast("long").alias("register"), rank.alias("rank")
        )
        .groupBy("register")
        .agg(F.max("rank").cast("long").alias("max_rank"))
    )


def hll_registers_by(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    m: int = 64,
    coeff: tuple[int, int] = HLL_COEFF,
) -> DataFrame:
    """Grouped HLL: one register relation PER GROUP — ≤ m rows ×
    |groups| total, from ONE (group, register) hash-agg with map-side
    combine. The per-source vocabulary-growth monitor: distinct-count
    per source without a per-source distinct shuffle anywhere. Same
    portable rank arithmetic as :func:`hll_registers`, so the oracle
    rebuilds every register; estimate per group by feeding each group's
    rows to :func:`hll_estimate`."""
    if m & (m - 1):
        raise ValueError("hll_registers_by: m must be a power of two")
    a, b = coeff
    maxbits = (P // m).bit_length()
    df = df.filter(F.col(key_col).isNotNull())
    h2 = (F.pmod(F.col(key_col), F.lit(P)) * F.lit(a) + F.lit(b)) % F.lit(P)
    w = F.shiftright(h2, m.bit_length() - 1)
    rank = F.when(w == 0, F.lit(maxbits + 1)).otherwise(
        F.lit(maxbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            (h2 % m).cast("long").alias("register"),
            rank.alias("rank"),
        )
        .groupBy("grp", "register")
        .agg(F.max("rank").cast("long").alias("max_rank"))
    )


def hll_estimate(rows: list, m: int = 64) -> float:
    """Fold the ≤ m (register, max_rank) rows into the HLL cardinality
    estimate (with the standard small-range linear-counting correction).
    Driver-side on purpose: the input is bounded by m, never by data."""
    import math

    got = {int(r[0]): int(r[1]) for r in (tuple(r) for r in rows)}
    ranks = [got.get(j, 0) for j in range(m)]
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / sum(2.0 ** -r for r in ranks)
    zeros = ranks.count(0)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est
