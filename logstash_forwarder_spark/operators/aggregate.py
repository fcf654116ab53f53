"""O-A1/O-A2 — aggregates with explicit skew salting.

The reference's two aggregates — last-offset-per-source
(/root/reference/registrar.go:12-29) and batch count
(/root/reference/publisher1.go:82) — generalize to per-(sink, source) row
counts and token totals. A hot ``source`` (60% of rows in the fixture) makes
the final groupBy shuffle skewed; AQE rebalances join skew but NOT groupBy
skew, so we salt explicitly: pre-aggregate by (keys..., salt) — which also
maximizes map-side partial aggregation — then re-aggregate without the salt.

For algebraic aggregates (count/sum/max/min) salted == unsalted exactly;
the property test asserts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 64


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    salt_on: str = "doc_id",
) -> DataFrame:
    """Two-phase skew-safe aggregate.

    ``aggs`` maps output column → (fn, input) with fn in
    {count, sum, max, min}. Phase 1 groups by keys+salt (salt =
    hash(salt_on) % buckets, uniform even when keys are hot); phase 2
    merges partials: count→sum, sum→sum, max→max, min→min.
    """
    _merge = {"count": "sum", "sum": "sum", "max": "max", "min": "min"}
    for fn, _ in aggs.values():
        if fn not in _merge:
            raise ValueError(f"non-algebraic agg {fn!r} cannot be salted")

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *(
            (F.count(inp) if fn == "count" else getattr(F, fn)(inp)).alias(out)
            for out, (fn, inp) in aggs.items()
        )
    )
    phase2 = phase1.groupBy(*keys).agg(
        *(
            getattr(F, _merge[fn])(out).alias(out)
            for out, (fn, _) in aggs.items()
        )
    )
    return phase2


def sink_source_counts(
    routed: DataFrame, *, salt_buckets: int = DEFAULT_SALT_BUCKETS
) -> DataFrame:
    """The north_rule's per-sink/per-source row counts + token totals."""
    return salted_agg(
        routed,
        keys=["sink", "source"],
        aggs={
            "row_count": ("count", "doc_id"),
            "token_total": ("sum", "n_tok"),
            "max_tokens": ("max", "n_tok"),
        },
        salt_buckets=salt_buckets,
    )


def last_offset_per_source(df: DataFrame, offset_col: str = "doc_id") -> DataFrame:
    """O-A1 verbatim: registrar's max-by fold (registrar.go:12-29)."""
    return df.groupBy("source").agg(F.max(offset_col).alias("last_offset"))


def skew_report(
    df: DataFrame,
    key_col: str,
    *,
    target_rows: int = 1_000_000,
    top_k: int = 20,
) -> DataFrame:
    """Key-skew diagnostic — the measurement half of "skew handled
    explicitly": per hottest key, its row count, corpus share (ppm,
    integer-exact) and the SALT BUCKET COUNT that bounds any single
    (key, salt) group to ≤ ``target_rows`` rows — i.e. exactly the
    ``salt_buckets`` argument :func:`salted_agg` needs for that key's
    aggregation to never overload one reducer.

    Scale shape: ONE map-side-combinable hash-agg to the key domain;
    the grand total comes from a second 1-row agg broadcast back onto
    the domain relation (never an unpartitioned window over it — the
    domain can be large for high-cardinality keys); top-k is a
    TakeOrdered, deterministic under ties (key ASC tiebreak)."""
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.expr("(n_rows * 1000000) div total").alias("share_ppm"),
            F.expr(f"(n_rows + {target_rows - 1}) div {target_rows}").alias(
                "salt_buckets"
            ),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(top_k)
    )
