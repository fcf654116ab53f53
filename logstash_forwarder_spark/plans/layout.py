"""Sorted-parquet layout — zone-map (row-group min/max) pruning.

The third leg of the write-time-layout tier, next to sink partitioning
(`pipeline.py` routes by sink → partition pruning on the routing key)
and bucketing (`plans/bucketing.py` → exchange-free joins on the bucket
key): SORTING by the dominant filter key gives every parquet row group
a tight min/max envelope, so a selective predicate prunes row groups
inside the scan — I/O skipped before a single row is materialized, with
plain parquet files any reader understands (no catalog required,
unlike bucketing).

At 100 TB the arithmetic is decisive: a range predicate over a sorted
table touches O(selectivity) row groups; over an unsorted table it
touches ALL of them (every row group's min/max spans the whole domain,
so nothing prunes — Spark's vectorized reader skips at row-group
granularity only). tests/test_layout.py measures exactly this on the
scan's own numOutputRows metric: ~24× fewer rows scanned for a 0.25%
range filter on sorted vs shuffled layout of the same data.

Caveats encoded here:

* measure pruning on the EXECUTED plan of the collected DataFrame —
  ``count()``/``write()`` clone the QueryExecution and the inspected
  clone's metrics stay zero (CLAUDE.md round-2);
* ``parquet.block.size`` is a per-write option; the default 128 MiB
  row group is the right grain for cluster scans — tests shrink it
  only to get several row groups from small fixtures;
* sorting is a RANGE partitioning shuffle at write time — like
  bucketing's publish shuffle, paid once and amortized over every
  subsequent selective read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    *,
    sort_cols: list[str],
    row_group_bytes: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet globally sorted on ``sort_cols`` (one
    range shuffle), giving row-group zone maps that prune selective
    predicates on those columns."""
    if not sort_cols:
        raise ValueError("write_sorted: need at least one sort column")
    writer = df.sort(*sort_cols).write.mode(mode)
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)


def scan_output_rows(df: DataFrame) -> int:
    """Rows the parquet scan MATERIALIZED for an already-collected
    DataFrame (its executed plan's FileScan numOutputRows) — the
    observable that proves row-group pruning. Collect ``df`` first;
    asking a fresh clone reads zeros."""
    plan = df._jdf.queryExecution().executedPlan()
    found: list[int] = []

    def walk(node) -> None:
        if "Scan" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    found.append(int(kv._2().value()))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    if not found:
        raise ValueError("scan_output_rows: no FileScan metric in plan")
    return sum(found)
