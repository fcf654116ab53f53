"""O-R1 — routing: deterministic rule-based fan-out to sinks.

Replaces the reference's random server pick + failover
(/root/reference/publisher1.go:168-196) with an ordered predicate table
compiled into a single ``when/otherwise`` chain — one narrow JVM expression,
whole-stage-codegen'd, evaluated once per row with first-match-wins
semantics. Failover becomes Spark task retry + idempotent sink commits
(plans/registrar.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RouteError(ValueError):
    pass


def compile_routes(rules: list[tuple[int, str, str]]) -> Column:
    """Ordered (priority, sql_predicate, sink) → one when/otherwise Column.

    Requires a catch-all (predicate ``true``) terminal rule so every row
    routes to exactly one sink — the exhaustiveness the tests assert.
    """
    if not rules:
        raise RouteError("empty route table")
    for _, _, sink in rules:
        # sink names become `sink=<name>` partition directories; characters
        # Hive path-escapes (':', '=', '/', '%', …) would make the on-disk
        # dir differ from the raw name the commit loop keys by — staged
        # rows would be committed as empty and swept, a silent
        # exactly-once violation. Reject at plan-construction time.
        if not re.fullmatch(r"[A-Za-z0-9_.\-]+", sink):
            raise RouteError(
                f"sink name {sink!r} must match [A-Za-z0-9_.-]+ "
                "(it becomes a partition directory name verbatim)"
            )
    ordered = sorted(rules, key=lambda r: r[0])
    if ordered[-1][1].strip().lower() != "true":
        raise RouteError("route table must end with a catch-all 'true' rule")
    col: Column | None = None
    for _, predicate, sink in ordered[:-1]:
        branch = F.when(F.expr(predicate), F.lit(sink))
        col = branch if col is None else col.when(F.expr(predicate), F.lit(sink))
    default = F.lit(ordered[-1][2])
    return default if col is None else col.otherwise(default)


def route_stage(
    df: DataFrame, rules: list[tuple[int, str, str]], sink_col: str = "sink"
) -> DataFrame:
    return df.withColumn(sink_col, compile_routes(rules))


def sink_names(rules: list[tuple[int, str, str]]) -> list[str]:
    return sorted({sink for _, _, sink in rules})
