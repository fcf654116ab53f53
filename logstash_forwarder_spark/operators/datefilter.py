"""Multi-format timestamp parsing — the logstash `date` filter
re-expressed as a JVM-side coalesce of format attempts.

Logstash's date filter tries a list of formats in order against a source
field, sets `@timestamp` from the first success, and tags
`_dateparsefailure` when none match. The forwarder itself ships raw
lines and leaves timestamping downstream (reference: the event map the
harvester emits, `harvester.go:47-70`, carries no parsed time; the
README's pipeline hands that to the logstash date stage); here the same
contract compiles to::

    coalesce(try_to_timestamp(col, fmt1), try_to_timestamp(col, fmt2), ...)

* each Java-pattern format becomes one ``try_to_timestamp`` attempt —
  NULL on mismatch instead of raising, so the chain falls through in
  declared order exactly like logstash's format list;
* the special formats ``UNIX`` / ``UNIX_MS`` (logstash's names) accept
  all-digit epoch seconds / milliseconds, guarded by a digit-only rlike
  so a numeric prefix of a real date can never alias into an epoch;
* total failure (all attempts NULL while the source is non-NULL) sets
  ``<target>_failed`` true — and, when ``tags_col`` is given, appends
  ``failure_tag`` to that array column (the `_dateparsefailure` idiom).

Scale shape: row-local projection, whole-stage codegen, zero regex
beyond the two digit guards, zero Python, zero shuffle — the chain
inlines into the scan stage like dissect/grok extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: logstash special format names → (digit-count bound, column builder)
_EPOCH_FORMATS = ("UNIX", "UNIX_MS")


def _attempt(src: Column, fmt: str) -> Column:
    """One format attempt: a Column that is the parsed timestamp or NULL."""
    if fmt == "UNIX":
        return F.when(
            src.rlike(r"^\d{1,10}$"), F.timestamp_seconds(src.cast("long"))
        )
    if fmt == "UNIX_MS":
        return F.when(
            src.rlike(r"^\d{1,13}$"), F.timestamp_millis(src.cast("long"))
        )
    return F.try_to_timestamp(src, F.lit(fmt))


def parse_date(
    df: DataFrame,
    src_col: str,
    formats: list[str],
    *,
    target: str = "event_ts",
    tags_col: str | None = None,
    failure_tag: str = "_dateparsefailure",
) -> DataFrame:
    """Parse ``src_col`` with the first matching format from ``formats``
    into timestamp column ``target``; add boolean ``<target>_failed``
    (and append ``failure_tag`` to ``tags_col`` when provided)."""
    if not formats:
        raise ValueError("formats must be a non-empty list")
    src = F.col(src_col)
    parsed = F.coalesce(*[_attempt(src, f) for f in formats])
    failed = parsed.isNull() & src.isNotNull()
    out = df.withColumn(target, parsed).withColumn(f"{target}_failed", failed)
    if tags_col is not None:
        out = out.withColumn(
            tags_col,
            F.when(
                failed,
                F.array_union(
                    F.coalesce(F.col(tags_col), F.array()),
                    F.array(F.lit(failure_tag)),
                ),
            ).otherwise(F.col(tags_col)),
        )
    return out
