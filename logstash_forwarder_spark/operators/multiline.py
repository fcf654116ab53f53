"""Multiline event assembly — the logstash multiline codec re-expressed
as a window fold + hash-agg.

The forwarder ships single lines in file order (`harvester.go:47-70`);
the downstream multiline codec re-joins continuation lines (stack
traces, wrapped messages) into one event: a line matching the *start*
pattern opens an event, every following non-start line is appended.
Here the same fold is declarative:

* ``event_no = sum(is_start) over (partition by file order by
  line_no)`` — the classic start-marker running count; leading orphan
  continuations (a file beginning mid-event, e.g. after rotation)
  group under ``event_no = 0`` and are flagged;
* one hash-agg per (file, event_no) rebuilds the message in line order
  via ``array_sort(collect_list(struct(line_no, line)))`` — events are
  bounded by their own line count, never by file size.

Scale shape: the window partitions by FILE — the harvester grain, the
same sequential order the reference reads in (`harvester.go:47`), so
state never crosses the boundary a 1000-executor cluster would
partition on anyway. One exchange for the window; the hash-agg reuses
the same (file)-clustered distribution for its (file, event_no) keys,
so no second data shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default start pattern: a line whose first character is not whitespace
#: (the stack-trace convention: continuations are indented).
DEFAULT_START = r"^\S"


def multiline_assemble(
    lines: DataFrame,
    *,
    start_pattern: str = DEFAULT_START,
    file_col: str = "file",
    line_no_col: str = "line_no",
    text_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """Fold harvested lines into multiline events.

    Returns one row per event: ``file``, ``event_no`` (1-based per file;
    0 = orphan leading continuations), ``first_line`` (line_no of the
    event's first line), ``n_lines``, ``message`` (lines re-joined with
    ``sep`` in line order), ``is_orphan``.
    """
    is_start = F.col(text_col).rlike(start_pattern).cast("long")
    w = Window.partitionBy(file_col).orderBy(line_no_col)
    ev = lines.withColumn("event_no", F.sum(is_start).over(w))
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(line_no_col).alias("n"), F.col(text_col).alias("t")))
    )
    msg = F.array_join(F.transform(ordered, lambda s: s["t"]), sep)
    return (
        ev.groupBy(file_col, "event_no")
        .agg(
            F.min(line_no_col).alias("first_line"),
            F.count(F.lit(1)).alias("n_lines"),
            msg.alias("message"),
        )
        .withColumn("is_orphan", F.col("event_no") == F.lit(0))
    )


def make_multiline_udtf(start_pattern: str = DEFAULT_START):
    """The same fold as a Spark 4 Python UDTF — the SQL-callable
    stateful-per-group form (`SELECT * FROM assemble(TABLE(lines)
    PARTITION BY file ORDER BY line_no)`). Spark instantiates the class
    per PARTITION BY group and feeds rows in ORDER BY order, calling
    ``terminate`` at the group boundary — exactly the harvester grain
    the relational fold partitions on, so the exchange shape is
    identical (one hash(file) shuffle). This exists to round out the
    §2.12 UDF surface with the one form the repo hadn't exercised:
    arbitrary user-defined SEQUENTIAL parsers SQL users can call
    directly. It is the slow path by construction (per-row Python);
    :func:`multiline_assemble` is the production form — parity between
    the two is pytest-proven on every fixture.
    """
    import re as _re

    from pyspark.sql.functions import udtf

    start = _re.compile(start_pattern)

    @udtf(
        returnType="file string, event_no bigint, first_line bigint, "
        "n_lines bigint, message string, is_orphan boolean"
    )
    class MultilineAssemble:
        def __init__(self) -> None:
            self._file: str | None = None
            self._event_no = 0
            self._first: int | None = None
            self._lines: list[str] = []

        def _flush(self):
            if self._first is not None:
                yield (
                    self._file,
                    self._event_no,
                    self._first,
                    len(self._lines),
                    "\n".join(self._lines),
                    self._event_no == 0,
                )
            self._first = None
            self._lines = []

        def eval(self, row):
            if start.match(row["line"]):
                yield from self._flush()
                self._event_no += 1
            self._file = row["file"]
            if self._first is None:
                self._first = row["line_no"]
            self._lines.append(row["line"])

        def terminate(self):
            yield from self._flush()

    return MultilineAssemble
