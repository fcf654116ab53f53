"""Grok-style named-pattern parsing — the logstash idiom the north star
names ("grok/regex-style parse and field extraction"), compiled to pure
JVM regexp_extract expressions.

Logstash's grok wraps a library of named regexes (`%{IP:client}`) around
Java regex; the forwarder ships raw lines and leaves grok to the
downstream stack. Here the SAME surface compiles to a Spark select:

* each `%{PATTERN:field[:int|:float]}` becomes one capturing group in a
  single combined regex (library patterns are written with non-capturing
  groups so field numbering is positional);
* extraction is `F.regexp_extract(text, combined, group_i)` per field —
  whole-stage-codegen JVM regex, no Python anywhere;
* `:int` / `:float` suffixes cast the extracted string (grok type
  coercion); an unmatched line yields empty-string/NULL-cast fields, the
  logstash `_grokparsefailure` analog (filter on a required field).

Text outside `%{...}` is passed through as literal REGEX (same contract
as grok itself — escape regex metacharacters you mean literally).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the classic core of logstash's pattern library (patterns/grok-patterns),
# restricted to what composes without recursion; all groups non-capturing
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH)",
    "URIPATH": r"/[^\s?#]*",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?|FATAL)",
    "SYSLOGHOST": r"[\w.-]+",
    "QS": r"\"(?:[^\"\\]|\\.)*\"",
}

_FIELD_RE = re.compile(r"%\{(\w+)(?::(\w+))?(?::(int|float))?\}")


def compile_grok(expr: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Grok expression → (combined regex, [(field, cast)]).

    Unnamed uses (`%{IP}`) match without capturing a field. Unknown
    pattern names raise (typo safety — grok's own behavior)."""
    fields: list[tuple[str, str | None]] = []

    def sub(m: re.Match) -> str:
        pat, name, cast = m.group(1), m.group(2), m.group(3)
        if pat not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{pat}}}")
        body = GROK_PATTERNS[pat]
        if name is None:
            return f"(?:{body})"
        fields.append((name, cast))
        return f"({body})"

    return _FIELD_RE.sub(sub, expr), fields


def grok_columns(text: Column, expr: str) -> list[Column]:
    """The compiled field columns (aliased, cast) for one grok expression."""
    rx, fields = compile_grok(expr)
    cols = []
    for i, (name, cast) in enumerate(fields, start=1):
        c = F.regexp_extract(text, rx, i)
        if cast == "int":
            # empty string (unmatched line) casts to NULL, not 0
            c = F.when(c != "", c.cast("long")).alias(name)
        elif cast == "float":
            c = F.when(c != "", c.cast("double")).alias(name)
        else:
            c = c.alias(name)
        cols.append(c)
    return cols


def grok_extract(
    df: DataFrame, expr: str, text_col: str = "line", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Parse ``text_col`` with a grok expression into typed columns.

    Output = ``keep`` passthrough columns + one column per named grok
    field. Row-local JVM regex — zero shuffle, zero Python; at 100 TB
    this runs inside the scan's whole-stage codegen like every other
    projection."""
    return df.select(
        *[F.col(k) for k in keep], *grok_columns(F.col(text_col), expr)
    )
