"""Dissect-style positional field extraction — logstash's regex-free
fast path for fixed-layout lines, compiled to pure JVM string functions.

Logstash's dissect filter splits a line on LITERAL delimiters read off
the pattern (`%{ts} %{level} [%{logger}] %{msg}`) — no regex engine at
all, which is why it beats grok ~5× on fixed layouts. The forwarder
ships raw lines and leaves dissect/grok to the downstream stack
(reference: the pipeline described in README.md; the harvester emits
whole lines, `harvester.go:47-70`); here the same surface compiles to a
Spark ``select`` over chained ``substring_index`` / ``locate`` /
``substr`` expressions:

* the pattern is tokenized into alternating literals and `%{field}`
  keys; each field's value is "everything up to the next literal",
  taken with ``substring_index(rest, literal, 1)`` and the remainder
  advanced past value + delimiter — all whole-stage-codegen JVM string
  ops, zero regex, zero Python;
* `%{}` (empty key) consumes a position without emitting a column
  (dissect's skip field); `%{field:int}` / `%{field:long}` /
  `%{field:float}` cast the extracted string (dissect's convert_datatype);
* a line that does not contain some delimiter yields the dissect
  failure analog: ``substring_index`` returns the whole remainder, so
  downstream fields come out empty / NULL-cast — filter on a required
  field exactly as with grok's ``_grokparsefailure``.

Scale shape: row-local projection — no shuffle, no UDF; the whole
extraction inlines into the scan's codegen stage.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KEY_RE = re.compile(r"%\{([A-Za-z0-9_@]*)(?::(int|long|float))?\}")

_CASTS = {"int": "int", "long": "long", "float": "double"}


def _tokenize(pattern: str) -> tuple[str, list[tuple[str, str | None, str]]]:
    """Split a dissect pattern into (leading_literal, [(field, cast,
    trailing_literal), ...]). The trailing literal of the last field may
    be '' (field runs to end of line). Adjacent fields (empty delimiter
    between two keys) are rejected — dissect cannot split on nothing."""
    matches = list(_KEY_RE.finditer(pattern))
    if not matches:
        raise ValueError(f"dissect pattern has no %{{...}} keys: {pattern!r}")
    if "%{" in _KEY_RE.sub("", pattern):
        raise ValueError(f"malformed %{{...}} key in {pattern!r}")
    lead = pattern[: matches[0].start()]
    fields: list[tuple[str, str | None, str]] = []
    for i, m in enumerate(matches):
        nxt = matches[i + 1].start() if i + 1 < len(matches) else len(pattern)
        delim = pattern[m.end() : nxt]
        if i + 1 < len(matches) and delim == "":
            raise ValueError(
                f"adjacent keys with no delimiter in {pattern!r} "
                f"(dissect cannot split on an empty literal)"
            )
        fields.append((m.group(1), m.group(2), delim))
    return lead, fields


def dissect_columns(pattern: str, text_col: str | Column) -> dict[str, Column]:
    """Compile a dissect pattern into named extraction Columns over
    ``text_col``. Returns {field_name: Column} in pattern order (skip
    fields `%{}` consume their position but emit nothing)."""
    lead, fields = _tokenize(pattern)
    rest = F.col(text_col) if isinstance(text_col, str) else text_col
    if lead:
        # drop the literal prefix (substr is 1-based; over-long length is fine)
        rest = rest.substr(F.lit(len(lead) + 1), F.length(rest))
    out: dict[str, Column] = {}
    for name, cast, delim in fields:
        if delim:
            val = F.substring_index(rest, delim, 1)
            # advance past value + delimiter for the next field
            rest = rest.substr(
                F.length(val) + len(delim) + 1, F.length(rest)
            )
        else:
            val = rest
        if name:
            # try_cast: a malformed value yields NULL (dissect's
            # convert_datatype tolerance), never an ANSI cast error
            out[name] = val.try_cast(_CASTS[cast]) if cast else val
    return out


def dissect_extract(
    df: DataFrame, pattern: str, *, text_col: str = "line", keep: bool = False
) -> DataFrame:
    """Apply a dissect pattern to ``df[text_col]``: one row per input
    row, one column per named key (plus the original columns when
    ``keep``). The entire projection is JVM string functions inside one
    codegen stage — ``.explain`` shows no BatchEvalPython / no regex."""
    cols = dissect_columns(pattern, text_col)
    named = [c.alias(n) for n, c in cols.items()]
    return df.select("*", *named) if keep else df.select(*named)
