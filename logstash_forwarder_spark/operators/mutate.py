"""Field mutation chains — the logstash `mutate` filter compiled to a
sequence of Column transformations.

Logstash's mutate filter applies an ordered list of field operations
(convert, copy, gsub, join, lowercase, merge, rename, replace, split,
strip, update, uppercase, capitalize). The forwarder itself only ever
attaches static fields (reference: the per-path "fields" map merged into
every event, `config.go:66-78` via `harvester.go:57-64`); the rest of
the mutate surface lives in the downstream stack the README describes.
Here each op compiles to a built-in-function Column expression and the
chain applies IN DECLARED ORDER — an op sees the fields exactly as the
previous op left them (rename/replace ordering is observable, as in
logstash).

Op tuples accepted by :func:`mutate`:

* ``("convert", field, type)`` — type ∈ integer/long/float/double/
  string/boolean (logstash's convert set); cast, NULL on unparseable.
* ``("copy", src, dst)`` / ``("rename", old, new)``
* ``("gsub", field, pattern, replacement)`` — regexp_replace.
* ``("split", field, separator)`` — LITERAL separator (logstash
  semantics), regex-escaped before ``F.split``.
* ``("join", field, separator)`` / ``("merge", dst, src)`` — array ops.
* ``("lowercase"|"uppercase"|"capitalize"|"strip", field)``
* ``("replace", field, template)`` — sprintf-style ``%{other_field}``
  references; creates the field if absent.
* ``("update", field, template)`` — like replace but a NO-OP when the
  field does not exist (logstash's update contract).

Scale shape: every op is a row-local projection over built-in functions
— the whole chain collapses into one codegen'd Project over the scan;
zero Python, zero shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TEMPLATE_RE = re.compile(r"%\{([A-Za-z0-9_@.]+)\}")

_CONVERT = {
    "integer": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def _template(cols: list[str], template: str) -> Column:
    """Compile a ``%{field}`` sprintf template into a concat Column."""
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name not in cols:
            raise ValueError(f"template references unknown field {name!r}")
        parts.append(F.col(name).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def _require(cols: list[str], field: str, op: str) -> None:
    if field not in cols:
        raise ValueError(f"mutate {op}: no such field {field!r}")


def mutate(df: DataFrame, ops: list[tuple]) -> DataFrame:
    """Apply a logstash-style mutate op chain to ``df`` in order."""
    for op in ops:
        kind, args = op[0], op[1:]
        cols = df.columns
        if kind == "convert":
            field, typ = args
            _require(cols, field, kind)
            if typ not in _CONVERT:
                raise ValueError(f"mutate convert: unsupported type {typ!r}")
            # try_cast: NULL on unparseable (ANSI-mode cast would throw)
            df = df.withColumn(field, F.col(field).try_cast(_CONVERT[typ]))
        elif kind == "copy":
            src, dst = args
            _require(cols, src, kind)
            df = df.withColumn(dst, F.col(src))
        elif kind == "rename":
            old, new = args
            _require(cols, old, kind)
            df = df.withColumnRenamed(old, new)
        elif kind == "gsub":
            field, pattern, repl = args
            _require(cols, field, kind)
            df = df.withColumn(field, F.regexp_replace(field, pattern, repl))
        elif kind == "split":
            field, sep = args
            _require(cols, field, kind)
            df = df.withColumn(field, F.split(F.col(field), re.escape(sep)))
        elif kind == "join":
            field, sep = args
            _require(cols, field, kind)
            df = df.withColumn(field, F.array_join(F.col(field), sep))
        elif kind == "merge":
            dst, src = args
            _require(cols, dst, kind)
            _require(cols, src, kind)
            df = df.withColumn(dst, F.concat(F.col(dst), F.col(src)))
        elif kind == "lowercase":
            (field,) = args
            _require(cols, field, kind)
            df = df.withColumn(field, F.lower(F.col(field)))
        elif kind == "uppercase":
            (field,) = args
            _require(cols, field, kind)
            df = df.withColumn(field, F.upper(F.col(field)))
        elif kind == "capitalize":
            (field,) = args
            _require(cols, field, kind)
            c = F.col(field)
            df = df.withColumn(
                field,
                F.concat(
                    F.upper(c.substr(F.lit(1), F.lit(1))),
                    F.lower(c.substr(F.lit(2), F.length(c))),
                ),
            )
        elif kind == "strip":
            (field,) = args
            _require(cols, field, kind)
            df = df.withColumn(field, F.trim(F.col(field)))
        elif kind == "replace":
            field, template = args
            df = df.withColumn(field, _template(cols, template))
        elif kind == "update":
            field, template = args
            if field in cols:
                df = df.withColumn(field, _template(cols, template))
        else:
            raise ValueError(f"unknown mutate op {kind!r}")
    return df
