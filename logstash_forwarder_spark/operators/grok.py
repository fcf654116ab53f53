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
# written fresh from the public pattern idiom; all groups non-capturing.
# Bodies may reference OTHER patterns with %{NAME} — compile_grok expands
# recursively (cycle-checked), so composites like COMBINEDAPACHELOG are
# plain library entries, not special cases.
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9]\d*\b",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "USERNAME": r"[a-zA-Z0-9@._-]+",
    "HTTPDUSER": r"%{USERNAME}",  # the httpd '-' placeholder is in the class
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH)",
    "URIPATH": r"/[^\s?#]*",
    "MONTH": (
        r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May"
        r"|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?"
        r"|Nov(?:ember)?|Dec(?:ember)?)\b"
    ),
    "MONTHDAY": r"(?:3[01]|[12]\d|0?[1-9])",
    "YEAR": r"(?:\d{4}|\d{2})",
    "TIME": r"(?:2[0-3]|[01]?\d):(?:[0-5]\d)(?::(?:[0-5]\d)(?:[.,]\d+)?)?",
    # Apache/nginx clf timestamp: 17/Aug/2026:12:00:05 +0000
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?|FATAL)",
    "SYSLOGHOST": r"[\w.-]+",
    "QS": r"\"(?:[^\"\\]|\\.)*\"",
    # the full combined access-log line; response/bytes typed :int here
    # (grok leaves them strings — the typed form is what a pipeline wants)
    "COMBINEDAPACHELOG": (
        r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} "
        r"\[%{HTTPDATE:timestamp}\] "
        r"\"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response:int} (?:%{NUMBER:bytes:int}|-) "
        r"%{QS:referrer} %{QS:agent}"
    ),
}

_FIELD_RE = re.compile(r"%\{(\w+)(?::(\w+))?(?::(int|float))?\}")


def load_pattern_files(paths: list[str]) -> dict[str, str]:
    """Logstash ``patterns_dir`` file format: one ``NAME regex`` per
    line (first whitespace splits), ``#`` comments and blank lines
    skipped. Later files/lines override earlier ones (logstash
    semantics). The result feeds ``pattern_definitions`` — bodies may
    reference library patterns and each other, same as inline
    definitions."""
    defs: dict[str, str] = {}
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            for raw in fh:
                line = raw.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(None, 1)
                if len(parts) != 2 or not re.fullmatch(r"\w+", parts[0]):
                    raise ValueError(
                        f"{path}: malformed pattern line {line!r} "
                        "(expected 'NAME regex')"
                    )
                defs[parts[0]] = parts[1]
    return defs


def compile_grok(
    expr: str, pattern_definitions: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str | None]]]:
    """Grok expression → (combined regex, [(field, cast)]).

    Unnamed uses (`%{IP}`) match without capturing a field. Unknown
    pattern names raise (typo safety — grok's own behavior), as do
    recursive pattern references. ``pattern_definitions`` supplies
    user-named patterns (logstash's grok option of the same name),
    overriding or extending the library; user bodies may reference
    library patterns and each other.

    Field numbering is positional (group i ↔ fields[i-1]): a named use is
    appended to ``fields`` BEFORE its body is expanded, which is exactly
    left-to-right open-paren order, so nesting named patterns inside named
    patterns stays consistent. A literal ``(`` in user text or a pattern
    body would silently shift every index (ADVICE r4) — so the compiled
    regex's capturing-group count is checked against len(fields) and a
    mismatch raises (write ``(?:...)`` for grouping)."""
    lib = dict(GROK_PATTERNS)
    if pattern_definitions:
        lib.update(pattern_definitions)
    fields: list[tuple[str, str | None]] = []

    def expand(text: str, stack: tuple[str, ...]) -> str:
        def sub(m: re.Match) -> str:
            pat, name, cast = m.group(1), m.group(2), m.group(3)
            if pat not in lib:
                raise ValueError(f"unknown grok pattern %{{{pat}}}")
            if pat in stack:
                chain = " -> ".join(stack + (pat,))
                raise ValueError(f"recursive grok pattern: {chain}")
            if name is None:
                opener = "(?:"
            else:
                fields.append((name, cast))
                opener = "("
            return f"{opener}{expand(lib[pat], stack + (pat,))})"

        return _FIELD_RE.sub(sub, text)

    rx = expand(expr, ())
    n_groups = re.compile(rx).groups
    if n_groups != len(fields):
        raise ValueError(
            f"grok expression compiles to {n_groups} capturing groups but "
            f"declares {len(fields)} fields — a literal '(' in the "
            "expression or a pattern body shifts field numbering; use "
            "'(?:...)' for grouping"
        )
    return rx, fields


def grok_columns(
    text: Column, expr: str, pattern_definitions: dict[str, str] | None = None
) -> list[Column]:
    """The compiled field columns (aliased, cast) for one grok expression."""
    rx, fields = compile_grok(expr, pattern_definitions)
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
    df: DataFrame,
    expr: str,
    text_col: str = "line",
    keep: tuple[str, ...] = (),
    pattern_definitions: dict[str, str] | None = None,
) -> DataFrame:
    """Parse ``text_col`` with a grok expression into typed columns.

    Output = ``keep`` passthrough columns + one column per named grok
    field. Row-local JVM regex — zero shuffle, zero Python; at 100 TB
    this runs inside the scan's whole-stage codegen like every other
    projection."""
    return df.select(
        *[F.col(k) for k in keep],
        *grok_columns(F.col(text_col), expr, pattern_definitions),
    )
