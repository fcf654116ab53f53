"""The remaining small logstash filters — useragent, translate, csv —
each compiled to built-in Column expressions (zero Python, zero shuffle).

The forwarder ships raw events and leaves field-level enrichment to the
downstream logstash stack (reference: README.md's pipeline description;
the event map `harvester.go:47-70` carries only line/fields/offset);
these are the three remaining filters from that stack a log user
reaches for routinely:

* :func:`useragent_extract` — a compact ordered-pattern user-agent
  parser (the uap-core idea restricted to the major families): first
  matching family regex wins, major version extracted per family, OS
  classified from the parenthesized platform segment. All
  ``regexp_extract`` / chained ``when`` — row-local, codegen'd.
* :func:`translate` — dictionary lookup with default. Logstash's
  translate holds the dict in memory per worker; the exact analog is a
  LITERAL ``create_map`` + ``element_at`` (no join node at all), which
  is the right shape for the filter's contract: the dictionary is
  configuration-sized, never data-sized. For data-sized mappings use
  ``operators/enrich.py``'s broadcast join instead.
* :func:`csv_extract` — RFC4180 line parsing via ``from_csv`` (quoted
  fields, doubled-quote escapes, embedded separators), with logstash's
  column-name list and per-column convert types.
* :func:`xml_extract` — single-element XML lines via ``from_xml``
  (attributes surface as ``_name`` fields, child elements by name);
  malformed lines yield all-NULL fields (PERMISSIVE), the logstash
  `_xmlparsefailure` analog — filter on a required field.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered (family, detect regex, version regex) — first match wins, so
# specific families (Edge) precede the engines they embed (Chrome, Safari).
_UA_FAMILIES = [
    ("Edge", r"Edg(?:e|A|iOS)?/", r"Edg(?:e|A|iOS)?/(\d+)"),
    ("Chrome", r"Chrome/", r"Chrome/(\d+)"),
    ("Firefox", r"Firefox/", r"Firefox/(\d+)"),
    ("Safari", r"Version/\d+.*Safari/", r"Version/(\d+)"),
    ("Opera", r"(?:Opera|OPR)/", r"(?:Opera|OPR)/(\d+)"),
    ("IE", r"MSIE |Trident/", r"MSIE (\d+)"),
    ("curl", r"^curl/", r"^curl/(\d+)"),
    ("Googlebot", r"Googlebot/", r"Googlebot/(\d+)"),
]

# (os name, detect regex) — ordered; mobile platforms precede the
# desktop strings they embed (Android UAs contain "Linux").
_UA_OS = [
    ("iOS", r"iPhone|iPad|iPod"),
    ("Android", r"Android"),
    ("Windows", r"Windows NT"),
    ("macOS", r"Mac OS X|Macintosh"),
    ("Linux", r"Linux|X11"),
]


def useragent_columns(src: Column) -> dict[str, Column]:
    """Compile the UA pattern tables into (family, major, os) Columns."""
    family = F.lit("Other")
    major = F.lit(None).cast("string")
    for name, detect, version in reversed(_UA_FAMILIES):
        hit = src.rlike(detect)
        family = F.when(hit, F.lit(name)).otherwise(family)
        got = F.regexp_extract(src, version, 1)
        major = F.when(hit, F.when(got != "", got)).otherwise(major)
    os_col = F.lit("Other")
    for name, detect in reversed(_UA_OS):
        os_col = F.when(src.rlike(detect), F.lit(name)).otherwise(os_col)
    return {"ua_family": family, "ua_major": major, "ua_os": os_col}


def useragent_extract(
    df: DataFrame, source: str = "agent", prefix: str = ""
) -> DataFrame:
    """Add ``ua_family`` / ``ua_major`` / ``ua_os`` parsed from
    ``source`` (logstash useragent filter surface, compact family set)."""
    cols = useragent_columns(F.col(source))
    for name, col in cols.items():
        df = df.withColumn(prefix + name, col)
    return df


def translate(
    df: DataFrame,
    source: str,
    dictionary: dict[str, str],
    *,
    dest: str | None = None,
    default: str | None = None,
) -> DataFrame:
    """Dictionary-translate ``source`` into ``dest`` (default: in place).
    Misses fall back to ``default`` when given, else keep the source
    value (logstash's fallback-vs-passthrough contract)."""
    if not dictionary:
        raise ValueError("translate: dictionary must be non-empty")
    pairs: list[Column] = []
    for k, v in dictionary.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked = F.element_at(F.create_map(*pairs), F.col(source))
    fallback = F.lit(default) if default is not None else F.col(source)
    return df.withColumn(dest or source, F.coalesce(looked, fallback))


def csv_extract(
    df: DataFrame,
    source: str,
    columns: list[str],
    *,
    types: dict[str, str] | None = None,
    sep: str = ",",
    quote: str = '"',
) -> DataFrame:
    """Parse RFC4180 CSV lines in ``source`` into named columns
    (logstash csv filter: `columns`, `separator`, `quote_char`,
    `convert`). Doubled-quote escapes inside quoted fields are honored
    (``escape`` = the quote char); unconvertible typed fields are NULL
    (``from_csv`` PERMISSIVE mode)."""
    if not columns:
        raise ValueError("csv_extract: columns must be non-empty")
    types = types or {}
    schema = ", ".join(f"`{c}` {types.get(c, 'string')}" for c in columns)
    parsed = F.from_csv(
        F.col(source), schema, {"sep": sep, "quote": quote, "escape": quote}
    )
    out = df.withColumn("_csv", parsed)
    for c in columns:
        out = out.withColumn(c, F.col(f"_csv.`{c}`"))
    return out.drop("_csv")


def xml_extract(df: DataFrame, source: str, schema: str) -> DataFrame:
    """Parse single-element XML lines in ``source`` into the fields of
    ``schema`` (DDL string; attribute fields are named ``_attr``,
    child elements by tag name — the from_xml convention). Malformed
    lines produce all-NULL fields rather than failing the job."""
    parsed = F.from_xml(F.col(source), schema)
    out = df.withColumn("_xml", parsed)
    for field in out.schema["_xml"].dataType.fieldNames():
        out = out.withColumn(field, F.col(f"_xml.`{field}`"))
    return out.drop("_xml")
