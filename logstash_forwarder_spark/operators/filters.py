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
* :func:`syslog_pri_extract` — RFC3164 ``<PRI>`` decode: facility =
  pri DIV 8, severity = pri MOD 8, labels from the standard tables;
  missing/garbled PRI defaults to 13 (logstash syslog_pri contract).
* :func:`kv_extract` — the kv filter's parse direction (``k=v`` pairs →
  typed columns) via anchored per-field regexps (last occurrence wins);
  complements the serialize direction (queries.py q_kv_serialize /
  publisher1.go:242-248).
* :func:`split_field` — the split filter: one event per element of a
  multi-value field (posexplode — row-local fan-out, no shuffle).
* :func:`anonymize_fields` / :func:`checksum_field` — the anonymize
  (sha256 per field) and checksum (md5 over a canonical field
  concatenation) filters; hex output is engine-portable.
* :func:`clone_events` — the clone filter: original + one typed copy
  per clone name (row-local explode, no exchange).
* :func:`range_tags` — the range filter (action=tag): out-of-[lo,hi]
  fields append tags; NULL fields skipped.
* :func:`dns_lookup` — the dns filter against a static resolver table
  (broadcast cache-sized join; miss → _dnsfailure tag).
* :func:`metricize` — N metric fields → N single-metric events via
  ``stack`` (an Expand in the scan's stage, no exchange).
* :func:`cipher_field` — the cipher filter: deterministic AES-ECB+PKCS
  field tokenization, base64 transport (GCM trades the determinism
  dedup/replay rely on for IND-CPA — documented choice).

All are built-in Column expressions: zero Python; the only join is the
dns cache broadcast.
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


# RFC3164 tables (indexes 0..23 / 0..7). Facilities 16-23 are local0-7.
SYSLOG_FACILITIES = [
    "kernel", "user-level", "mail", "daemon", "security/authorization",
    "syslogd", "line printer", "network news", "uucp", "clock",
    "security/authorization", "ftp", "ntp", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
]
SYSLOG_SEVERITIES = [
    "emergency", "alert", "critical", "error", "warning", "notice",
    "informational", "debug",
]


def syslog_pri_extract(
    df: DataFrame, source: str = "line", *, drop_pri: bool = False
) -> DataFrame:
    """Decode the RFC3164 ``<PRI>`` prefix of ``source`` (logstash
    syslog_pri filter): ``syslog_pri`` (int), ``syslog_facility_code`` =
    pri DIV 8, ``syslog_severity_code`` = pri MOD 8, plus the standard
    label columns, and ``message`` = the line with the prefix removed.
    A line with no (or out-of-range) ``<PRI>`` gets the filter's
    documented default pri 13 (user-level notice) and keeps its full
    text as ``message``. Pure expressions — row-local, codegen'd."""
    raw = F.regexp_extract(F.col(source), r"^<(\d{1,3})>", 1)
    valid = (raw != "") & (raw.cast("int") <= 191)
    pri = F.when(valid, raw.cast("int")).otherwise(F.lit(13))
    fac = F.floor(pri / 8).cast("int")
    sev = (pri % 8).cast("int")
    out = df.select(
        *df.columns,
        pri.alias("syslog_pri"),
        fac.alias("syslog_facility_code"),
        sev.alias("syslog_severity_code"),
        F.try_element_at(
            F.array(*[F.lit(s) for s in SYSLOG_FACILITIES]), fac + 1
        ).alias("syslog_facility"),
        F.try_element_at(
            F.array(*[F.lit(s) for s in SYSLOG_SEVERITIES]), sev + 1
        ).alias("syslog_severity"),
        F.when(
            valid, F.regexp_replace(F.col(source), r"^<\d{1,3}>", "")
        )
        .otherwise(F.col(source))
        .alias("message"),
    )
    return out.drop(source) if drop_pri else out


def kv_extract(
    df: DataFrame,
    source: str,
    fields: dict[str, str],
    *,
    field_split: str = " ",
    value_split: str = "=",
    prefix: str = "",
) -> DataFrame:
    """Parse ``k=v`` pairs in ``source`` into typed columns (logstash kv
    filter: `field_split`, `value_split`, `include_keys` via the
    ``fields`` dict of name → cast type, `prefix`). Missing keys and
    failed casts are NULL (try_cast); duplicate keys keep the LAST
    occurrence. Implemented as one anchored greedy regexp per requested
    field (``^(?:.*<fs>)?key<vs>([^<fs>]*)``) rather than str_to_map:
    the greedy prefix gives last-wins without depending on the session's
    mapKeyDedupPolicy (Spark 4 default EXCEPTION throws on duplicates),
    and a near-miss key ("xa=1" when asked for "a") cannot match because
    the key must follow start-of-line or a field separator. Row-local,
    codegen'd."""
    import re as _re

    if not fields:
        raise ValueError("kv_extract: fields must be non-empty")
    fs, vs = _re.escape(field_split), _re.escape(value_split)
    out = df
    for name, typ in fields.items():
        rx = f"^(?:.*{fs})?{_re.escape(name)}{vs}([^{fs}]*)"
        col = F.when(
            F.col(source).rlike(rx), F.regexp_extract(F.col(source), rx, 1)
        )
        if typ and typ != "string":
            col = col.try_cast(typ)
        out = out.withColumn(f"{prefix}{name}", col)
    return out


def split_field(
    df: DataFrame,
    source: str,
    *,
    sep: str = ",",
    dest: str = "part",
    idx: str = "part_idx",
) -> DataFrame:
    """The split filter: clone the event once per ``sep``-separated
    element of ``source``, tagging each clone with the element and its
    0-based position. posexplode is a row-local fan-out — the plan
    carries a Generate node, no exchange; at 100 TB the fan-out happens
    inside the scan task that read the row."""
    import re as _re

    parts = F.split(F.col(source), _re.escape(sep))
    exploded = df.select(*df.columns, F.posexplode(parts).alias(idx, dest))
    return exploded.drop(source)


def anonymize_fields(df: DataFrame, cols: list[str]) -> DataFrame:
    """The anonymize filter (sha256 algorithm): replace each named field
    with the lowercase-hex sha256 of its string form. Engine-portable
    (any SQL engine's sha256 agrees on UTF-8 input)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.sha2(F.col(c).cast("string"), 256))
    return out


def checksum_field(
    df: DataFrame, cols: list[str], *, dest: str = "checksum"
) -> DataFrame:
    """The checksum filter: md5 over the '|'-joined string forms of
    ``cols`` — a stable content key for exact-duplicate detection across
    re-ships. NULL fields render as '' via explicit coalesce (concat_ws
    alone would silently drop the NULL *and its separator*, colliding
    (NULL,'x') with ('x',NULL))."""
    return df.withColumn(
        dest,
        F.md5(
            F.concat_ws(
                "|",
                *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols],
            )
        ),
    )


def clone_events(
    df: DataFrame, clones: list[str], *, type_col: str = "type"
) -> DataFrame:
    """The logstash clone filter: each input event passes through
    unchanged PLUS one copy per entry of ``clones`` with ``type_col``
    rewritten to the clone name and ``cloned=true`` (logstash sets the
    clone's type and leaves the original's alone).

    Row-local fan-out: one ``explode`` over a (1+len(clones))-element
    literal array — a Generate node inside the scan's stage, no
    exchange, output exactly (1+len(clones))x input rows.
    """
    variants = F.array(
        F.lit(None).cast("string"), *[F.lit(c) for c in clones]
    )
    return (
        df.withColumn("__clone", F.explode(variants))
        .withColumn("cloned", F.col("__clone").isNotNull())
        .withColumn(type_col, F.coalesce(F.col("__clone"), F.col(type_col)))
        .drop("__clone")
    )


def range_tags(
    checks: list[tuple[str, float, float, str]],
) -> Column:
    """The logstash range filter, ``action => tag``: one tag per check
    whose field falls OUTSIDE [lo, hi]. Missing (NULL) fields are
    skipped, the filter's contract. Returns the joined tag string
    (check order, comma-separated, '' when none) — ``concat_ws`` drops
    the NULL branches, identical in DuckDB for the oracle.
    """
    return F.concat_ws(
        ",",
        *[
            F.when(~F.col(c).between(lo, hi), F.lit(tag))
            for c, lo, hi, tag in checks
        ],
    )


def dns_lookup(
    df: DataFrame,
    hosts: DataFrame,
    *,
    field: str,
    addr_col: str = "addr",
    name_col: str = "name",
    action: str = "append",
    dest: str = "resolved",
    miss_tag: str = "_dnsfailure",
) -> DataFrame:
    """The logstash dns filter (reverse mode) against a STATIC resolver
    table — the deterministic, cluster-safe form: live per-row DNS from
    executors is an anti-pattern (unbounded latency in the hot path);
    the production shape is a pre-resolved cache relation, exactly what
    the filter's own in-process cache approximates.

    Broadcast left join on ``field == addr_col`` (the hosts table is
    cache-sized — constant at any data scale); hits land in ``dest``
    (``action='replace'`` rewrites ``field`` instead, keeping the
    original on miss); misses get ``dns_tags=miss_tag`` (logstash's
    _dnsfailure analog, '' on hit).
    """
    dim = F.broadcast(
        hosts.select(
            F.col(addr_col).alias("__addr"), F.col(name_col).alias("__name")
        )
    )
    out = df.join(dim, F.col(field) == F.col("__addr"), "left")
    if action == "replace":
        out = out.withColumn(field, F.coalesce("__name", field))
    else:
        out = out.withColumn(dest, F.col("__name"))
    return out.withColumn(
        "dns_tags",
        F.when(F.col("__name").isNull(), F.lit(miss_tag)).otherwise(F.lit("")),
    ).drop("__addr", "__name")


def metricize(
    df: DataFrame,
    metrics: list[str],
    *,
    id_cols: list[str],
    metric_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """The logstash metricize filter: an event carrying N metric fields
    splits into N single-metric events (metric name + value columns).

    Relational form: ``stack`` — an Expand node inside the scan's
    stage, row-local, no exchange; output exactly N× input rows. The
    inverse of a pivot, so downstream per-metric aggregation becomes a
    plain (metric, ...) group-by instead of N parallel aggregates.
    """
    pairs = ", ".join(f"'{m}', `{m}`" for m in metrics)
    return df.select(
        *id_cols,
        F.expr(f"stack({len(metrics)}, {pairs})").alias(
            metric_col, value_col
        ),
    )


def cipher_field(col: Column | str, key: str, *, decrypt: bool = False) -> Column:
    """The logstash cipher filter: AES-ECB + PKCS padding over a field,
    base64 transport encoding (encrypt direction), or the inverse.

    ECB is chosen DELIBERATELY: the filter's job here is field-level
    tokenization where determinism is load-bearing — the same plaintext
    must produce the same ciphertext so exact-dedup, group-bys and the
    registrar's replay-stable identities keep working over the
    enciphered column. For at-rest confidentiality of free text use
    GCM instead (random IV → IND-CPA) and give up those equalities.
    Key sizing follows the AES contract (16/24/32-byte keys).
    """
    c = F.col(col) if isinstance(col, str) else col
    mode, pad = F.lit("ECB"), F.lit("PKCS")
    if decrypt:
        return F.aes_decrypt(
            F.unbase64(c), F.lit(key), mode, pad
        ).cast("string")
    return F.base64(F.aes_encrypt(c.cast("binary"), F.lit(key), mode, pad))
