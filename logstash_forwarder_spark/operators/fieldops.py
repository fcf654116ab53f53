"""Field-hygiene filters — prune, de_dot, urldecode, truncate, uuid,
extractnumbers, json_encode, cidr, tld — the last gaps in the logstash
filter inventory, each compiled to built-in Column expressions or pure
driver-side schema surgery (zero Python in the data path, zero shuffle).

The forwarder ships raw events (`harvester.go:47-70` carries only
line/fields/offset) and leaves field hygiene to the downstream logstash
stack; these close out that stack's small-filter set:

* :func:`prune_fields` — the prune filter: keep/drop columns by name
  regex. A pure driver-side projection — at 100 TB this is COLUMN
  PRUNING, the projection reaches the parquet scan's ReadSchema, so
  pruned fields are never even read.
* :func:`de_dot` — the de_dot filter: rename dotted field names
  (``user.name`` → ``user_name``). Schema-only; free at any scale.
* :func:`urldecode` — percent + ``+`` decoding via Spark's builtin
  ``url_decode`` (codegen'd, row-local).
* :func:`truncate_bytes` — the truncate filter's BYTE-length contract
  (logstash truncates ``length_bytes`` of the UTF-8 encoding, not
  characters): substring on the binary cast, decoded back. A cut that
  lands mid-codepoint yields replacement chars exactly as logstash
  does; byte-exactness is pytest-proven against a Python reference
  (tests/test_fieldops.py), the gated fixture stays ASCII where
  byte == char.
* :func:`extract_numbers` — the extractnumbers filter:
  ``regexp_extract_all`` of integer/float tokens.
* :func:`json_encode` — the json_encode filter: ``to_json(struct(...))``
  (compact, key-ordered — portable across engines).
* :func:`uuid3_field` — the uuid filter made DETERMINISTIC (content-
  derived RFC 4122 v3: md5 of the canonical field concat, version
  nibble ``3``, variant ``8``) so it is replayable and oracle-checkable;
  logstash's random v4 breaks exactly-once replay, which is why the
  registrar path wants the name-based form.
* :func:`cidr_match` — the cidr filter: match an IPv4 against a
  CONFIGURATION-sized CIDR list via pure integer prefix compares
  (``ip >> (32-p) == net >> (32-p)``), a when/otherwise chain with no
  join node at all. Data-sized range tables use
  ``operators/joins.py:range_bucket_join`` instead (q_ip_range_lookup).
* :func:`tld_extract` — the tld filter: registered-domain / tld /
  subdomain split over a compact two-level-suffix set (the public
  suffix list idea restricted to the common second-level registries;
  the full PSL is a configuration file, not machinery).

All row-local; every one of these composes into an existing scan's
Project without adding an exchange.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- prune


def prune_fields(
    df: DataFrame,
    *,
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
) -> DataFrame:
    """Keep/drop columns by name regex (logstash prune contract:
    whitelist wins if both are given; patterns are ANCHORED full-name
    matches like logstash's ``whitelist_names``). Driver-side only —
    the resulting projection is what reaches the parquet ReadSchema."""
    if whitelist is None and blacklist is None:
        raise ValueError("prune_fields: need whitelist or blacklist")
    if whitelist is not None:
        pats = [re.compile(p) for p in whitelist]
        keep = [c for c in df.columns if any(p.fullmatch(c) for p in pats)]
    else:
        pats = [re.compile(p) for p in blacklist or []]
        keep = [c for c in df.columns if not any(p.fullmatch(c) for p in pats)]
    if not keep:
        raise ValueError("prune_fields: pruning removed every column")
    return df.select(*keep)


def de_dot(df: DataFrame, sep: str = "_") -> DataFrame:
    """Rename every column containing ``.`` to use ``sep`` (logstash
    de_dot). Schema-only; collisions raise rather than silently merge."""
    new_names = [c.replace(".", sep) if "." in c else c for c in df.columns]
    if len(set(new_names)) != len(new_names):
        raise ValueError("de_dot: rename would collide column names")
    return df.toDF(*new_names)


# ------------------------------------------------------- string filters


def urldecode(col: Column | str) -> Column:
    """Percent-decode (``+`` → space, the form-encoding contract Spark's
    builtin implements — same as logstash urldecode on form data).
    ``try_url_decode``: malformed escapes (a stray ``%`` in a raw log
    line) yield NULL — the ``_urldecodefailure`` analog — instead of
    killing the job the way ``url_decode``'s CANNOT_DECODE_URL would."""
    return F.try_url_decode(F.col(col) if isinstance(col, str) else col)


def truncate_bytes(col: Column | str, max_bytes: int) -> Column:
    """Truncate to ``max_bytes`` of the UTF-8 ENCODING (the logstash
    truncate filter's length_bytes semantics — character substring
    would over-keep multibyte text)."""
    if max_bytes < 0:
        raise ValueError("truncate_bytes: max_bytes must be >= 0")
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c.cast("binary"), 1, max_bytes).cast("string")


def extract_numbers(col: Column | str) -> Column:
    """All numeric tokens (ints and floats, signed) in order —
    the extractnumbers filter. Returns ``array<string>``; callers
    needing typed values try_cast the elements (compared outputs
    ``array_join`` per the no-array house rule)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"-?\d+(?:\.\d+)?"), 0)


def json_encode(df: DataFrame, cols: list[str], dest: str) -> DataFrame:
    """Serialize ``cols`` into one compact JSON string column
    (logstash json_encode). Key order = declared order on both Spark
    and DuckDB, and NULL fields render as ``"k":null`` rather than
    vanishing (to_json defaults to ignoreNullFields=true, which would
    break oracle portability over nullable columns — and logstash
    serializes null), so the rendered text is oracle-portable."""
    return df.withColumn(
        dest,
        F.to_json(
            F.struct(*[F.col(c) for c in cols]),
            {"ignoreNullFields": "false"},
        ),
    )


def uuid3_field(*cols: Column | str, sep: str = "|") -> Column:
    """Deterministic RFC 4122 v3-style UUID from the md5 of the
    canonical ``sep``-joined fields (NULL → '' with a coalesce per
    field, so (NULL,'x') and ('x',NULL) cannot collide given the
    separator). Version nibble forced to ``3``, variant to ``8``."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")
        )
        for c in cols
    ]
    h = F.md5(F.concat_ws(sep, *parts))
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-3"),
        F.substring(h, 14, 3),
        F.lit("-8"),
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )


# ----------------------------------------------------------- cidr / tld


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad → uint32-as-long, pure JVM arithmetic."""
    o = F.split(F.col(col) if isinstance(col, str) else col, r"\.")
    return (
        o[0].cast("long") * 16777216
        + o[1].cast("long") * 65536
        + o[2].cast("long") * 256
        + o[3].cast("long")
    )


def _parse_cidr(cidr: str) -> tuple[int, int]:
    net_s, _, plen_s = cidr.partition("/")
    plen = int(plen_s) if plen_s else 32
    if not 0 <= plen <= 32:
        raise ValueError(f"cidr_match: bad prefix length in {cidr!r}")
    parts = net_s.split(".")
    if len(parts) != 4:
        raise ValueError(f"cidr_match: bad network in {cidr!r}")
    net = 0
    for p in parts:
        v = int(p)
        if not 0 <= v <= 255:
            raise ValueError(f"cidr_match: bad octet in {cidr!r}")
        net = net * 256 + v
    return net, plen


def cidr_match(ip_col: Column | str, cidrs: list[str]) -> Column:
    """First matching CIDR (as its literal string) or NULL — the
    logstash cidr filter over a CONFIGURATION-sized block list: each
    block compiles to one integer prefix compare
    (``ip >> (32-p) == net >> (32-p)``), chained when/otherwise in
    declared order. No join node, no shuffle — at 100 TB this rides the
    scan's Project. Data-sized block tables belong on
    range_bucket_join (q_ip_range_lookup), not here."""
    if not cidrs:
        raise ValueError("cidr_match: need at least one CIDR block")
    ip = ipv4_to_long(ip_col)
    out = F.lit(None).cast("string")
    for cidr in reversed(cidrs):
        net, plen = _parse_cidr(cidr)
        shift = 32 - plen
        hit = F.shiftright(ip, shift) == F.lit(net >> shift)
        out = F.when(hit, F.lit(cidr)).otherwise(out)
    return out


# Common second-level registries — the public-suffix-list idea
# restricted to a compact built-in core; pass `two_level` to extend
# (the full PSL is configuration, not machinery).
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.nz", "com.cn", "com.mx",
)


def tld_extract(
    host_col: Column | str,
    *,
    two_level: tuple[str, ...] = _TWO_LEVEL_SUFFIXES,
) -> dict[str, Column]:
    """Split a hostname into (tld, registered domain, subdomain) — the
    logstash tld filter. The effective TLD is the last label, or the
    last TWO labels when they form a known second-level registry
    (``co.uk`` …); the registered domain prepends one more label; the
    subdomain is whatever precedes it ('' when none). Pure
    split/slice/array_join — row-local, codegen'd."""
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: a 1-label host must not trip ANSI's array-index
    # error while evaluating the 2-label predicate.
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    is2 = (n >= 2) & last2.isin(*two_level)
    tld = F.when(is2, last2).otherwise(F.try_element_at(labels, F.lit(-1)))
    dom_labels = F.when(is2, F.lit(3)).otherwise(F.lit(2))
    domain = F.when(
        n >= dom_labels,
        F.concat_ws(
            ".", F.try_element_at(labels, (-dom_labels).cast("int")), tld
        ),
    ).otherwise(host)
    sub = F.when(
        n > dom_labels,
        F.array_join(F.slice(labels, 1, (n - dom_labels).cast("int")), "."),
    ).otherwise(F.lit(""))
    return {"tld": tld, "domain": domain, "subdomain": sub}
