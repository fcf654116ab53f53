from __future__ import annotations

import pytest

from logstash_forwarder_spark.operators.filters import (
    csv_extract,
    translate,
    useragent_extract,
    xml_extract,
)

UAS = {
    # family precedence: Edge before the Chrome it embeds
    "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36 Edg/120.0.2210": (
        "Edge", "120", "Windows",
    ),
    "Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/119.0.0.0 Safari/537.36": (
        "Chrome", "119", "Windows",
    ),
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0": (
        "Firefox", "121", "Linux",
    ),
    # mobile Safari: Version/.../Mobile/... Safari/ and iOS before macOS
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) Version/17.1 "
    "Mobile/15E148 Safari/604.1": ("Safari", "17", "iOS"),
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/16.5 "
    "Safari/605.1.15": ("Safari", "16", "macOS"),
    # Android UAs contain "Linux": Android must win
    "Mozilla/5.0 (Linux; Android 14) Chrome/120.0.6099.43 Mobile "
    "Safari/537.36": ("Chrome", "120", "Android"),
    "Opera/9.80 (Windows NT 6.0) Presto/2.12.388 Version/12.14": (
        "Opera", "9", "Windows",
    ),
    "curl/8.4.0": ("curl", "8", "Other"),
    "Googlebot/2.1 (+http://www.google.com/bot.html)": (
        "Googlebot", "2", "Other",
    ),
    "something else entirely": ("Other", None, "Other"),
}


def test_useragent_families_versions_os(spark):
    df = spark.createDataFrame([(u,) for u in UAS], "agent string")
    got = {
        r.agent: (r.ua_family, r.ua_major, r.ua_os)
        for r in useragent_extract(df).collect()
    }
    for ua, want in UAS.items():
        assert got[ua] == want, ua


def test_translate_fallbacks(spark):
    df = spark.createDataFrame([("a",), ("x",), (None,)], "k string")
    # with default: misses (and NULL keys) take the default
    d = {r.k: r.cat for r in translate(
        df, "k", {"a": "A"}, dest="cat", default="dflt").collect()}
    assert d == {"a": "A", "x": "dflt", None: "dflt"}
    # without default: passthrough of the source value
    p = {r.k: r.cat for r in translate(
        df, "k", {"a": "A"}, dest="cat").collect()}
    assert p == {"a": "A", "x": "x", None: None}
    # in-place when dest omitted
    assert translate(df, "k", {"a": "A"}).columns == ["k"]
    with pytest.raises(ValueError, match="non-empty"):
        translate(df, "k", {})


def test_csv_quotes_escapes_types(spark):
    df = spark.createDataFrame(
        [('5,"a,b ""x""",7.5',), ("6,plain,",), ("7,unparseable,oops",)],
        "line string",
    )
    out = csv_extract(
        df, "line", ["id", "name", "score"],
        types={"id": "long", "score": "double"},
    ).collect()
    rows = {r.id: (r.name, r.score) for r in out}
    assert rows[5] == ('a,b "x"', 7.5)
    assert rows[6] == ("plain", None)  # empty typed field -> NULL
    assert rows[7] == ("unparseable", None)  # bad double -> NULL, not error
    with pytest.raises(ValueError, match="non-empty"):
        csv_extract(df, "line", [])


def test_xml_attributes_elements_malformed(spark):
    df = spark.createDataFrame(
        [
            ('<ev id="5" kind="click"><user>u7</user><val>3</val></ev>',),
            ('<ev id="6"><user>u8</user></ev>',),  # missing optional fields
            ("not xml at all",),  # malformed -> all-NULL, not an error
        ],
        "line string",
    )
    out = xml_extract(
        df, "line", "_id long, _kind string, user string, val long"
    ).collect()
    rows = {r._id: (r._kind, r.user, r.val) for r in out}
    assert rows[5] == ("click", "u7", 3)
    assert rows[6] == (None, "u8", None)
    assert rows[None] == (None, None, None)


def test_csv_custom_separator(spark):
    df = spark.createDataFrame([("a|b|c",)], "line string")
    r = csv_extract(df, "line", ["x", "y", "z"], sep="|").first()
    assert (r.x, r.y, r.z) == ("a", "b", "c")


def test_plans_are_jvm_only(spark):
    ua = spark.createDataFrame([("curl/8.0",)], "agent string")
    tr = translate(
        useragent_extract(ua), "ua_family", {"curl": "cli"}, dest="kind"
    )
    cv = csv_extract(
        spark.createDataFrame([("1,2",)], "line string"), "line", ["a", "b"]
    )
    for df in (tr, cv):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


# ---------------------------------------------------------------------------
# syslog_pri / kv / split / anonymize+checksum (round-5 additions)
# ---------------------------------------------------------------------------


def test_syslog_pri_decode(spark):
    from logstash_forwarder_spark.operators.filters import syslog_pri_extract

    rows = [
        ("<34>su: auth failure",),       # facility 4, severity 2
        ("<165>local4 notice text",),    # facility 20, severity 5
        ("<0>kernel emergency",),        # boundary low
        ("<191>local7 debug",),          # boundary high
        ("<192>out of range",),          # > 191 → default, keep full text
        ("no pri at all",),              # missing → default 13
        ("<13>user notice",),            # the default value itself, valid
    ]
    df = spark.createDataFrame(rows, "line string")
    got = {r.line: r for r in syslog_pri_extract(df, "line").collect()}
    r = got["<34>su: auth failure"]
    assert (r.syslog_pri, r.syslog_facility_code, r.syslog_severity_code) == (
        34, 4, 2,
    )
    assert r.syslog_facility == "security/authorization"
    assert r.syslog_severity == "critical"
    assert r.message == "su: auth failure"
    r = got["<165>local4 notice text"]
    assert (r.syslog_facility, r.syslog_severity) == ("local4", "notice")
    assert got["<0>kernel emergency"].syslog_facility == "kernel"
    assert got["<0>kernel emergency"].syslog_severity == "emergency"
    assert got["<191>local7 debug"].syslog_facility == "local7"
    assert got["<191>local7 debug"].syslog_severity == "debug"
    # out-of-range and missing both take the documented default 13 and
    # keep the whole line as message
    for line in ("<192>out of range", "no pri at all"):
        r = got[line]
        assert (r.syslog_pri, r.syslog_facility, r.syslog_severity) == (
            13, "user-level", "notice",
        )
        assert r.message == line
    assert got["<13>user notice"].message == "user notice"


def test_kv_extract_types_missing_and_dup(spark):
    from logstash_forwarder_spark.operators.filters import kv_extract

    rows = [
        ("a=1 b=x c=2.5",),
        ("b=y",),                 # a, c missing → NULL
        ("a=notanint b=z",),      # failed cast → NULL
        ("a=1 a=2 b=dup",),       # duplicate key → last wins
    ]
    df = spark.createDataFrame(rows, "kv string")
    out = kv_extract(
        df, "kv", {"a": "long", "b": "string", "c": "double"}
    ).collect()
    by_kv = {r.kv: r for r in out}
    assert (by_kv["a=1 b=x c=2.5"].a, by_kv["a=1 b=x c=2.5"].b) == (1, "x")
    assert by_kv["a=1 b=x c=2.5"].c == 2.5
    assert by_kv["b=y"].a is None and by_kv["b=y"].c is None
    assert by_kv["a=notanint b=z"].a is None
    assert by_kv["a=1 a=2 b=dup"].a == 2


def test_split_field_positions_and_no_shuffle(spark):
    from logstash_forwarder_spark.operators.filters import split_field

    df = spark.createDataFrame(
        [(1, "x,y,z"), (2, "solo"), (3, "")], "id long, csvlist string"
    )
    out = split_field(df, "csvlist", sep=",", dest="item", idx="i")
    rows = sorted((r.id, r.i, r.item) for r in out.collect())
    assert rows == [(1, 0, "x"), (1, 1, "y"), (1, 2, "z"), (2, 0, "solo"), (3, 0, "")]
    # literal separator: a regex metachar sep must not be interpreted
    df2 = spark.createDataFrame([(1, "a|b")], "id long, v string")
    got = sorted(r.item for r in split_field(df2, "v", sep="|", dest="item").collect())
    assert got == ["a", "b"]
    # row-local fan-out: no exchange in the plan
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_anonymize_and_checksum(spark):
    import hashlib

    from logstash_forwarder_spark.operators.filters import (
        anonymize_fields,
        checksum_field,
    )

    df = spark.createDataFrame(
        [(7, 42, "click"), (8, None, "view")],
        "event_id long, user_id long, event_type string",
    )
    out = {
        r.event_id: r
        for r in anonymize_fields(
            checksum_field(df, ["event_id", "user_id", "event_type"]),
            ["user_id"],
        ).collect()
    }
    assert out[7].user_id == hashlib.sha256(b"42").hexdigest()
    assert out[7].checksum == hashlib.md5(b"7|42|click").hexdigest()
    # NULL field: anonymize keeps NULL; concat_ws renders '' for checksum
    assert out[8].user_id is None
    assert out[8].checksum == hashlib.md5(b"8||view").hexdigest()


def test_kv_extract_near_miss_key(spark):
    from logstash_forwarder_spark.operators.filters import kv_extract

    df = spark.createDataFrame([("xa=5 b=1",)], "kv string")
    r = kv_extract(df, "kv", {"a": "long", "b": "long"}).collect()[0]
    assert r.a is None and r.b == 1


def test_clone_events_fanout_and_plan(spark):
    from pyspark.sql import functions as F

    from logstash_forwarder_spark.operators.filters import clone_events

    df = spark.createDataFrame(
        [(1, "error"), (2, "view")], "event_id long, type string"
    )
    out = clone_events(df, ["audit", "replay"])
    rows = out.collect()
    assert len(rows) == 6  # original + 2 clones each
    got = {(r.event_id, r.type, r.cloned) for r in rows}
    assert (1, "error", False) in got  # original keeps its type
    assert (1, "audit", True) in got and (2, "replay", True) in got
    # row-local fan-out: Generate, no Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" in plan
    _ = F  # imported for parity with sibling tests


def test_range_tags_bounds_and_nulls(spark):
    from pyspark.sql import functions as F

    from logstash_forwarder_spark.operators.filters import range_tags

    df = spark.createDataFrame(
        [(1, 5.0, 3), (2, 11.0, 99), (3, None, 99), (4, -0.5, 99)],
        "id long, v double, n long",
    )
    tags = range_tags(
        [("v", 0.0, 10.0, "v_range"), ("n", 0, 10, "n_range")]
    )
    got = {r.id: r.t for r in df.select("id", tags.alias("t")).collect()}
    assert got == {
        1: "",  # both in range
        2: "v_range,n_range",  # both out, check order preserved
        3: "n_range",  # NULL field skipped (logstash contract)
        4: "v_range,n_range",  # below lo counts too
    }
    _ = F


def test_dns_lookup_hit_miss_replace(spark):
    from logstash_forwarder_spark.operators.filters import dns_lookup

    logs = spark.createDataFrame(
        [(1, "10.0.0.1"), (2, "10.0.0.2")], "id long, client string"
    )
    hosts = spark.createDataFrame(
        [("10.0.0.1", "gw.example")], "addr string, name string"
    )
    ap = {r.id: r for r in dns_lookup(logs, hosts, field="client").collect()}
    assert ap[1].resolved == "gw.example" and ap[1].dns_tags == ""
    assert ap[2].resolved is None and ap[2].dns_tags == "_dnsfailure"
    rp = {
        r.id: r
        for r in dns_lookup(
            logs, hosts, field="client", action="replace"
        ).collect()
    }
    assert rp[1].client == "gw.example"
    assert rp[2].client == "10.0.0.2"  # miss keeps the original
    # cache-sized side broadcasts
    plan = (
        dns_lookup(logs, hosts, field="client")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_metricize_expand_no_exchange(spark):
    from logstash_forwarder_spark.operators.filters import metricize

    df = spark.createDataFrame(
        [(1, 10, 20, 30)], "id long, a long, b long, c long"
    )
    out = metricize(df, ["a", "b", "c"], id_cols=["id"])
    got = {(r.metric, r.value) for r in out.collect()}
    assert got == {("a", 10), ("b", 20), ("c", 30)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cipher_field_deterministic_roundtrip(spark):
    from pyspark.sql import functions as F

    from logstash_forwarder_spark.operators.filters import cipher_field

    key = "0123456789abcdef"
    df = spark.createDataFrame(
        [(1, "the same text"), (2, "the same text"), (3, "different")],
        "id long, t string",
    )
    enc = df.select("id", "t", cipher_field("t", key).alias("ct"))
    rows = {r.id: r for r in enc.collect()}
    # determinism: identical plaintexts -> identical ciphertexts (the
    # property that keeps dedup/group-by working over tokenized fields)
    assert rows[1].ct == rows[2].ct != rows[3].ct
    assert all(r.ct != r.t for r in rows.values())
    dec = enc.select(
        "id", (cipher_field("ct", key, decrypt=True) == F.col("t")).alias("ok")
    )
    assert all(r.ok for r in dec.collect())
