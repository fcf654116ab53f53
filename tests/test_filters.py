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
