"""Grok named-pattern compiler (operators/grok.py): combined-regex
compilation, positional capture groups, :int/:float typing, unmatched-line
NULL semantics, unknown-pattern safety."""

from __future__ import annotations

import pytest

from logstash_forwarder_spark.operators.grok import (
    GROK_PATTERNS,
    compile_grok,
    grok_extract,
)


def test_compile_groups_and_fields():
    rx, fields = compile_grok(r"%{IP:client} %{INT:code:int} %{IP} %{WORD:w}")
    assert [f[0] for f in fields] == ["client", "code", "w"]
    assert fields[1][1] == "int" and fields[0][1] is None
    import re

    m = re.match(rx, "1.2.3.4 -17 5.6.7.8 hello")
    assert m and m.group(1) == "1.2.3.4" and m.group(2) == "-17"
    assert m.group(3) == "hello"  # unnamed %{IP} captured nothing


def test_unknown_pattern_raises():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        compile_grok("%{NOPE:x}")


def test_all_library_patterns_compile():
    import re

    for name, body in GROK_PATTERNS.items():
        re.compile(body)
        rx, f = compile_grok(f"%{{{name}:x}}")
        assert re.compile(rx).groups == 1 and f == [("x", None)]


def test_grok_extract_typing_and_failure(spark):
    df = spark.createDataFrame(
        [
            ("svc42 ERROR latency=12.5 code=500",),
            ("not a matching line at all",),
        ],
        "line string",
    )
    out = grok_extract(
        df,
        r"%{WORD:svc} %{LOGLEVEL:level} latency=%{NUMBER:lat:float} "
        r"code=%{INT:code:int}",
    ).collect()
    good = next(r for r in out if r.svc == "svc42")
    assert (good.level, good.lat, good.code) == ("ERROR", 12.5, 500)
    bad = next(r for r in out if r.svc != "svc42")
    # grokparsefailure analog: empty strings, NULL typed fields
    assert bad.svc == "" and bad.level == ""
    assert bad.lat is None and bad.code is None


def test_grok_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("x 1",)], "line string")
    g = grok_extract(df, r"%{WORD:w} %{INT:n:int}")
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local projection only
