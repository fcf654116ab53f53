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

    for name in GROK_PATTERNS:
        rx, f = compile_grok(f"%{{{name}:x}}")
        # composites (COMBINEDAPACHELOG) also capture their inner named
        # fields; group count always equals declared-field count
        assert re.compile(rx).groups == len(f)
        assert f[0] == ("x", None)


def test_composite_httpdate_hostport():
    import re

    rx, f = compile_grok(r"\[%{HTTPDATE:ts}\] %{HOSTPORT:hp}")
    m = re.match(rx, "[17/Aug/2026:12:00:05 +0000] db-3.example.com:5432")
    assert m and m.group(1) == "17/Aug/2026:12:00:05 +0000"
    assert m.group(2) == "db-3.example.com:5432"
    assert [x[0] for x in f] == ["ts", "hp"]


def test_combinedapachelog_fields():
    import re

    rx, f = compile_grok("%{COMBINEDAPACHELOG}")
    line = (
        '10.0.0.7 - frank [17/Aug/2026:12:00:05 +0000] '
        '"GET /d/42 HTTP/1.1" 200 2326 '
        '"http://r.example/3" "Mozilla/5.0 (X11; rv:2) Engine/1"'
    )
    m = re.match(rx, line)
    assert m
    got = {name: m.group(i) for i, (name, _) in enumerate(f, start=1)}
    assert got["clientip"] == "10.0.0.7"
    assert got["ident"] == "-" and got["auth"] == "frank"
    assert got["timestamp"] == "17/Aug/2026:12:00:05 +0000"
    assert got["verb"] == "GET" and got["request"] == "/d/42"
    assert got["httpversion"] == "1.1"
    assert got["response"] == "200" and got["bytes"] == "2326"
    assert got["referrer"] == '"http://r.example/3"'
    assert got["agent"] == '"Mozilla/5.0 (X11; rv:2) Engine/1"'
    # typed fields per the library entry
    casts = dict(f)
    assert casts["response"] == "int" and casts["bytes"] == "int"


def test_pattern_definitions_user_and_composite():
    import re

    rx, f = compile_grok(
        r"%{SESSION:sess} from %{ENDPOINT:ep}",
        pattern_definitions={
            "SESSION": r"sess-\d+",
            # user composites may reference library AND user patterns
            "ENDPOINT": r"%{HOSTPORT}/%{SESSION}",
        },
    )
    m = re.match(rx, "sess-12 from h1.example.org:80/sess-99")
    assert m and m.group(1) == "sess-12"
    assert m.group(2) == "h1.example.org:80/sess-99"
    assert [x[0] for x in f] == ["sess", "ep"]


def test_recursive_pattern_raises():
    with pytest.raises(ValueError, match="recursive grok pattern"):
        compile_grok("%{A:x}", pattern_definitions={"A": "%{B}", "B": "%{A}"})


def test_literal_capturing_group_raises():
    # ADVICE r4: a raw '(' would silently shift every positional field
    with pytest.raises(ValueError, match="capturing groups"):
        compile_grok(r"(%{WORD:w}) %{INT:n:int}")
    with pytest.raises(ValueError, match="capturing groups"):
        compile_grok(
            "%{BAD:x}", pattern_definitions={"BAD": r"(a|b)c"}
        )


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


def test_load_pattern_files(tmp_path, spark):
    from logstash_forwarder_spark.operators.grok import (
        compile_grok,
        grok_extract,
        load_pattern_files,
    )

    p1 = tmp_path / "core.patterns"
    p1.write_text(
        "# session ids\n"
        "\n"
        "SESSIONID sess-%{INT}\n"
        "UNIT %{WORD}(?:\\.%{WORD})?\n"
    )
    p2 = tmp_path / "override.patterns"
    p2.write_text("SESSIONID sid:%{POSINT}\n")  # later file wins

    defs = load_pattern_files([str(p1), str(p2)])
    assert defs["SESSIONID"] == "sid:%{POSINT}"
    rx, fields = compile_grok("%{SESSIONID:sid} %{UNIT:unit}", defs)
    assert [f for f, _ in fields] == ["sid", "unit"]

    df = spark.createDataFrame(
        [(1, "sid:42 api.auth ok")], "id long, line string"
    )
    row = grok_extract(
        df, "%{SESSIONID:sid} %{UNIT:unit}", pattern_definitions=defs
    ).first()
    assert (row.sid, row.unit) == ("sid:42", "api.auth")

    bad = tmp_path / "bad.patterns"
    bad.write_text("NOT-A-NAME body\n")
    with pytest.raises(ValueError, match="malformed pattern line"):
        load_pattern_files([str(bad)])
