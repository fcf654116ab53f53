"""Dissect positional parsing: extraction, typing, skip fields, failure
shape, and the no-regex/no-Python plan claim."""

import pytest

from logstash_forwarder_spark.operators.dissect import (
    dissect_columns,
    dissect_extract,
)

PAT = '%{client} - - [%{ts}] "%{method} %{path} HTTP/1.1" %{status:int} %{bytes:long}'


def test_basic_extraction_and_types(spark):
    df = spark.createDataFrame(
        [('10.0.0.1 - - [2024-01-01T00:00:05] "GET /d/5 HTTP/1.1" 200 123',)],
        "line string",
    )
    out = dissect_extract(df, PAT).collect()[0]
    assert out.client == "10.0.0.1"
    assert out.ts == "2024-01-01T00:00:05"
    assert out.method == "GET"
    assert out.path == "/d/5"
    assert out.status == 200 and out.bytes == 123
    schema = dict(dissect_extract(df, PAT).dtypes)
    assert schema["status"] == "int" and schema["bytes"] == "bigint"


def test_leading_literal_and_skip_field(spark):
    df = spark.createDataFrame([("pre:a|b|c",)], "line string")
    out = dissect_extract(df, "pre:%{x}|%{}|%{z}").collect()[0]
    assert out.asDict() == {"x": "a", "z": "c"}


def test_last_field_runs_to_end(spark):
    df = spark.createDataFrame([("lvl rest of the message",)], "line string")
    out = dissect_extract(df, "%{level} %{msg}").collect()[0]
    assert out.msg == "rest of the message"


def test_unmatched_delimiter_yields_empty_fields(spark):
    # dissect failure analog: missing ']' → ts swallows the rest,
    # downstream fields empty / NULL-cast (filter on a required field)
    df = spark.createDataFrame([("x - - [no-close 200 7",)], "line string")
    out = dissect_extract(df, PAT).collect()[0]
    assert out.client == "x" and out.status is None and out.bytes is None


def test_keep_preserves_input_columns(spark):
    df = spark.createDataFrame([("a b", 7)], "line string, k int")
    out = dissect_extract(df, "%{x} %{y}", keep=True).collect()[0]
    assert out.k == 7 and out.x == "a" and out.y == "b"


def test_pattern_errors():
    with pytest.raises(ValueError, match="no %"):
        dissect_columns("no keys here", "line")
    with pytest.raises(ValueError, match="adjacent"):
        dissect_columns("%{a}%{b}", "line")
    with pytest.raises(ValueError, match="malformed"):
        dissect_columns("%{a} %{b", "line")


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("a - - [t] \"G /p HTTP/1.1\" 1 2",)], "line string")
    out = dissect_extract(df, PAT)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


# ---- randomized property sweep: compiled JVM extraction vs a pure-Python
# dissect reference (value = up-to-first-delimiter, advance past it;
# absent delimiter swallows the rest and empties downstream fields) ----
def _dissect_py(lead, fields, line):
    out = {}
    rest = line[len(lead):]
    for name, cast, delim in fields:
        if delim:
            val = rest.split(delim, 1)[0]
            rest = rest[len(val) + len(delim):]
        else:
            val = rest
        if name:
            out[name] = val
    return out


def test_random_roundtrip_vs_reference(spark):
    import numpy as np

    from logstash_forwarder_spark.operators.dissect import _tokenize

    rng = np.random.default_rng(np.random.SeedSequence(20260817))
    patterns = [
        "%{a} %{b}|%{c}",
        "pre:%{x} - [%{y}] %{z}",
        "%{k}=%{v};%{rest}",
    ]
    val_chars = np.array(list("abcdefXYZ0123_"))
    for pat in patterns:
        lead, fields = _tokenize(pat)
        rows = []
        for _ in range(120):
            vals = [
                "".join(rng.choice(val_chars, rng.integers(0, 6)))
                for _ in fields
            ]
            # render faithfully; occasionally corrupt by dropping a tail
            line = lead + "".join(
                v + d for v, d in zip(vals, (f[2] for f in fields))
            )
            if rng.random() < 0.25:
                line = line[: rng.integers(0, len(line) + 1)]
            rows.append((line,))
        df = spark.createDataFrame(rows, "line string")
        got = dissect_extract(df, pat).collect()
        for (line,), g in zip(rows, got):
            exp = _dissect_py(lead, fields, line)
            assert g.asDict() == exp, (pat, line)
