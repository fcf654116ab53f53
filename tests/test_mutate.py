from __future__ import annotations

import pytest

from logstash_forwarder_spark.operators.mutate import mutate


def _one(df):
    return df.first().asDict()


def test_full_chain_order_observable(spark):
    df = spark.createDataFrame(
        [(1, "  Hello   World X ", "src_a", 42)],
        "doc_id long, text string, source string, n_chars int",
    )
    out = mutate(
        df,
        [
            ("copy", "text", "norm"),
            ("gsub", "norm", r"\s+", " "),
            ("strip", "norm"),
            ("lowercase", "norm"),
            ("split", "norm", " "),
            ("join", "norm", "_"),
            ("rename", "norm", "slug"),
            ("convert", "n_chars", "string"),
            ("replace", "summary", "%{source}|%{n_chars}c"),
            ("uppercase", "source"),
            ("capitalize", "slug"),
        ],
    )
    row = _one(out)
    assert row["slug"] == "Hello_world_x"
    # replace ran BEFORE uppercase: summary sees the original source
    assert row["summary"] == "src_a|42c"
    assert row["source"] == "SRC_A"
    assert row["n_chars"] == "42"
    assert dict(out.dtypes)["n_chars"] == "string"


def test_split_separator_is_literal_not_regex(spark):
    df = spark.createDataFrame([("a.b.c",)], "v string")
    assert _one(mutate(df, [("split", "v", ".")]))["v"] == ["a", "b", "c"]


def test_merge_concatenates_arrays(spark):
    df = spark.createDataFrame(
        [(["a"], ["b", "c"])], "x array<string>, y array<string>"
    )
    assert _one(mutate(df, [("merge", "x", "y")]))["x"] == ["a", "b", "c"]


def test_convert_unparseable_is_null_and_bad_type_raises(spark):
    df = spark.createDataFrame([("12",), ("nope",)], "v string")
    vals = [r.v for r in mutate(df, [("convert", "v", "integer")]).collect()]
    assert sorted(v for v in vals if v is not None) == [12]
    assert None in vals
    with pytest.raises(ValueError, match="unsupported type"):
        mutate(df, [("convert", "v", "decimal")])


def test_update_noop_vs_replace_creates(spark):
    df = spark.createDataFrame([("a",)], "v string")
    out = mutate(df, [("update", "missing", "%{v}"), ("replace", "made", "%{v}!")])
    assert "missing" not in out.columns
    assert _one(out)["made"] == "a!"


def test_template_unknown_field_and_unknown_op_raise(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="unknown field"):
        mutate(df, [("replace", "x", "%{nope}")])
    with pytest.raises(ValueError, match="no such field"):
        mutate(df, [("strip", "nope")])
    with pytest.raises(ValueError, match="unknown mutate op"):
        mutate(df, [("explode", "v")])


def test_empty_string_roundtrip(spark):
    df = spark.createDataFrame([("",)], "v string")
    out = mutate(df, [("split", "v", " "), ("join", "v", "_"), ("capitalize", "v")])
    assert _one(out)["v"] == ""


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("a b", "s")], "text string, source string")
    out = mutate(
        df,
        [
            ("gsub", "text", " ", "_"),
            ("replace", "msg", "%{source}:%{text}"),
            ("capitalize", "msg"),
        ],
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
