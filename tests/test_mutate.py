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


# ---- randomized property sweep: random op chains applied by Spark vs a
# pure-Python interpreter of the same mutate semantics ----
def _apply_py(rows, ops):
    out = [dict(r) for r in rows]
    for op in ops:
        kind, args = op[0], op[1:]
        for r in out:
            if kind == "gsub":
                f, pat, rep = args
                import re as _re

                r[f] = _re.sub(pat, rep, r[f])
            elif kind == "lowercase":
                r[args[0]] = r[args[0]].lower()
            elif kind == "uppercase":
                r[args[0]] = r[args[0]].upper()
            elif kind == "capitalize":
                v = r[args[0]]
                r[args[0]] = (v[:1].upper() + v[1:].lower()) if v else v
            elif kind == "strip":
                r[args[0]] = r[args[0]].strip(" ")
            elif kind == "copy":
                r[args[1]] = r[args[0]]
            elif kind == "rename":
                r[args[1]] = r.pop(args[0])
            elif kind == "replace":
                f, tmpl = args
                import re as _re

                r[f] = _re.sub(
                    r"%\{([A-Za-z0-9_@.]+)\}",
                    lambda m: str(r[m.group(1)]),
                    tmpl,
                )
    return out


def test_random_chains_vs_reference(spark):
    import numpy as np

    rng = np.random.default_rng(np.random.SeedSequence(5_2026))
    chars = np.array(list("aB cD!x_0"))
    base_fields = ["f0", "f1"]
    op_pool = [
        ("gsub", None, " +", "-"),
        ("gsub", None, "[0-9]", "#"),
        ("lowercase", None),
        ("uppercase", None),
        ("capitalize", None),
        ("strip", None),
    ]
    for trial in range(20):
        rows = [
            {
                f: "".join(rng.choice(chars, rng.integers(0, 10)))
                for f in base_fields
            }
            for _ in range(15)
        ]
        ops = []
        fields = list(base_fields)
        for _ in range(int(rng.integers(2, 7))):
            t = op_pool[rng.integers(0, len(op_pool))]
            f = fields[rng.integers(0, len(fields))]
            ops.append((t[0], f, *t[2:]) if t[1] is None else t)
        # finish with structural ops so they're always exercised
        ops.append(("copy", fields[0], "cp"))
        ops.append(("replace", "msg", "%{" + fields[0] + "}|%{" + fields[1] + "}"))
        ops.append(("rename", "cp", "cp2"))

        df = spark.createDataFrame(
            [tuple(r[f] for f in base_fields) for r in rows],
            ", ".join(f"{f} string" for f in base_fields),
        )
        got = [r.asDict() for r in mutate(df, ops).collect()]
        want = _apply_py(rows, ops)
        assert got == want, (trial, ops)


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
