"""Multiline assembly: fold semantics, orphan handling, custom start
patterns, and the single-exchange plan claim (the hash-agg reuses the
window's file-clustered distribution)."""

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.multiline import multiline_assemble

LINES = [
    ("a.log", 1, "EV one"),
    ("a.log", 2, "  at f1"),
    ("a.log", 3, "  at f2"),
    ("a.log", 4, "EV two"),
    ("b.log", 1, "  orphan tail"),
    ("b.log", 2, "EV three"),
]
SCHEMA = "file string, line_no long, line string"


def _final_plan(df) -> str:
    txt = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial plan per adaptive subtree (CLAUDE.md) —
    # keep only the final sections
    return txt.split("== Initial Plan ==")[0]


def test_fold_and_message_order(spark):
    ev = {
        (r.file, r.event_no): r
        for r in multiline_assemble(spark.createDataFrame(LINES, SCHEMA)).collect()
    }
    assert ev[("a.log", 1)].message == "EV one\n  at f1\n  at f2"
    assert ev[("a.log", 1)].n_lines == 3
    assert ev[("a.log", 2)].message == "EV two"
    assert ev[("b.log", 1)].message == "EV three"
    assert not ev[("a.log", 1)].is_orphan


def test_orphan_leading_continuation(spark):
    ev = {
        (r.file, r.event_no): r
        for r in multiline_assemble(spark.createDataFrame(LINES, SCHEMA)).collect()
    }
    orphan = ev[("b.log", 0)]
    assert orphan.is_orphan and orphan.message == "  orphan tail"


def test_custom_start_pattern(spark):
    rows = [
        ("c.log", 1, "2024-01-01 boot"),
        ("c.log", 2, "trace line"),
        ("c.log", 3, "2024-01-02 next"),
    ]
    out = multiline_assemble(
        spark.createDataFrame(rows, SCHEMA), start_pattern=r"^\d{4}-"
    ).collect()
    msgs = sorted(r.message for r in out)
    assert msgs == ["2024-01-01 boot\ntrace line", "2024-01-02 next"]


def test_single_exchange_plan(spark):
    df = spark.createDataFrame(LINES, SCHEMA).repartition(4)
    ev = multiline_assemble(df)
    ev.collect()
    plan = _final_plan(ev)
    # one Exchange for the window; the (file, event_no) hash-agg is
    # satisfied by the window's hashpartitioning(file) — no second
    # data shuffle (the repartition(4) RoundRobin above is input prep)
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_udtf_twin_matches_relational_fold(spark):
    """Spark 4 Python UDTF with TABLE ... PARTITION BY ... ORDER BY:
    per-group instance lifecycle + ordered eval reproduces the window
    fold row-for-row (the §2.12 surface-completion form)."""
    from logstash_forwarder_spark.operators.multiline import (
        make_multiline_udtf,
    )

    rows = LINES + [
        ("d.log", 1, "  lead orphan 1"),
        ("d.log", 2, "  lead orphan 2"),
        ("d.log", 3, "EV four"),
        ("d.log", 4, "  tail"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    df.createOrReplaceTempView("ml_lines")
    spark.udtf.register("assemble_ml", make_multiline_udtf())
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM assemble_ml(TABLE(ml_lines) "
            "PARTITION BY file ORDER BY line_no)"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in multiline_assemble(df)
        .select("file", "event_no", "first_line", "n_lines", "message", "is_orphan")
        .collect()
    )
    assert got == want
    assert len(got) == 6  # 4 events + b.log orphan + d.log orphan
