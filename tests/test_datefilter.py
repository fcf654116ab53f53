from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.datefilter import parse_date

ISO = "yyyy-MM-dd'T'HH:mm:ssZ"
CLF = "dd/MMM/yyyy:HH:mm:ss Z"
MON = "MMM dd yyyy HH:mm:ss"


def _epochs(df):
    return {
        r.raw: (r.epoch, r.failed)
        for r in df.select(
            "raw",
            F.unix_timestamp("event_ts").alias("epoch"),
            F.col("event_ts_failed").alias("failed"),
        ).collect()
    }


def test_format_chain_all_formats_one_instant(spark):
    rows = [
        ("2024-01-01T00:01:13+0000",),
        ("01/Jan/2024:00:01:13 +0000",),
        ("Jan 01 2024 00:01:13",),
        ("1704067273",),
        ("corrupt~73",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = _epochs(parse_date(df, "raw", [ISO, CLF, MON, "UNIX"]))
    for raw in list(got)[:4]:
        assert got[raw] == (1704067273, False), raw
    assert got["corrupt~73"] == (None, True)


def test_declared_order_wins():
    # a stamp valid under two formats resolves by list order: day/month
    # vs month/day ambiguity is decided by whichever pattern is first
    from logstash_forwarder_spark.session import get_spark

    spark = get_spark("lfs-tests")
    df = spark.createDataFrame([("02/03/2024 00:00:00",)], "raw string")
    dm = parse_date(df, "raw", ["dd/MM/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm:ss"])
    md = parse_date(df, "raw", ["MM/dd/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm:ss"])
    d1 = dm.select(F.date_format("event_ts", "yyyy-MM-dd").alias("d")).first().d
    d2 = md.select(F.date_format("event_ts", "yyyy-MM-dd").alias("d")).first().d
    assert (d1, d2) == ("2024-03-02", "2024-02-03")


def test_unix_ms_and_digit_guard(spark):
    df = spark.createDataFrame(
        [("1704067273000",), ("1704067273",), ("12345678901234567890",)],
        "raw string",
    )
    out = parse_date(df, "raw", ["UNIX_MS"])
    got = _epochs(out)
    assert got["1704067273000"] == (1704067273, False)
    assert got["1704067273"] == (1704067, False)  # seconds read AS millis
    # >13 digits: the rlike guard rejects rather than overflowing the cast
    assert got["12345678901234567890"] == (None, True)


def test_null_source_is_not_failure(spark):
    df = spark.createDataFrame([(None,), ("nope",)], "raw string")
    out = parse_date(df, "raw", ["UNIX"])
    rows = {r.raw: r.event_ts_failed for r in out.collect()}
    assert rows[None] is False  # absent field ≠ parse failure
    assert rows["nope"] is True


def test_failure_tagging_appends_to_tags(spark):
    df = spark.createDataFrame(
        [("x", ["kept"]), ("1704067273", ["kept"]), ("y", None)],
        "raw string, tags array<string>",
    )
    out = parse_date(df, "raw", ["UNIX"], tags_col="tags")
    rows = {r.raw: r.tags for r in out.collect()}
    assert rows["x"] == ["kept", "_dateparsefailure"]
    assert rows["1704067273"] == ["kept"]
    assert rows["y"] == ["_dateparsefailure"]  # NULL tags coalesced to []


def test_empty_formats_rejected(spark):
    df = spark.createDataFrame([("x",)], "raw string")
    with pytest.raises(ValueError, match="non-empty"):
        parse_date(df, "raw", [])


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("1704067273",)], "raw string")
    out = parse_date(df, "raw", [ISO, CLF, "UNIX"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
