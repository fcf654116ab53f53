"""Bucketed co-located joins (plans/bucketing.py): the publish-time
shuffle buys exchange-free joins and aggregations forever after —
plan-asserted under autoBroadcastJoinThreshold=-1 (the at-scale regime
where neither join side broadcasts), results equal to the plain-parquet
join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from logstash_forwarder_spark.plans.bucketing import (
    assert_colocated,
    bucket_spec,
    colocated_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
    )
    sigs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 31 % 997).alias("sig")
    )
    write_bucketed(
        docs, "b_docs", path=str(tmp_path / "b_docs"),
        bucket_cols=["doc_id"], n_buckets=8,
    )
    write_bucketed(
        sigs, "b_sigs", path=str(tmp_path / "b_sigs"),
        bucket_cols=["doc_id"], n_buckets=8,
    )
    yield docs, sigs
    for t in ("b_docs", "b_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _final_plan(df) -> str:
    df.collect()  # materialize so AQE settles on the final plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    docs, sigs = bucketed_pair
    assert bucket_spec(spark, "b_docs") == (["doc_id"], 8)
    assert_colocated(spark, "b_docs", "b_sigs")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = colocated_join(spark, "b_docs", "b_sigs", on=["doc_id"]).select(
            "doc_id", "grp", "sig"
        )
        plan = _final_plan(j)
        assert "Exchange" not in plan  # neither side shuffles OR broadcasts
        assert "SortMergeJoin" in plan
        # the scan really is bucket-aware, not a coincidence of sizes
        assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
        # same rows as the plain (shuffling) parquet join
        want = sorted(
            map(tuple, docs.join(sigs, "doc_id").select("doc_id", "grp", "sig").collect())
        )
        assert sorted(map(tuple, j.collect())) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregate_has_no_exchange(spark, bucketed_pair):
    agg = spark.table("b_docs").groupBy("doc_id").agg(F.count("*").alias("n"))
    plan = _final_plan(agg)
    assert "Exchange" not in plan
    assert agg.count() == 2000


def test_colocation_mismatch_raises(spark, bucketed_pair, tmp_path):
    other = spark.range(10).select(F.col("id").alias("doc_id"))
    write_bucketed(
        other, "b_other", path=str(tmp_path / "b_other"),
        bucket_cols=["doc_id"], n_buckets=4,
    )
    try:
        with pytest.raises(ValueError):
            assert_colocated(spark, "b_docs", "b_other")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_other")


def test_unbucketed_table_rejected(spark, tmp_path):
    spark.range(5).write.mode("overwrite").option(
        "path", str(tmp_path / "plain")
    ).saveAsTable("plain_t")
    try:
        with pytest.raises(ValueError):
            bucket_spec(spark, "plain_t")
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_t")
