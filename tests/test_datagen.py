"""Determinism properties of the synthetic generator (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_forwarder_spark.datagen import gen_sequences, gen_source_dim


def test_deterministic_across_partitionings(spark):
    a = gen_sequences(spark, 1_000, num_partitions=2).orderBy("doc_id").collect()
    b = gen_sequences(spark, 1_000, num_partitions=7).orderBy("doc_id").collect()
    assert a == b


def test_invariants(spark):
    df = gen_sequences(spark, 5_000)
    assert df.filter(F.size("tokens") != F.col("n_tok")).count() == 0
    assert df.filter((F.col("n_tok") < 0) | (F.col("n_tok") > 512)).count() == 0
    bad_tok = df.filter(
        F.exists("tokens", lambda t: (t < 0) | (t >= 50_257))
    ).count()
    assert bad_tok == 0
    assert df.select("doc_id").distinct().count() == 5_000
    # edge rows present
    assert df.filter("n_tok = 0").count() > 0
    assert df.filter("n_tok = 1").count() > 0


def test_hot_key_skew(spark):
    df = gen_sequences(spark, 10_000)
    frac = df.filter("source = 'src_hot'").count() / 10_000
    assert 0.55 < frac < 0.65


def test_source_dim_shape(spark):
    dim = gen_source_dim(spark)
    rows = {r.source: r.fields for r in dim.collect()}
    assert "src_6" not in rows  # left-join null path
    assert "src_ghost" in rows  # matches no data
    assert rows["src_hot"]["type"] == "syslog"
