"""applyInPandasWithState: per-source running totals accumulate across
micro-batches (the registrar fold as streaming state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_forwarder_spark.datagen import gen_sequences
from logstash_forwarder_spark.schema import SEQUENCES_SCHEMA
from logstash_forwarder_spark.streaming.stateful import running_source_totals


def test_running_totals_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    # two files → maxFilesPerTrigger=1 forces two micro-batches
    gen_sequences(spark, 1_000, num_partitions=1).write.parquet(in_dir)
    gen_sequences(spark, 500, num_partitions=1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        running_source_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per source must equal the full batch aggregate
    got = spark.sql(
        """SELECT source, max(row_count) AS row_count,
                  max(token_total) AS token_total
           FROM totals GROUP BY source"""
    )
    both = (
        spark.read.parquet(in_dir)
        .groupBy("source")
        .agg(F.count("*").alias("row_count"), F.sum("n_tok").alias("token_total"))
    )
    g = {r.source: (r.row_count, r.token_total) for r in got.collect()}
    w = {r.source: (r.row_count, r.token_total) for r in both.collect()}
    assert g == w
    # more than one micro-batch actually ran (state really accumulated)
    n_updates = spark.sql("SELECT count(*) FROM totals").first()[0]
    assert n_updates > len(w)
