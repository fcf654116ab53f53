"""Iceberg-style snapshot log over the registrar: commit ordering,
VERSION AS OF / TIMESTAMP AS OF reads at sink-commit granularity."""

from __future__ import annotations

import os

import pytest

from logstash_forwarder_spark.datagen import gen_sequences, gen_source_dim
from logstash_forwarder_spark.pipeline import PipelineSpec, run_pipeline
from logstash_forwarder_spark.plans.registrar import Registrar, SnapshotLog


def _run(spark, tmp_out, run_id="snaprun"):
    seqs = gen_sequences(spark, 3000, num_partitions=4)
    dim = gen_source_dim(spark)
    run_pipeline(spark, seqs, dim, PipelineSpec(out_dir=tmp_out, run_id=run_id))
    return SnapshotLog(Registrar(os.path.join(tmp_out, "_checkpoint")))


def test_snapshot_ordering_and_current(spark, tmp_out):
    log = _run(spark, tmp_out)
    snaps = log.snapshots()
    assert len(snaps) >= 2  # one per committed sink
    assert [s.sequence_number for s in snaps] == list(range(len(snaps)))
    assert all(
        a.committed_at <= b.committed_at for a, b in zip(snaps, snaps[1:])
    )
    assert log.current().snapshot_id == snaps[-1].snapshot_id
    # stable across re-listing
    assert [s.snapshot_id for s in log.snapshots()] == [
        s.snapshot_id for s in snaps
    ]


def test_version_as_of_sees_prefix_of_commits(spark, tmp_out):
    log = _run(spark, tmp_out)
    snaps = log.snapshots()
    first, last = snaps[0], snaps[-1]
    df_first = log.read_as_of(spark, tmp_out, "snaprun", snapshot_id=first.snapshot_id)
    df_full = log.read_as_of(spark, tmp_out, "snaprun", snapshot_id=last.snapshot_id)
    sinks_first = {r.sink for r in df_first.select("sink").distinct().collect()}
    sinks_full = {r.sink for r in df_full.select("sink").distinct().collect()}
    assert sinks_first == {first.sink}
    assert sinks_full == {s.sink for s in snaps}
    assert df_first.count() < df_full.count()


def test_timestamp_as_of_and_errors(spark, tmp_out):
    log = _run(spark, tmp_out)
    snaps = log.snapshots()
    # TIMESTAMP AS OF includes every commit whose instant ties <= the
    # requested time — one pipeline run publishes with a shared lineage
    # write instant, so the whole run is one timestamp-travel transaction
    df = log.read_as_of(spark, tmp_out, "snaprun", as_of=snaps[0].committed_at)
    expect = {s.sink for s in snaps if s.committed_at <= snaps[0].committed_at}
    assert {r.sink for r in df.select("sink").distinct().collect()} == expect
    # a timestamp strictly before the first commit sees nothing
    import datetime

    with pytest.raises(ValueError, match="no committed sink"):
        log.read_as_of(
            spark,
            tmp_out,
            "snaprun",
            as_of=snaps[0].committed_at - datetime.timedelta(seconds=1),
        )
    with pytest.raises(ValueError, match="unknown snapshot_id"):
        log.read_as_of(spark, tmp_out, "snaprun", snapshot_id="nope")
    with pytest.raises(ValueError, match="no committed sink"):
        log.read_as_of(spark, tmp_out, "otherrun")
