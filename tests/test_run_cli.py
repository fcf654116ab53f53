from __future__ import annotations

import json

from logstash_forwarder_spark.datagen import gen_sequences
from logstash_forwarder_spark.run import main


def test_run_cli_input_path(spark, tmp_path, capsys):
    in_dir = str(tmp_path / "seqs")
    gen_sequences(spark, 1_000, num_partitions=2).write.parquet(in_dir)
    rc = main(["--input", in_dir, "--out", str(tmp_path / "out"), "--run-id", "cli1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_staged"] == 1_000
    assert len(summary["sinks_committed"]) == 4

    # resume through the CLI: nothing re-staged
    rc = main(["--input", in_dir, "--out", str(tmp_path / "out"), "--run-id", "cli1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_staged"] == 0
    assert summary["sinks_skipped"] == sorted(summary["sinks_skipped"])


def test_run_cli_gen(spark, tmp_path, capsys):
    rc = main(["--gen", "500", "--out", str(tmp_path / "out2")])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_staged"] == 500
