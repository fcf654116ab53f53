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


def test_run_cli_text_glob(spark, tmp_path, capsys):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "app.log").write_bytes(b"alpha beta\ngamma\n")
    (logs / "db.log").write_bytes(b"delta epsilon zeta\npartial")  # no newline

    rc = main(
        ["--text-glob", f"{logs}/*.log", "--out", str(tmp_path / "out3"), "--run-id", "t1"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 3 complete lines; the unterminated "partial" is held back (reference
    # semantics: a line ships only once its newline arrives)
    assert summary["rows_staged"] == 3
    assert len(summary["sinks_committed"]) == 4

    # resume: identical rerun stages nothing
    rc = main(
        ["--text-glob", f"{logs}/*.log", "--out", str(tmp_path / "out3"), "--run-id", "t1"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_staged"] == 0
