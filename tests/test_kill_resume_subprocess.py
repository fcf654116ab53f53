"""Real process-kill resume test (VERDICT r1 #5).

The in-process fault injector (PipelineSpec.fail_after_sinks) raises a
Python exception — it cannot crash INSIDE os.replace or leave a half-written
checkpoint tmp file. This test does what spec/lumberjack_spec.rb:66-91 does
to the reference binary: run the CLI in a subprocess, SIGKILL the whole
process group mid-publish, resume with the same run_id in a fresh process,
and assert exactly-once delivery (no loss, no duplicates, lineage == data).
Verification is pure DuckDB — no Spark session in the test process.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import duckdb

N_ROWS = 30_000
SINKS = ["sink_apache", "sink_default", "sink_dev", "sink_syslog"]


def _cli(out_dir: str, run_id: str) -> list[str]:
    return [
        sys.executable,
        "-m",
        "logstash_forwarder_spark.run",
        "--gen",
        str(N_ROWS),
        "--out",
        out_dir,
        "--run-id",
        run_id,
        "--master",
        "local[2]",
        "--shuffle-partitions",
        "4",
    ]


def test_sigkill_mid_publish_then_resume(tmp_path):
    out = str(tmp_path / "out")
    ckpt_glob = os.path.join(out, "_checkpoint", "*.parquet")
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))}

    proc = subprocess.Popen(
        _cli(out, "killrun"),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # so killpg takes the JVM down too
        env=env,
    )
    # kill mid-staging-write (a seconds-wide window: torn parquet part files
    # and no checkpoint) or, failing that, at the first checkpoint commit;
    # if the run outraces both polls, the resume checks below still must hold
    staging_glob = os.path.join(out, "run_id=killrun", "_staging", "sink=*", "*")
    killed = False
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline and proc.poll() is None:
        if glob.glob(staging_glob) or glob.glob(ckpt_glob):
            os.killpg(proc.pid, signal.SIGKILL)
            killed = True
            break
        time.sleep(0.005)
    proc.wait(timeout=60)
    assert killed or proc.returncode == 0, "run neither progressed nor finished"
    committed_after_kill = len(glob.glob(ckpt_glob))

    # resume with the SAME run_id in a fresh process
    res = subprocess.run(
        _cli(out, "killrun"), capture_output=True, text=True, timeout=300, env=env
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(
        [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert sorted(summary["sinks_committed"] + summary["sinks_skipped"]) == SINKS
    if killed and committed_after_kill < len(SINKS):
        assert summary["sinks_committed"], "resume had work but did none"

    con = duckdb.connect()
    n, n_distinct = con.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM "
        f"read_parquet('{out}/run_id=killrun/sink=*/*.parquet', hive_partitioning=true)"
    ).fetchone()
    # exactly-once: no loss, no duplicates — regardless of where the kill hit
    assert n == N_ROWS and n_distinct == N_ROWS
    lineage = dict(
        con.sql(
            f"SELECT sink, sum(row_count) FROM read_parquet('{out}/_checkpoint/*.parquet') "
            f"WHERE run_id = 'killrun' GROUP BY sink"
        ).fetchall()
    )
    data = dict(
        con.sql(
            f"SELECT sink, count(*) FROM "
            f"read_parquet('{out}/run_id=killrun/sink=*/*.parquet', hive_partitioning=true) "
            f"GROUP BY sink"
        ).fetchall()
    )
    for s in SINKS:
        assert lineage.get(s, 0) == data.get(s, 0), (s, lineage, data)
    # no stale staging dirs survive a completed resume
    assert not os.path.exists(f"{out}/run_id=killrun/_staging")
    assert not os.path.exists(f"{out}/run_id=killrun/_lineage_staging")
