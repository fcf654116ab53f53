"""Scaling-efficiency evidence for the north rule: the same pipeline, same
on-disk input, at two parallelism levels (local[8] vs local[32] — N and 4N
cores; no real cluster in this sandbox). Writes BENCH/BASELINE.md.

Each measurement is a FRESH spark-submit process (a session can't change its
master), with one warm-up pass inside each process before the timed pass.

Usage:  python BENCH/scaling.py [--rows 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, time, uuid
sys.path.insert(0, {repo!r})
from logstash_forwarder_spark.session import get_spark
from logstash_forwarder_spark.datagen import gen_sequences, gen_source_dim
from logstash_forwarder_spark.operators.parse import parse_stage
from logstash_forwarder_spark.pipeline import PipelineSpec, run_pipeline

cores = int(sys.argv[1]); in_path = sys.argv[2]
spark = get_spark(app_name=f"scale-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
seqs = spark.read.parquet(in_path)
dim = gen_source_dim(spark)
# warm-up: every worker + every codepath
warm = gen_sequences(spark, 64_000, num_partitions=cores * 2)
parse_stage(warm).write.format("noop").mode("overwrite").save()
wdir = f"/tmp/scale_warm_{{uuid.uuid4().hex[:6]}}"
run_pipeline(spark, warm, dim, PipelineSpec(out_dir=wdir, run_id="w"))
shutil.rmtree(wdir, ignore_errors=True)

out = f"/tmp/scale_out_{{uuid.uuid4().hex[:6]}}"
n = seqs.count()
t0 = time.monotonic()
run_pipeline(spark, seqs, dim, PipelineSpec(out_dir=out, run_id="timed"))
el = time.monotonic() - t0
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cores": cores, "rows": n, "sec": round(el, 2),
                   "seq_per_sec": round(n / el)}}))
"""


def run_at(cores: int, in_path: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(RUNNER.format(repo=REPO))
        script = fh.name
    env = dict(os.environ, SPARK_DRIVER_MEMORY="24g")
    out = subprocess.run(
        [sys.executable, script, str(cores), in_path],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    os.unlink(script)
    if out.returncode != 0:
        raise RuntimeError(f"run at {cores} cores failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def ensure_input(rows: int) -> str:
    path = os.path.join(REPO, "bench_data", f"seqs_{rows}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    code = (
        f"import sys; sys.path.insert(0, {REPO!r});"
        "from logstash_forwarder_spark.session import get_spark;"
        "from logstash_forwarder_spark.datagen import gen_sequences;"
        "s = get_spark(master='local[32]', shuffle_partitions=32);"
        f"gen_sequences(s, {rows}, num_partitions=256).write.mode('overwrite').parquet({path!r})"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()

    in_path = ensure_input(args.rows)
    lo = run_at(8, in_path)
    hi = run_at(32, in_path)
    eff = (hi["seq_per_sec"] / lo["seq_per_sec"]) / 4.0
    result = {
        "rows": args.rows,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH baseline — throughput & scaling efficiency

Protocol (BASELINE.md): identical on-disk input ({args.rows:,} sequences,
deterministic seed-42 generation, ~256 tokens/row), full
parse → enrich → route → fan-out-commit → aggregate pipeline, one warm-up
pass then one timed pass, in a fresh process per parallelism level.

| parallelism | wall (s) | sequences/sec |
|---|---|---|
| local[8]  (N)  | {lo["sec"]} | {lo["seq_per_sec"]:,} |
| local[32] (4N) | {hi["sec"]} | {hi["seq_per_sec"]:,} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** — target ≥ 0.8:
**{"PASS" if eff >= 0.8 else "FAIL"}**.

Notes: no real cluster in the sandbox; N→4N cores on one box is the
closest honest analog (shared memory bandwidth makes this a *pessimistic*
proxy for adding executor hosts, which add bandwidth too). The pipeline's
parallelism-sensitive pieces — Arrow-vectorized parse, partitionBy(sink)
staging write, salted aggregates — all scale with input splits; no
driver-side loops touch data.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
