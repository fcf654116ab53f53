"""Side benchmarks for the optimization rounds (bench.py is FROZEN for
driver measurement — this file holds everything else the optimization
guide §1 asks for):

* per-query noop-sink isolation with the steal-gated consensus protocol
  (benchutil.timed_trials) over any subset of registry queries;
* `.explain("formatted")` capture into plans/<tag>/<query>_<suffix>.txt
  so plan-shape claims in OPTIMIZATION_r*.md are artifact-backed;
* optional e2e stage split of the pipeline (parse / stage-write /
  lineage / metrics) for the headline decomposition.

Usage:
    python bench_extra.py q1 q2 ...            # time named queries
    python bench_extra.py --all                # the full headline vector
    python bench_extra.py --plans plans/r08 --suffix before q1 q2
    python bench_extra.py --e2e                # stage-split the pipeline
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from logstash_forwarder_spark.benchutil import best, timed_trials  # noqa: E402
from logstash_forwarder_spark.session import get_spark  # noqa: E402

# the r7 bench vector + the queries VERDICT r7 flagged as missing from it
EXTRA_QUERIES = ["winnow_fingerprints", "winnow_near_dup", "part_type_share"]


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        get_spark(
            app_name="lfs-bench-extra",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        ),
        cpus,
    )


def _warm(spark, cpus):
    from logstash_forwarder_spark.datagen import gen_sequences
    from logstash_forwarder_spark.operators.parse import parse_stage

    warm = gen_sequences(spark, 64_000, num_partitions=cpus * 2)
    parse_stage(warm).write.format("noop").mode("overwrite").save()


def time_queries(
    spark, cpus, names, sf_dir, plans_dir=None, suffix="now", plans_only=False
):
    from logstash_forwarder_spark.queries import registry

    reg = registry()
    out = {}
    for name in names:
        if name not in reg:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        fn, _ = reg[name]
        if plans_dir:
            import io
            from contextlib import redirect_stdout

            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"# plan written: {name}_{suffix}.txt", file=sys.stderr)
        if plans_only:
            continue

        def one():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)

        trials = timed_trials(
            one, n_trials=2, agree=0.25, max_attempts=6, cores_used=cpus
        )
        out[name] = {
            "sec": best(trials)["sec"],
            "trials": [t["sec"] for t in trials],
            "gated": sum(1 for t in trials if t.get("gated")),
        }
        print(f"# {name}: {out[name]['sec']} {out[name]['trials']}", file=sys.stderr)
    return out


def e2e_stages(spark, cpus, sf_dir):
    """Stage-split of the headline pipeline: time each phase with its own
    noop/real sink so the 8-9 s e2e decomposes into attributable parts."""
    import shutil
    import uuid

    from logstash_forwarder_spark.datagen import gen_sequences, gen_source_dim
    from logstash_forwarder_spark.pipeline import PipelineSpec, build_plan, run_pipeline

    sf = 0.1
    n_rows = max(int(20_000_000 * sf), 10_000)
    path = os.path.join(REPO, "bench_data", f"seqs_{n_rows}")
    seqs = spark.read.parquet(path)
    dim = gen_source_dim(spark)
    out = {}

    def t(label, fn):
        trials = timed_trials(fn, n_trials=2, agree=0.25, max_attempts=6, cores_used=cpus)
        out[label] = {"sec": best(trials)["sec"], "trials": [x["sec"] for x in trials]}
        print(f"# {label}: {out[label]}", file=sys.stderr)

    spec = PipelineSpec(out_dir="/tmp/_bx_unused", run_id="bx")
    routed = build_plan(seqs, dim, spec)
    t("scan_only", lambda: seqs.write.format("noop").mode("overwrite").save())
    from logstash_forwarder_spark.operators.parse import parse_stage

    t("parse_noop", lambda: parse_stage(seqs).write.format("noop").mode("overwrite").save())
    t("routed_noop", lambda: routed.write.format("noop").mode("overwrite").save())

    def staged_write():
        d = f"/tmp/lfs_bx_{uuid.uuid4().hex[:8]}"
        routed.write.partitionBy("sink").parquet(d)
        shutil.rmtree(d, ignore_errors=True)

    t("staging_write", staged_write)

    def full():
        d = f"/tmp/lfs_bx_{uuid.uuid4().hex[:8]}"
        run_pipeline(spark, seqs, dim, PipelineSpec(out_dir=d, run_id=uuid.uuid4().hex[:8]))
        shutil.rmtree(d, ignore_errors=True)

    t("full_pipeline", full)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="now")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, cpus = _spark()
    if not args.no_warm:
        _warm(spark, cpus)

    result = {}
    if args.e2e:
        result["e2e_stages"] = e2e_stages(spark, cpus, sf_dir)
    names = list(args.queries)
    if args.all:
        from bench import BENCH_QUERIES

        names = BENCH_QUERIES + EXTRA_QUERIES
    if names:
        result["queries"] = time_queries(
            spark,
            cpus,
            names,
            sf_dir,
            plans_dir=args.plans,
            suffix=args.suffix,
            plans_only=args.plans_only,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
