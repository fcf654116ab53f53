"""Quiet-box consensus re-measure of the r6 verdict's two unconfirmed
bench movers (similarity_pq ×1.92, lm_score ×1.46) — VERDICT r6 task 3.

Protocol per CLAUDE.md r6: benchutil.timed_trials(agree=0.2) — keep
sampling until the two fastest steal-quiet samples agree within 20%.
Runs at the bench's standard sf0.1 setup (same warmup, same noop sink).
Prints one JSON line per query."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = sys.argv[1:] or ["similarity_pq", "lm_score"]


def main() -> int:
    from logstash_forwarder_spark.benchutil import best, timed_trials
    from logstash_forwarder_spark.datagen import gen_sequences
    from logstash_forwarder_spark.operators.parse import parse_stage
    from logstash_forwarder_spark.queries import registry
    from logstash_forwarder_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="lfs-remeasure",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # standard bench warmup: touch every python worker
    warm = gen_sequences(spark, 64_000, num_partitions=cpus * 2)
    parse_stage(warm).write.format("noop").mode("overwrite").save()

    reg = registry()
    for name in QUERIES:
        fn, _ = reg[name]

        def run(fn=fn):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # per-query warm pass (plans/caches), not timed
        trials = timed_trials(
            run, n_trials=3, cores_used=cpus, agree=0.2, max_attempts=12
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "sec": best(trials)["sec"],
                    "sf_dir": sf_dir,
                    "cpus": cpus,
                    "trials": trials,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
