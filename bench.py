"""Headline benchmark. Prints ONE JSON line:

    {"metric": "e2e_pipeline_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "rows": N, "sequences_per_sec": X}

Input: deterministic sequences table sized by SF (synthesized once into
``bench_data/`` next to this file, re-used across runs so every run times
the same on-disk files), plus the driver's parquet tables at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) for the operator
queries. Runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from logstash_forwarder_spark.datagen import gen_sequences, gen_source_dim  # noqa: E402
from logstash_forwarder_spark.pipeline import PipelineSpec, run_pipeline  # noqa: E402
from logstash_forwarder_spark.session import get_spark  # noqa: E402

# rows per scale factor for the synthesized sequences table (~256 tokens/row
# → sf0.1 ≈ 2M rows ≈ 512M tokens ≈ 1 GiB on disk)
ROWS_PER_SF = 20_000_000

BENCH_QUERIES = [
    "parse_extract",
    "enrich_agg",
    "sink_source_counts",
    "pricing_agg",
    "events_hourly",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "similarity_topk",
    "text_quality",
    "pack_sequences",
    "chunk_overlap",
    "corpus_clean",
    "tfidf_topk",
    "token_quantiles",
    "mixture_weights",
    "span_dedup",
    "revenue_topk",
    "rate_anomaly",
    "curation_ledger",
    # round 4 additions
    "span_cut",
    "regional_revenue",
    "cohort_retention",
    "token_budget_cap",
    # round 5 additions
    "heavy_hitters",
    "similarity_pq",
    "grok_combined",
    "mutate_chain",
    "bloom_decontaminate",
    "cms_counts",
    "hll_shingles",
    "meter_rates",
    "aggregate_correlate",
    "incremental_dedup",
    "lm_score",
    "bpe_encode",
    # round 6 additions
    "curriculum_buckets",
    "source_novelty",
    "perplexity_tiers",
    # round 7 additions
    "gopher_quality",
    "freq_spectrum",
    "centroid_outliers",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_input(spark, sf: float) -> str:
    n_rows = max(int(ROWS_PER_SF * sf), 10_000)
    path = os.path.join(REPO, "bench_data", f"seqs_{n_rows}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        parts = max(int(spark.sparkContext.defaultParallelism) * 4, 32)
        gen_sequences(spark, n_rows, num_partitions=parts).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _scaling_result() -> dict | None:
    """Measured N->4N scaling evidence (BENCH/scaling.py protocol), if
    present — see BENCH/BASELINE.md for the full curve and methodology."""
    p = os.path.join(REPO, "BENCH", "scaling_result.json")
    try:
        with open(p) as fh:
            return json.load(fh)
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    spark = get_spark(
        app_name="lfs-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    in_path = ensure_input(spark, sf)
    seqs = spark.read.parquet(in_path)
    n_rows = seqs.count()
    dim = gen_source_dim(spark)

    out_dir = f"/tmp/lfs_bench_{uuid.uuid4().hex[:8]}"
    # warm-up: touch EVERY python worker (numpy/pandas import + page-faults
    # cost ~4s per worker on first batch) and every pipeline codepath
    from logstash_forwarder_spark.operators.parse import parse_stage

    warm = gen_sequences(spark, 64_000, num_partitions=cpus * 2)
    parse_stage(warm).write.format("noop").mode("overwrite").save()
    run_pipeline(
        spark,
        warm,
        dim,
        PipelineSpec(out_dir=out_dir, run_id="warmup"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    from logstash_forwarder_spark.benchutil import best, timed_trials

    def one_trial():
        run_pipeline(
            spark, seqs, dim, PipelineSpec(out_dir=out_dir, run_id=uuid.uuid4().hex[:8])
        )
        shutil.rmtree(out_dir, ignore_errors=True)

    # Retry-until-quiet AND until-consensus: steal-gated samples are
    # discarded, and sampling continues until the two fastest quiet trials
    # agree within 20% (round 2 proved low steal alone is not enough: two
    # "quiet" trials came in 2.2× apart). Steal storms can outlast a whole
    # 6-attempt block (round 4: every attempt gated, twice in a row), so
    # the block itself retries — up to $SPARK_GRAFT_E2E_BLOCKS blocks with
    # a short pause between, certifying on the ACCUMULATED quiet samples.
    # Min of the consensus pair is the reported number; every trial is
    # published for transparency.
    from logstash_forwarder_spark.benchutil import consensus_over

    blocks = int(os.environ.get("SPARK_GRAFT_E2E_BLOCKS", "6"))
    trials: list[dict] = []
    for blk in range(blocks):
        block = timed_trials(one_trial, n_trials=2, agree=0.20, max_attempts=6)
        for t in block:
            t.pop("consensus", None)  # the accumulated predicate decides
        trials.extend(block)
        if consensus_over(trials, n_trials=2, agree=0.20):
            break
        if blk + 1 < blocks:
            print(
                f"# e2e block {blk + 1}/{blocks} uncertified "
                f"({len(trials)} trials so far) — pausing for the storm",
                file=sys.stderr,
            )
            time.sleep(10)
    e2e = best(trials)["sec"]
    e2e_consensus = consensus_over(trials, n_trials=2, agree=0.20)
    if not e2e_consensus:
        print(
            "# WARNING: e2e retries exhausted "
            f"({len(trials)} trials, {blocks} blocks) without consensus — "
            "the headline is a noisy minimum, not a certified figure",
            file=sys.stderr,
        )

    from logstash_forwarder_spark.queries import registry

    reg = registry()
    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in reg:
            continue
        fn, _ = reg[name]
        try:
            # Consensus sampling (same rationale as the e2e headline):
            # sample until the two fastest agree within 25%, cap 4.
            # Construction happens INSIDE the timed window: queries that do
            # eager work at build time (e.g. simhash's localCheckpoint of
            # the signature pass) must not get it for free.
            samples: list[float] = []
            while len(samples) < 4:
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.monotonic() - t0)
                top2 = sorted(samples)[:2]
                if len(top2) == 2 and top2[1] <= top2[0] * 1.25:
                    break
            qtimes[name] = round(min(samples), 3)
        except Exception as e:  # keep the bench line intact on one bad query
            qtimes[name] = -1.0
            print(f"# bench query {name} failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "e2e_pipeline_sec",
                "value": round(e2e, 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "rows": n_rows,
                "sequences_per_sec": round(n_rows / e2e),
                "cpus": cpus,
                "trials": trials,
                "e2e_consensus": e2e_consensus,
                "scaling": _scaling_result(),
            }
        )
    )


if __name__ == "__main__":
    main()
