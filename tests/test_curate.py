"""Curation operator tests: planted contamination must be caught, clean
docs must survive, repetition stats must agree with a naive per-row Python
reference, vocab coverage must be exact on a hand-countable corpus."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from logstash_forwarder_spark.operators.curate import (
    contamination_report,
    decontaminate,
    repetition_stats,
    vocab_coverage,
)

BENCH_SENTENCE = "the capital of france is paris as everyone knows"
CLEAN = "spark shuffles partition data across executors by key"


def _corpus(spark):
    rows = [
        # doc 1 embeds a full benchmark 3-gram ("capital of france" …)
        (1, f"my essay says {BENCH_SENTENCE} and more"),
        (2, CLEAN),
        (3, "another unrelated document about parquet row groups"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, BENCH_SENTENCE)], "doc_id long, text string"
    )


def test_contamination_flags_planted_overlap(spark):
    got = {
        r.doc_id: r.n_hits
        for r in contamination_report(_corpus(spark), _benchmark(spark)).collect()
    }
    assert set(got) == {1}
    # doc 1 contains the benchmark sentence verbatim: every one of its
    # 7 3-grams appears in doc 1's shingle set
    assert got[1] == 7


def test_decontaminate_removes_only_hits(spark):
    kept = sorted(
        r.doc_id for r in decontaminate(_corpus(spark), _benchmark(spark)).collect()
    )
    assert kept == [2, 3]


def _naive_rep(text: str, n: int = 3):
    words = " ".join(text.lower().split()).split(" ")
    grams = [" ".join(words[i : i + n]) for i in range(max(len(words) - n + 1, 0))]
    return len(words), len(grams), len(set(grams))


def test_repetition_stats_match_naive(spark):
    rows = [
        (1, "a b c a b c a b c a b c"),  # heavy repetition
        (2, "all distinct words here make every gram unique"),
        (3, "x y"),  # too short for a 3-gram
        (4, ""),  # empty
        (5, "  spaced   out\ttext  with   gaps "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df, max_dup_pct=30).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        n_words, total, distinct = _naive_rep(text)
        r = got[doc_id]
        assert (r.n_words, r.total_grams, r.distinct_grams) == (
            n_words,
            total,
            distinct,
        ), f"doc {doc_id}"
        dup = total - distinct
        assert r.keep == (1 if dup * 100 <= 30 * total else 0)
    # the planted repeater fails the rule; the distinct doc passes
    assert got[1].keep == 0 and got[2].keep == 1


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abc ", min_size=0, max_size=12),
            min_size=0,
            max_size=6,
        ).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=8,
    )
)
def test_kernel_gram_stats_match_naive(texts):
    """Pure-kernel property check (no Spark): per-row word counts and
    distinct-gram counts from _distinct_shingle_hashes agree with a naive
    Python reference on arbitrary whitespace-mangled text."""
    import pyarrow as pa

    from logstash_forwarder_spark.operators.dedup import _distinct_shingle_hashes

    batch = pa.RecordBatch.from_arrays([pa.array(texts, pa.string())], ["text"])
    seg_rows, _ss, _dh, dcounts, wlens = _distinct_shingle_hashes(batch, "text", 3, 7)
    distinct = {int(r): int(c) for r, c in zip(seg_rows, dcounts)}
    for i, text in enumerate(texts):
        n_words, _total, n_distinct = _naive_rep(text)
        assert int(wlens[i]) == n_words, f"row {i}: {text!r}"
        assert distinct.get(i, 0) == n_distinct, f"row {i}: {text!r}"


def test_repetition_plan_is_single_kernel_pass(spark):
    """Row-local op: the physical plan must be scan -> ONE MapInArrow,
    with no Exchange and no aggregate anywhere."""
    df = repetition_stats(_corpus(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInArrow") == 1
    assert "HashAggregate" not in plan


def test_contamination_joins_broadcast_side(spark):
    """The benchmark shingle set must sit on the build side of a
    BroadcastHashJoin — the corpus side must reach the join without an
    Exchange (only the post-join per-doc count shuffles)."""
    df = contamination_report(_corpus(spark), _benchmark(spark))
    df.collect()  # materialize so AQE finalizes the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_vocab_coverage_exact(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], "doc_id long, text string"
    )
    got = vocab_coverage(df, top_k=3).collect()
    # counts: a=3, b=3, c=1, d=1 → rank on (cnt desc, word): a, b, c
    assert [(r.rank, r.word, r.cnt, r.cum_cnt) for r in got] == [
        (1, "a", 3, 3),
        (2, "b", 3, 6),
        (3, "c", 1, 7),
    ]
    # 8 total occurrences → integer ppm floors
    assert [r.cum_ppm for r in got] == [375000, 750000, 875000]


def test_curation_ledger_planted_flags(spark, tmp_path):
    """Every ledger rule fires on a planted corpus: bench membership,
    dup loser, contamination, repetition, shortness, and a clean keeper."""
    from logstash_forwarder_spark.queries import q_curation_ledger

    clean = " ".join(f"w{i}" for i in range(20))
    dup_text = " ".join(f"d{i}" for i in range(25))
    rows = [
        (97, "alpha beta gamma delta " + " ".join(f"b{i}" for i in range(16)), "en", "s", 1),  # bench
        (1, "alpha beta gamma " + " ".join(f"c{i}" for i in range(16)), "en", "s", 1),  # contaminated
        (2, dup_text, "en", "s", 1),   # keeper
        (3, dup_text, "en", "s", 1),   # dup loser
        (4, "x y " * 20, "en", "s", 1),  # repetitive (one distinct 3-gram pattern)
        (5, "one two three", "en", "s", 1),  # short
        (6, clean, "en", "s", 1),      # clean keeper
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in q_curation_ledger(spark, sf).collect()}
    assert out[97].f_bench == 1 and out[97].keep == 0
    assert out[1].f_contam == 1 and out[1].keep == 0
    assert out[2].f_dup == 0
    assert out[3].f_dup == 1 and out[3].keep == 0
    assert out[4].f_rep == 1 and out[4].keep == 0
    assert out[5].f_short == 1 and out[5].keep == 0
    assert out[6] == (6, 0, 0, 0, 0, 0, 1)


def test_curation_ledger_materialized_single_kernel_pass(spark):
    """materialize=True removes the shingle kernel from the query plan
    entirely (it ran once at localCheckpoint time; branches read the
    checkpointed RDD); lazily the kernel reappears per DAG branch."""
    from logstash_forwarder_spark.queries import q_curation_ledger

    sf = "/root/testdata/sf0.001"
    lazy = q_curation_ledger(spark, sf)
    mat = q_curation_ledger(spark, sf, materialize=True)
    rows = mat.collect()

    def shingle_kernels(df):
        # the shingle kernel is the MapInArrow whose output is [..., sh#..];
        # signature-based counting is immune to AQE printing each subtree's
        # plan twice (Final + Initial sections)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return [
            l for l in plan.splitlines() if "MapInArrow" in l and " sh#" in l
        ]

    assert shingle_kernels(mat) == []  # ran once at checkpoint time, gone from the plan
    lazy.collect()
    assert len(shingle_kernels(lazy)) > 0  # lazy recomputes it per DAG branch
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, rows))

    # auto heuristic: tiny fixture (500 docs) stays lazy by default;
    # sf0.1 (5000 docs) auto-materializes without the caller opting in
    auto_small = q_curation_ledger(spark, sf)
    auto_small.collect()
    assert len(shingle_kernels(auto_small)) > 0
    auto_big = q_curation_ledger(spark, "/root/testdata/sf0.1")
    auto_big.collect()
    assert shingle_kernels(auto_big) == []


def test_gopher_rules_hand_corpus(spark):
    """Hand-checkable rules: word-count bounds, mean-word-length ×100
    bounds, distinct-stopword floor — per-rule flags + final keep."""
    from logstash_forwarder_spark.operators.curate import gopher_rules

    rows = [
        # 5 words, mwl = (22-4)*100/5 = 360, stops {the, a} = 2
        (1, "the a zebra walks home"),
        # 3 words, no stops
        (2, "spark shuffles data"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in gopher_rules(
            df, min_words=4, max_words=10, min_mwl_x100=300,
            max_mwl_x100=400, min_distinct_stops=2,
        ).collect()
    }
    assert got[1]["n_words"] == 5
    assert got[1]["mean_word_len_x100"] == 360
    assert got[1]["distinct_stops"] == 2
    assert (got[1]["rule_len"], got[1]["rule_mwl"], got[1]["rule_stop"]) == (1, 1, 1)
    assert got[1]["keep"] == 1
    assert got[2]["rule_len"] == 0  # 3 < min_words
    assert got[2]["distinct_stops"] == 0 and got[2]["rule_stop"] == 0
    assert got[2]["keep"] == 0


def test_gopher_rules_plan_is_shuffle_free(spark):
    """Row-local composite: scan → project only; no Exchange, no
    aggregate, no UDF stage anywhere in the physical plan."""
    from logstash_forwarder_spark.operators.curate import gopher_rules

    df = gopher_rules(_corpus(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "HashAggregate", "MapInArrow", "ArrowEvalPython"):
        assert node not in plan, node


def test_freq_spectrum_hand_corpus(spark):
    """Bigram counts-of-counts on a hand-countable corpus, tail bucket
    included."""
    from logstash_forwarder_spark.operators.curate import freq_spectrum

    rows = [
        (1, "x y x y"),   # bigrams: "x y"(×2 here: pos0, pos2), "y x"(×1)
        (2, "x y"),       # "x y" again → "x y" total 3
        (3, "z"),         # 1 word → no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.freq: (r.n_types, r.token_mass)
        for r in freq_spectrum(df, ngram=2, max_c=2).collect()
    }
    # "y x" occurs once; "x y" occurs 3 times → tail bucket (max_c+1 = 3)
    assert got[1] == (1, 1)
    assert got[3] == (1, 3)
    assert 2 not in got


def test_freq_spectrum_two_bounded_aggregates(spark):
    """Plan shape (r8 kernel form): grams come from ONE MapInArrow
    kernel inside the scan — never an interpreted transform/explode of
    gram strings — then two aggregate pairs; no window, no sort."""
    from logstash_forwarder_spark.operators.curate import freq_spectrum

    df = freq_spectrum(_corpus(spark))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # substring PRESENCE only: AQE prints final+initial plans, so raw
    # counts over the string are unreliable (CLAUDE.md round-2 gotcha)
    assert "Window" not in plan and "Sort" not in plan
    assert "MapInArrow" in plan
    assert "Generate" not in plan and "ArrowEvalPython" not in plan
