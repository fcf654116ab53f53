"""Corpus-curation operators for LLM training-data pipelines.

Three ops the reference pipeline's users need once the harvested corpus
feeds model training (reference scope ends at shipping events —
/root/reference/publisher1.go:43 — these extend SURVEY §2's
training-data tier):

* benchmark decontamination — remove training docs that share a word
  n-gram with an eval/benchmark set. The benchmark side is tiny (eval
  suites are MBs even when the corpus is 100 TB), so its distinct
  shingle set is BROADCAST and the corpus is scanned map-side: the only
  shuffle is the per-doc hit count over the (small) set of actual hits.
* repetition stats — Gopher-style quality rule: per-doc duplicate
  n-gram fraction. Entirely row-local, computed inside the scan by the
  same Arrow shingle kernel dedup uses (operators/dedup.py), zero
  shuffle, zero per-row Python.
* vocab coverage — corpus-level word frequencies with cumulative-share
  ranks (the vocab-cutoff / frequency-table op). Distributed hash-agg
  for the counts; the window runs over only the top-k rows.

Shingle identity here is the kernel's 64-bit hash (collision odds are
birthday-bounded ≪ 1e-12 at these cardinalities; see
ngram_jaccard_pairs' docstring for the scale argument).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import DEFAULT_SHINGLE, _distinct_shingle_hashes, _norm, shingle_hash_relation


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(id, n_hits) per corpus doc sharing ≥1 word n-gram with ``benchmark``.

    ``n_hits`` counts the doc's DISTINCT shingles that occur anywhere in
    the benchmark set. The benchmark shingle set is broadcast — the
    corpus-side scan never shuffles; only the hits (a small relation)
    are shuffled for the per-doc count.
    """
    corpus_sh = shingle_hash_relation(corpus, id_col=id_col, text_col=text_col, n=n)
    bench_sh = (
        shingle_hash_relation(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("sh")
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Corpus rows that share NO word n-gram with the benchmark set.

    Anti-join against the contamination report; AQE broadcasts the
    report when it is small (the common case — contamination is rare).
    """
    hits = contamination_report(
        corpus, benchmark, id_col=id_col, text_col=text_col, n=n
    ).select(id_col)
    return corpus.join(hits, id_col, "left_anti")


def repetition_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    max_dup_pct: int = 30,
    seed: int = 42,
) -> DataFrame:
    """Gopher-style repetition rule: per-doc duplicate word-n-gram counts.

    Output: (id, n_words, total_grams, distinct_grams, keep) — all
    BIGINT; ``keep`` = 1 iff the duplicate-gram fraction is ≤
    ``max_dup_pct``/100, integer-exact
    (``(total-distinct)*100 <= max_dup_pct*total``; empty docs keep).

    Row-local: one mapInArrow pass inside the scan (the dedup shingle
    kernel), no shuffle, no per-row Python. The duplicate-fraction rule
    is the word-level analog of the reference's per-line filters
    (/root/reference/harvester.go:76-89 builds per-line events; this
    grades them).
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def op(batches):
        for b in batches:
            seg_rows, _ss, _dh, dcounts, wlens = _distinct_shingle_hashes(
                b, text_col, n, seed
            )
            nrows = b.num_rows
            distinct = np.zeros(nrows, np.int64)
            if len(seg_rows):
                distinct[seg_rows] = dcounts
            total = np.maximum(wlens - (n - 1), 0)
            dup = total - distinct
            keep = (dup * 100 <= max_dup_pct * total).astype(np.int64)
            ids = b.column(b.schema.get_field_index(id_col))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(wlens, pa.int64()),
                    pa.array(total, pa.int64()),
                    pa.array(distinct, pa.int64()),
                    pa.array(keep, pa.int64()),
                ],
                names=[id_col, "n_words", "total_grams", "distinct_grams", "keep"],
            )

    return df.select(id_col, text_col).mapInArrow(
        op,
        schema=(
            f"{id_col} {id_type}, n_words bigint, total_grams bigint, "
            "distinct_grams bigint, keep bigint"
        ),
    )


def vocab_coverage(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Top-k corpus words with rank, count, cumulative count and
    cumulative parts-per-million of ALL word occurrences.

    (rank, word, cnt, cum_cnt, cum_ppm) — the frequency table behind
    vocab-cutoff decisions. Counts are a distributed hash-agg; the
    top-k is a TakeOrdered (no global sort materialization); the rank /
    cumulative window then runs over only k rows. ``cum_ppm`` is
    ``floor(cum / total * 1e6)`` in DOUBLE — the identical IEEE op
    sequence on both engines, chosen over BIGINT fixed point because
    ``cum * 1e6`` overflows past ~9.2e12 total occurrences. Ties break
    on the word itself, deterministically.
    """
    words = df.select(
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word") != "")
    cnt = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = cnt.agg(F.sum("cnt").alias("_total"))
    top = cnt.orderBy(F.desc("cnt"), F.asc("word")).limit(top_k)
    w_rank = W.orderBy(F.desc("cnt"), F.asc("word"))
    w_cum = w_rank.rowsBetween(W.unboundedPreceding, W.currentRow)
    # cum_ppm in DOUBLE with a final floor: the pure-BIGINT form
    # (cum * 1e6 DIV total) overflows — ANSI-aborts — past ~9.2e12 total
    # word occurrences, exactly the corpus scale this operator targets.
    # Both engines run the identical IEEE op sequence (see mixture_weights).
    cum = F.sum("cnt").over(w_cum)
    ppm = F.floor(
        cum.cast("double") / F.col("_total").cast("double") * F.lit(1000000.0)
    )
    return top.crossJoin(F.broadcast(total)).select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        "word",
        F.col("cnt").cast("long").alias("cnt"),
        cum.cast("long").alias("cum_cnt"),
        ppm.cast("long").alias("cum_ppm"),
    )


def gopher_rules(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 80,
    min_mwl_x100: int = 350,
    max_mwl_x100: int = 430,
    min_distinct_stops: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText document-quality rule composite (Rae et
    al. 2021, A1.1), integer-exact and fully row-local: word-count
    bounds, mean-word-length bounds (×100 fixed point, explicit floor —
    the portable integer semantics), and a minimum number of DISTINCT
    stopwords present (the "contains at least 2 of a small stop list"
    rule that kills keyword-stuffed and non-linguistic docs). Per-rule
    flags are emitted alongside the final ``keep`` so curation ledgers
    can attribute drops to rules.

    100-TB shape: every column is computed inside the scan — zero
    shuffles, zero UDFs, whole-stage-codegen throughout; the filter
    composes with any downstream op without a barrier.
    """
    from .text import EN_STOPWORDS

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length(t).cast("long")
    mwl = (
        F.when(n_words > 0, F.floor((n_chars - (n_words - 1)) * 100 / n_words))
        .otherwise(F.lit(0))
        .cast("long")
    )
    distinct_stops = None
    for w in EN_STOPWORDS:
        hit = F.when(F.array_contains(words, w), 1).otherwise(0)
        distinct_stops = hit if distinct_stops is None else distinct_stops + hit
    distinct_stops = distinct_stops.cast("long")
    base = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mwl.alias("mean_word_len_x100"),
        distinct_stops.alias("distinct_stops"),
    )
    r_len = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    r_mwl = (F.col("mean_word_len_x100") >= min_mwl_x100) & (
        F.col("mean_word_len_x100") <= max_mwl_x100
    )
    r_stop = F.col("distinct_stops") >= min_distinct_stops
    return (
        base.withColumn("rule_len", r_len.cast("long"))
        .withColumn("rule_mwl", r_mwl.cast("long"))
        .withColumn("rule_stop", r_stop.cast("long"))
        .withColumn("keep", (r_len & r_mwl & r_stop).cast("long"))
    )


def freq_spectrum(
    df: DataFrame,
    *,
    text_col: str = "text",
    ngram: int = 2,
    max_c: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Type-frequency SPECTRUM (counts-of-counts) over word ``ngram``s:
    for each occurrence count c ≤ ``max_c`` — plus one tail bucket at
    ``max_c + 1`` — how many distinct types occur exactly c times and
    how much token mass they carry. The Zipf diagnostic behind vocab
    sizing, rare-type cutoffs and Good-Turing smoothing; gram grain
    (default bigram) because type spread, not unigram vocab, is what
    the cutoff decisions read.

    Gram identity is the shingle kernel's 64-bit hash, not the string
    (the ngram_jaccard_pairs collision argument: birthday-bounded ≪
    1e-12 at realized-type cardinalities; the spectrum is exact over the
    hashed type universe). The r7 string form built every gram through
    an interpreted ``transform`` lambda — re-evaluating the whole
    normalize+split chain per element — and shuffled gram STRINGS; the
    kernel emits per-batch ``np.unique`` partial counts instead, so the
    first exchange carries (hash, partial-count) rows at distinct-type
    grain (measured 6.0 s → sub-second at sf0.1; VERDICT r7 task 3).

    100-TB shape: one Arrow kernel inside the scan (no interpreted HOF,
    no gram-string explode), then two hash-aggregates, both
    map-side-combinable — the first keyed by gram hash (type-bounded,
    NOT corpus-bounded), the second by the ≤ max_c+1 bucket ids. No
    window, no sort, no collect.
    """
    from .dedup import _shingle_occurrences

    d = df
    if ngram == 1:
        # parity with the string form's gram <> '' filter: the only empty
        # unigram comes from an empty normalized text (the kernel's split
        # of '' yields one empty word; n >= 2 grams are never empty)
        d = d.filter(_norm(F.coalesce(F.col(text_col), F.lit(""))) != "")

    def op(batches):
        for b in batches:
            _rows, _within, sh, _wl = _shingle_occurrences(
                b, text_col, ngram, seed
            )
            if not len(sh):
                continue
            uniq, counts = np.unique(sh, return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(uniq.view(np.int64), pa.int64()),
                    pa.array(counts.astype(np.int64), pa.int64()),
                ],
                names=["sh", "cnt"],
            )

    rel = d.select(text_col).mapInArrow(op, schema="sh bigint, cnt bigint")
    cnt = rel.groupBy("sh").agg(F.sum("cnt").alias("c"))
    bucket = F.when(F.col("c") <= max_c, F.col("c")).otherwise(F.lit(max_c + 1))
    return (
        cnt.groupBy(bucket.cast("long").alias("freq"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("token_mass"),
        )
    )
