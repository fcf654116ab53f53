"""Bigram language-model quality scoring (CCNet/Gopher-style curation).

The standard web-corpus curation signal: train an n-gram LM on the corpus
and score each document by how well the model predicts it — fluent text
scores high, boilerplate/garbage scores low. CCNet uses a 5-gram KenLM;
the relational core is identical at order 2 and stays fully inside
Catalyst:

  1. ``bigram_relation`` — tokenize + zip adjacent words ROW-LOCALLY
     (``slice``/``arrays_zip``/``explode``: one codegen'd Project +
     Generate, no join, no interpreted HOF fold) into (doc_id, w1, w2).
  2. model = two hash-aggregates over that relation: c(w1) and c(w1,w2).
     Map-side partial aggregation; output is REALIZED-VOCAB-sized
     (bounded for log/telemetry corpora), independent of corpus rows.
  3. score = bigrams ⋈ model on (w1,w2) — a bounded-key equi-join; AQE
     broadcasts the model side whenever the vocab fits (it does at every
     test SF), and its skew-join split handles the hot-word ("the")
     partitions when it does not. One per-doc hash-agg finishes.

At 10^12 sequences the only data-sized exchanges are the two model
aggregates and the per-doc agg — all on keys with map-side combine; the
model relation itself never scales with corpus size, only with vocab.

Scores come in two forms:

* ``lm_logprob`` — sum of ln p(w2|w1) (MLE), the production curation
  score. DOUBLE: transcendental, so never oracle-compared.
* ``cond_ppm_sum`` / ``mean_cond_ppm`` — sum/mean of conditional
  probabilities in parts-per-million, computed with INTEGER division
  only (``(cb * 1e6) div cw``): bit-exact on any engine, the
  oracle-compared witness of the same model counts.

Documents with fewer than two tokens have no bigrams and are dropped
(documented; the gate corpus has none).

Reference analog: the forwarder ships raw lines and leaves triage to the
downstream pipeline (README.md "forward logs to logstash"); this is that
downstream quality gate, re-expressed as first-class relational ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize_words(text_col: str = "text") -> F.Column:
    """Whitespace word array of lower(text), normalized so no empty
    tokens survive: collapse all whitespace runs to single spaces, trim,
    split on the single space. The exact same normalization DuckDB
    reproduces with string_split(trim(regexp_replace(...)))."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return F.split(norm, " ")


def bigram_relation(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent word pair, built row-locally:
    zip ws[1..n-1] with ws[2..n] (1-based ``slice``) and explode. No
    self-join on position (that would be a doc-keyed exchange), no HOF
    fold (interpreted, ~10x a codegen'd Project on this box)."""
    d = df.select(F.col(id_col), tokenize_words(text_col).alias("ws")).where(
        F.size("ws") >= 2
    )
    pairs = d.select(
        id_col,
        F.arrays_zip(
            F.slice("ws", F.lit(1), F.size("ws") - 1).alias("w1"),
            F.slice("ws", F.lit(2), F.size("ws") - 1).alias("w2"),
        ).alias("pairs"),
    )
    bg = pairs.select(id_col, F.explode("pairs").alias("p"))
    return bg.select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_model(bg: DataFrame) -> DataFrame:
    """MLE bigram model from a (id, w1, w2) relation: one row per
    realized bigram with its count ``cb`` and its left-context count
    ``cw`` (= sum of cb over w2, i.e. p(w2|w1) = cb/cw). ``cw`` is
    DERIVED from the cb aggregate (sum of cb over w2 ≡ count of bigrams
    per w1 by definition), so the corpus-sized bigram relation is
    aggregated ONCE — the r7 form aggregated it twice, and Spark
    recomputes the explode per DAG branch (no CSE across branches), so
    that was a whole extra corpus pass (r8 plan audit: three Generate
    subtrees in lm_score, now two). One corpus hash-agg + one
    vocab-sized hash-agg + one vocab-sized join — never touches
    document ids."""
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cw = cb.groupBy("w1").agg(F.sum("cb").alias("cw"))
    return cb.join(cw, "w1")


def lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram-LM quality scores (see module docstring).

    Output: id, n_bigrams, cond_ppm_sum, mean_cond_ppm (all BIGINT,
    engine-portable) + lm_logprob (DOUBLE, production score)."""
    bg = bigram_relation(df, text_col=text_col, id_col=id_col)
    scored = bg.join(bigram_model(bg), ["w1", "w2"])
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.expr("(cb * 1000000) div cw")).cast("long").alias("cond_ppm_sum"),
        F.sum(F.log(F.col("cb") / F.col("cw"))).alias("lm_logprob"),
    )
    return agg.withColumn(
        "mean_cond_ppm", F.expr("cond_ppm_sum div n_bigrams").cast("long")
    )
