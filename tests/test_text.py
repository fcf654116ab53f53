from __future__ import annotations

from logstash_forwarder_spark.operators.text import (
    fingerprint_stage,
    lang_id_stage,
    quality_stage,
    token_count_stage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    df = _docs(
        spark,
        [
            (1, "hello world"),
            (2, "one,two 33 four!"),
            (3, "x"),
        ],
    )
    out = {r.doc_id: r for r in token_count_stage(df).collect()}
    assert out[1].n_ws_tokens == 2
    assert out[1].n_bpe_tokens == 2
    # "one" "," "two" "33" "four" "!" → 6 BPE-ish tokens
    assert out[2].n_bpe_tokens == 6
    assert out[3].n_ws_tokens == 1 and out[3].n_chars_calc == 1


def test_quality_signals(spark):
    df = _docs(spark, [(1, "the cat sat on the mat."), (2, "")])
    out = {r.doc_id: r for r in quality_stage(df).collect()}
    r = out[1]
    assert r.n_words == 6
    assert r.n_punct == 1
    assert r.stop_hits == 2  # 'the' twice
    # chars=23, words=6 → letters=23-5=18 → 18*100/6=300
    assert r.mean_word_len_x100 == 300


def test_lang_id(spark):
    df = _docs(
        spark,
        [
            (1, "the cat is in a box"),  # ≥2 distinct stopwords → en
            (2, "wurst brezel bier"),  # no stopwords → unk
            (3, "the dog"),  # only 1 → unk
        ],
    )
    out = {r.doc_id: r.lang_pred for r in lang_id_stage(df).collect()}
    assert out == {1: "en", 2: "unk", 3: "unk"}


def test_fingerprint_normalization(spark):
    df = _docs(spark, [(1, "Hello   World"), (2, "hello world"), (3, " HELLO  WORLD ")])
    out = fingerprint_stage(df).collect()
    fps = {r.fp_md5 for r in out}
    h64 = {r.fp_hash64 for r in out}
    assert len(fps) == 1 and len(h64) == 1  # all normalize to the same doc


def test_redact_counts_and_output(spark):
    from logstash_forwarder_spark.operators.text import redact_stage

    df = spark.createDataFrame(
        [(1, 'user 4512 from 10.0.0.12 paid 30'), (2, "no digits here"), (3, "")],
        "event_id long, props string",
    )
    out = {r.event_id: r for r in redact_stage(df, "props").collect()}
    assert out[1].redacted == "user <NUM> from <NUM>.<NUM>.<NUM>.<NUM> paid <NUM>"
    assert out[1].n_redactions == 6
    assert out[2].redacted == "no digits here" and out[2].n_redactions == 0
    assert out[3].n_redactions == 0


def test_redact_plan_has_no_shuffle(spark):
    from logstash_forwarder_spark.operators.text import redact_stage

    df = spark.createDataFrame([(1, "x1")], "event_id long, props string")
    plan = redact_stage(df, "props")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
