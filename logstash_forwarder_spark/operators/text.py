"""Text-analysis operators for training-data pipelines.

All hot paths are JVM built-ins (whole-stage codegen); nothing here uses
Python UDFs. Each operator has a DuckDB-oracle query in queries.py and a
pytest unit. Shapes: input is any DataFrame with a ``text`` column (the
``documents`` table in testdata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword list for the language-ID heuristic / quality ratios —
# deliberately small and fixed so the oracle SQL can repeat it verbatim
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

# BPE-ish token estimate: runs of word chars, runs of digits, or single
# non-space punctuation — a public, deterministic approximation of subword
# tokenizer pre-splitting (GPT-2 style pre-tokenization regex, simplified).
BPE_SPLIT_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via length arithmetic (exact,
    reproducible in any SQL engine — no regex dialect dependence)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def token_count_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate + char count."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    bpe_tokens = F.size(F.regexp_extract_all(t, F.lit(BPE_SPLIT_REGEX), F.lit(0)))
    return (
        df.withColumn("n_chars_calc", F.length(t).cast("long"))
        .withColumn("n_ws_tokens", ws_tokens.cast("long"))
        .withColumn("n_bpe_tokens", bpe_tokens.cast("long"))
    )


def quality_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals: length, punctuation count, stopword hits, mean word
    length ×100 (integer — float-free so the oracle compares exactly)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_words = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).cast(
        "long"
    )
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("long")
    stop_hits: Column = F.lit(0).cast("long")
    for w in EN_STOPWORDS:
        stop_hits = stop_hits + _count_occurrences(
            F.concat(F.lit(" "), t, F.lit(" ")), f" {w} "
        )
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("n_punct", n_punct)
        .withColumn("stop_hits", stop_hits)
        .withColumn(
            "mean_word_len_x100",
            # explicit floor: Spark cast(double→long) truncates while other
            # engines round — floor is the portable integer semantics
            F.when(n_words > 0, F.floor((n_chars - (n_words - 1)) * 100 / n_words))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def lang_id_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic. With the fixed EN list: 'en' if
    ≥2 distinct stopword hits, else 'unk'. (Real multi-language n-gram
    profiles would extend the same shape: one score column per language,
    greatest() to pick.)"""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    distinct_hits: Column = F.lit(0)
    for w in EN_STOPWORDS:
        distinct_hits = distinct_hits + F.when(
            t.contains(f" {w} "), F.lit(1)
        ).otherwise(F.lit(0))
    return df.withColumn(
        "lang_pred",
        F.when(distinct_hits >= 2, F.lit("en")).otherwise(F.lit("unk")),
    )


def fingerprint_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the canonical exact-dedup key), plus a 64-bit rolling-style hash."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_hash64", F.xxhash64(norm)
    )


def redact_stage(
    df: DataFrame,
    col: str,
    pattern: str = r"[0-9]+",
    replacement: str = "<NUM>",
) -> DataFrame:
    """PII/sensitive-token scrubbing: replace every match of ``pattern``
    with ``replacement`` and count how many spans were redacted.

    Training-data pipelines scrub identifiers (digit runs, IPs, emails)
    from payloads before the corpus ships; the forwarder's analog is the
    per-event field rewrite it applies before emitting to the wire
    (publisher1.go:92-118 serializes the rewritten event map).

    Row-local, whole-stage-codegen built-ins only (regexp_replace +
    regexp_extract_all): zero shuffle, scales with the scan. The pattern
    must stay in the POSIX-ish common subset (character classes,
    quantifiers) so Java regex and any oracle engine agree.
    """
    t = F.col(col)
    n = F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))
    return df.withColumn(
        "redacted", F.regexp_replace(t, pattern, replacement)
    ).withColumn("n_redactions", n.cast("long"))


def log_template_stage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_words: int = 6,
) -> DataFrame:
    """Drain-style log template mining, relationally: digit runs collapse
    to ``<n>`` and the first ``prefix_words`` masked words form the
    template key — the classic first-tokens heuristic (log lines of one
    format share their prefix; numbers are the variable part). Output one
    row per template: (template, n_docs, tok_total, example_doc), where
    example_doc is the min id (deterministic).

    The reference ships raw lines and leaves structure to the downstream
    stack; at 100 TB, template grouping is the first question asked of a
    log corpus ("what are these lines?"). ONE hash-agg shuffle keyed by
    template (map-side partials; template cardinality ~ distinct formats,
    not line count). Everything JVM built-ins: mask via regexp_replace,
    prefix via slice + array_join."""
    masked = F.regexp_replace(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))),
        r"[0-9]+",
        "<n>",
    )
    tpl = F.array_join(F.slice(F.split(masked, " "), 1, prefix_words), " ")
    n_tok = F.size(F.split(masked, " ")).cast("long")
    return (
        df.select(F.col(id_col), tpl.alias("template"), n_tok.alias("_nt"))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("tok_total"),
            F.min(id_col).alias("example_doc"),
        )
    )
