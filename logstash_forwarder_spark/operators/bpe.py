"""Byte-pair-encoding tokenizer — train on a word-frequency table,
apply via a broadcast-merges kernel.

The real tokens-axis operator (the existing ``BPE_SPLIT_REGEX`` in
text.py is a pre-tokenizer ESTIMATE; this is the genuine merge-table
algorithm, Sennrich et al. 2016 — a public method). The two halves have
deliberately different scale shapes:

* **Training** never iterates over the corpus. One distributed hash-agg
  produces the word→count table (map-side combinable; output is
  REALIZED-VOCAB-sized, independent of corpus rows), which is collected
  under an explicit ``max_words`` guard (training on the frequency
  table is how reference BPE trainers work — each merge round touches
  words, not documents). At 100 TB the agg is the only corpus-sized
  work; ``min_count`` keeps the collected table bounded for heavy-tail
  vocabularies, and the guard FAILS LOUDLY rather than silently
  truncating.
* **Encoding** is row-local: ``mapInPandas`` with the merge ranks
  shipped by closure (configuration-sized — thousands of string pairs)
  and a per-task memo keyed by unique word. Log/web corpora repeat
  words heavily, so the memo turns per-word merge loops into dict hits.
  Zero shuffle at any scale; the kernel rides inside the scan's stage.

Apply algorithm: SINGLE-PASS RANK ORDER — walk the merge list once in
learned order; for each merge, fuse all leftmost-first adjacent
occurrences in the current token sequence. For any merge table produced
by BPE training this equals the classic find-lowest-rank-present loop:
merge j = (a, b) requires a and b to exist as tokens when it was
learned, so each constituent is a base character or the product of a
merge with rank < j — once the walk passes rank j, no later merge can
ever create a or b, hence (a, b) can never newly appear. (The
equivalence can fail only for hand-built tables that violate that
topological property; ``train_bpe`` output satisfies it by
construction, and ``validate_merges`` checks it for user tables.)

The same single pass has a portable STRING form — wrap every token in
sentinels (``,tok,``), concatenate, and apply each merge as one global
leftmost ``replace(',a,,b,', ',ab,')`` — which is how the DuckDB oracle
reproduces the kernel bit-for-bit (queries.py ``bpe_encode``), and how
the randomized pytest reference is formulated (an independent
derivation, not a reimplementation of the kernel loop).

Reference analog: the forwarder ships raw lines for downstream
tokenization (README.md positions it feeding logstash/ES analyzers);
this is that analyzer step as a first-class scale-shaped operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# normalization shared by train + encode + oracle: lowercase, ALL
# whitespace to single spaces FIRST (tabs/newlines are word boundaries —
# stripping them as punctuation would fuse adjacent words), then strip
# to [a-z0-9 ], collapse the space runs stripping opens up, trim.
# Deliberately ASCII-closed so the word charset can never collide with
# encoding sentinels and both engines agree char-for-char.
_STRIP_RE = r"[^a-z0-9 ]"
_WS_RE = r"\s+"


def normalize_text(col: Column) -> Column:
    t = F.regexp_replace(F.lower(col), _WS_RE, " ")
    t = F.regexp_replace(t, _STRIP_RE, "")
    return F.trim(F.regexp_replace(t, "  +", " "))


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """word → count over the normalized corpus: ONE hash-agg (map-side
    combinable), output vocab-sized. The training input."""
    words = df.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def train_bpe(
    freq: dict[str, int], n_merges: int, min_count: int = 1
) -> list[tuple[str, str]]:
    """Sennrich training over a word-frequency dict: each round fuses
    the most frequent adjacent token pair everywhere (tie-break:
    lexicographically smallest pair, so training is fully
    deterministic). Touches only the frequency table — never documents
    — and maintains pair counts INCREMENTALLY (a pair→words inverted
    index; each round re-tokenizes only the words containing the chosen
    pair), so a round costs O(affected words), not O(vocab): the shape
    that holds at a realistic million-word table."""
    vocab: dict[str, list[str]] = {
        w: list(w) for w, c in freq.items() if c >= min_count and len(w) >= 2
    }
    counts = {w: freq[w] for w in vocab}
    pairs: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[str]] = {}

    def account(w: str, sign: int) -> None:
        toks, c = vocab[w], counts[w] * sign
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            pairs[p] = pairs.get(p, 0) + c
            if sign > 0:
                where.setdefault(p, set()).add(w)

    for w in vocab:
        account(w, +1)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = {p: n for p, n in pairs.items() if n > 0}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in sorted(where.get(best, ())):
            account(w, -1)
            vocab[w] = _merge_pass(vocab[w], best[0], best[1])
            account(w, +1)
    return merges


def train_bpe_spark(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word-frequency agg → bounded collect → driver-side
    training. ``max_words`` is a loud guard, not a silent cap: raising
    ``min_count`` is the scale lever (heavy-tail words below it carry
    negligible pair mass)."""
    wf = word_frequencies(df, text_col).where(F.col("n") >= min_count)
    rows = wf.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"vocabulary exceeds max_words={max_words}; raise min_count "
            "(training input must stay bounded — refusing to collect "
            "an unbounded table)"
        )
    return train_bpe({r["word"]: r["n"] for r in rows}, n_merges)


def validate_merges(merges: list[tuple[str, str]]) -> None:
    """Reject tables violating the topological property single-pass
    apply relies on (see module docstring): every constituent must be a
    single char or the product of an EARLIER merge."""
    seen: set[str] = set()
    for i, (a, b) in enumerate(merges):
        for side in (a, b):
            if len(side) > 1 and side not in seen:
                raise ValueError(
                    f"merge {i} ({a!r},{b!r}): constituent {side!r} is "
                    "multi-char but not produced by an earlier merge"
                )
        seen.add(a + b)


def _merge_pass(toks: list[str], a: str, b: str) -> list[str]:
    """Fuse all leftmost-first adjacent (a, b) occurrences."""
    out: list[str] = []
    i, n, ab = 0, len(toks), a + b
    while i < n:
        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Single-pass rank-order apply (module docstring proves equality
    with classic greedy for trained tables)."""
    toks = list(word)
    for a, b in merges:
        if len(toks) < 2:
            break
        if a + b not in word:  # tokens always concatenate back to word
            continue
        toks = _merge_pass(toks, a, b)
    return toks


_ENCODED_SCHEMA = (
    "doc_id long, n_words long, n_tokens long, tokens array<string>"
)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Tokenize every document with a fixed merge table. Output: id,
    n_words, n_tokens, tokens — the token stream with a single ``" "``
    token between words (word boundaries stay observable; merges never
    cross them). Row-local mapInPandas, merge table by closure,
    per-task word memo. Zero shuffle.

    ``normalize=True`` applies the ASCII-closed house normalization
    (what the oracle replays); it is a parity choice, not an algorithm
    limit — pass ``normalize=False`` to tokenize pre-normalized text
    with any charset (the trainer, apply loop, and memo are
    charset-agnostic; words are whatever single spaces separate)."""
    validate_merges(merges)
    t = F.col(text_col)
    norm = df.select(
        F.col(id_col).alias("doc_id"),
        (normalize_text(t) if normalize else F.coalesce(t, F.lit(""))).alias("t"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, nt, seqs = [], [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
                words = t.split(" ") if t else []
                toks: list[str] = []
                n_tok = 0
                for j, w in enumerate(words):
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word(w, merges)
                    if j:
                        toks.append(" ")
                    toks.extend(got)
                    n_tok += len(got)
                ids.append(doc_id)
                nw.append(len(words))
                nt.append(n_tok)
                seqs.append(toks)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_tokens": pd.Series(nt, dtype="int64"),
                    "tokens": pd.Series(seqs, dtype="object"),
                }
            )

    return norm.mapInPandas(op, schema=_ENCODED_SCHEMA)
