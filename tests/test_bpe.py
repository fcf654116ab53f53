"""BPE train/apply (operators/bpe.py)."""

from __future__ import annotations

import random
import re

import pytest

from logstash_forwarder_spark.operators.bpe import (
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_spark,
    validate_merges,
    word_frequencies,
)


def _replace_reference(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent formulation: sentinel-wrapped chars + one global
    leftmost string replace per merge (the oracle's algorithm)."""
    if not word:
        return []
    s = "".join("," + c + "," for c in word)
    for a, b in merges:
        s = s.replace(f",{a},,{b},", f",{a}{b},")
    return s.strip(",").split(",,")


def _normalize(text: str) -> str:
    t = re.sub(r"\s+", " ", text.lower())
    return re.sub(r"  +", " ", re.sub(r"[^a-z0-9 ]", "", t)).strip()


def test_train_hand_case_deterministic():
    # "low" x5, "lower" x2: first merge is (l,o) count 7, then (lo,w) 7,
    # then ties fall to the lexicographically smallest pair.
    freq = {"low": 5, "lower": 2}
    merges = train_bpe(freq, 4)
    assert merges[:2] == [("l", "o"), ("lo", "w")]
    assert merges == train_bpe(dict(reversed(list(freq.items()))), 4)
    validate_merges(merges)
    assert encode_word("low", merges) == ["low"]
    assert encode_word("lowest", merges)[:1] == ["low"]


def test_encode_word_leftmost_and_consecutive():
    merges = [("a", "a"), ("a", "b")]
    # overlap: leftmost-first pairing
    assert encode_word("aaa", merges) == ["aa", "a"]
    # consecutive non-overlapping occurrences all merge in one pass
    assert encode_word("abab", [("a", "b")]) == ["ab", "ab"]
    # merges never apply across what an earlier merge consumed
    assert encode_word("aab", merges) == ["aa", "b"]


def test_encode_word_matches_replace_reference_randomized():
    rng = random.Random(20260818)
    alphabet = "abc01"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(300)
    }
    freq = {w: rng.randint(1, 9) for w in words if w}
    merges = train_bpe(freq, 40)
    validate_merges(merges)
    for w in freq:
        got = encode_word(w, merges)
        assert got == _replace_reference(w, merges), (w, got)
        assert "".join(got) == w  # tokens always concatenate back


def test_validate_merges_rejects_untrained_order():
    # (x, yz) before (y, z): 'yz' never produced by an earlier merge
    with pytest.raises(ValueError, match="not produced by an earlier"):
        validate_merges([("x", "yz"), ("y", "z")])
    validate_merges([("y", "z"), ("x", "yz")])


def test_word_frequencies_and_train_guard(spark):
    df = spark.createDataFrame(
        [(1, "Low low LOWER!"), (2, "low newest"), (3, "")],
        "doc_id long, text string",
    )
    wf = {r.word: r.n for r in word_frequencies(df).collect()}
    assert wf == {"low": 3, "lower": 1, "newest": 1}
    with pytest.raises(ValueError, match="max_words"):
        train_bpe_spark(df, 4, max_words=2)
    merges = train_bpe_spark(df, 3, min_count=1)
    assert merges[0] == ("l", "o")


def test_bpe_encode_kernel_vs_reference(spark):
    rng = random.Random(7)
    vocab = ["join", "hash", "batch", "scan", "low", "lower", "a1b2"]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
        for i in range(60)
    }
    texts[60] = "  Mixed CASE, punct!! join\thash  "
    texts[61] = "!!!"  # normalizes to empty
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    merges = train_bpe_spark(df, 24, min_count=1)
    got = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    assert set(got) == set(texts)
    for i, text in texts.items():
        t = _normalize(text)
        words = t.split(" ") if t else []
        want_tokens: list[str] = []
        for j, w in enumerate(words):
            if j:
                want_tokens.append(" ")
            want_tokens.extend(_replace_reference(w, merges))
        r = got[i]
        assert r.n_words == len(words), i
        assert list(r.tokens) == want_tokens, i
        assert r.n_tokens == sum(1 for x in want_tokens if x != " "), i
    assert got[61].n_words == 0 and got[61].n_tokens == 0
    assert list(got[61].tokens) == []


def test_bpe_encode_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(i, "join hash") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        bpe_encode(df, [("j", "o")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_normalization_keeps_whitespace_as_boundaries(spark):
    # tabs/newlines are word BOUNDARIES, not punctuation to strip —
    # "join\thash" must stay two words (self-review catch, r5)
    df = spark.createDataFrame(
        [(1, "join\thash\nscan")], "doc_id long, text string"
    )
    wf = {r.word: r.n for r in word_frequencies(df).collect()}
    assert wf == {"join": 1, "hash": 1, "scan": 1}


def test_encode_word_hypothesis_roundtrip():
    """Arbitrary lowercase-alnum words, arbitrary trained tables:
    single-pass apply equals the replace-chain formulation and tokens
    always concatenate back to the word."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word_st = st.text(alphabet="ab1", max_size=16)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(word_st, min_size=1, max_size=40), word_st)
    def check(corpus, probe):
        freq = {}
        for w in corpus:
            if w:
                freq[w] = freq.get(w, 0) + 1
        merges = train_bpe(freq, 24)
        validate_merges(merges)
        for w in set(corpus) | {probe}:
            if not w:
                continue
            got = encode_word(w, merges)
            assert "".join(got) == w
            assert got == _replace_reference(w, merges)

    check()


def test_bpe_encode_normalize_false_keeps_any_charset(spark):
    merges = [("é", "t"), ("k", "o")]
    # hand-built but topologically valid (all constituents are chars)
    df = spark.createDataFrame(
        [(1, "été ko"), (2, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in
           bpe_encode(df, merges, normalize=False).collect()}
    assert list(got[1].tokens) == ["ét", "é", " ", "ko"]
    assert got[1].n_tokens == 3 and got[1].n_words == 2
    assert got[2].n_words == 0 and list(got[2].tokens) == []
