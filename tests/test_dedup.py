"""Dedup operator tests: planted duplicates must be found; disjoint docs
must not pair; minhash estimates must track exact Jaccard."""

from __future__ import annotations

from logstash_forwarder_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one word differs
FAR = "completely different text about spark shuffles and parquet readers here"


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE.upper()),  # exact dup after normalization
        (3, NEAR),  # near dup
        (4, FAR),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    got = exact_duplicates(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].keeper == 1


def test_dedup_exact_keeps_one(spark):
    kept = dedup_exact(_docs(spark))
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3, 4, 5]


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(r.shingle for r in shingles(df, n=3).collect())
    assert got == ["a b c", "b c d"]
    # short doc: no 3-shingles
    df2 = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert shingles(df2, n=3).count() == 0


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold_pct=50).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in got  # identical after norm → jaccard 100
    assert (1, 3) in got  # one word change in a 20-word doc
    assert all(4 not in p for p in got)  # disjoint text never pairs


def test_minhash_lsh_pairs(spark):
    pairs = minhash_lsh_pairs(_docs(spark)).collect()
    got = {(r.doc_a, r.doc_b): r.est_jaccard_pct for r in pairs}
    assert got.get((1, 2)) == 100  # identical signatures
    assert (1, 3) in got and got[(1, 3)] >= 30  # near dup collides in a band
    assert all(4 not in p for p in got)


def test_shingle_kernel_vs_python_reference():
    """Pure-kernel witness (no Spark): the vectorized segment arithmetic in
    _distinct_shingle_hashes must agree with a naive per-row Python
    implementation that shares only the word-hash and mix functions."""
    import re

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from logstash_forwarder_spark.operators.dedup import (
        _distinct_shingle_hashes,
        _mix3,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "  Weird   SPACING\tand CASE  ",
        "a b",  # too short for 3-shingles
        "",
        None,
        "x y z x y z x y z",  # repeated shingles → distinctness matters
        "one two three four five six seven",
    ]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(range(len(texts)), pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )
    seg_rows, seg_starts, dhash, dcounts, _wl = _distinct_shingle_hashes(
        batch, "text", 3, 42
    )

    # naive reference: per row, normalize → words → word hashes → shingle
    # hashes → set
    want = {}
    for i, t in enumerate(texts):
        t = t or ""
        norm = re.sub(r"\s+", " ", t).strip(" ").lower()
        words = norm.split(" ")
        if len(words) < 3:
            continue
        wh = pd.util.hash_array(np.array(words, dtype=object))
        hs = {
            int(_mix3(wh[j], wh[j + 1], wh[j + 2], 42))
            for j in range(len(words) - 2)
        }
        if hs:
            want[i] = hs

    got = {}
    ends = np.append(seg_starts[1:], len(dhash))
    for r, s, e in zip(seg_rows, seg_starts, ends):
        got[int(r)] = {int(h) for h in dhash[s:e]}
    assert got == want
    assert [len(got[int(r)]) for r in seg_rows] == list(dcounts)


def test_minhash_hot_bucket_cap(spark):
    """max_bucket drops mega-cluster buckets: 30 identical docs form a
    30-member bucket in every band → capped at 10, none of their C(30,2)
    pairs are emitted, while an unrelated near-dup pair still is."""
    rows = [(i, BASE) for i in range(100, 130)]  # identical mega-cluster
    rows += [(1, LONG_BASE), (2, LONG_NEAR)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_pairs(df, max_bucket=10).collect()
    got = {(r.doc_a, r.doc_b) for r in capped}
    assert (1, 2) in got
    assert not any(a >= 100 or b >= 100 for a, b in got)
    # uncapped finds the cluster pairs
    full = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(df).collect()}
    assert (100, 101) in full and (1, 2) in full


def test_sketch_kernel_vs_builtin_shingles(spark):
    """Independent witness for the Arrow shingle kernel: per-doc distinct
    shingle hashes must be exactly as numerous as the JVM-builtin shingle
    relation's distinct shingles (hash collisions aside), and identical docs
    must get identical signatures."""
    from logstash_forwarder_spark.operators.dedup import (
        minhash_signatures,
        simhash_chunks,
    )

    df = _docs(spark)
    want = {r.doc_id: r.n for r in
            shingles(df).groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}

    sigs = {r.doc_id: list(r.sig) for r in minhash_signatures(df).collect()}
    # docs 1 and 2 are equal after normalization → identical signatures
    assert sigs[1] == sigs[2]
    # every doc with shingles is present; none without
    assert set(sigs) == {d for d, n in want.items() if n > 0}

    # simhash: identical normalized docs → identical chunks; and the doc set
    # matches the builtin shingle relation's
    ch = {r.doc_id: (r.c0, r.c1, r.c2, r.c3) for r in simhash_chunks(df).collect()}
    assert ch[1] == ch[2]
    assert set(ch) == set(sigs)


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """Statistical witness: for the (1,3) near-dup pair, the kernel's
    signature-slot agreement must sit near the exact shingle Jaccard
    (k=32 → binomial std ≈ 8 pct-points; allow 3σ)."""
    from logstash_forwarder_spark.operators.dedup import minhash_signatures

    df = _docs(spark)
    sh = {d: set() for d in (1, 3)}
    for r in shingles(df).collect():
        if r.doc_id in sh:
            sh[r.doc_id].add(r.shingle)
    exact = 100 * len(sh[1] & sh[3]) / len(sh[1] | sh[3])
    sigs = {r.doc_id: list(r.sig) for r in minhash_signatures(df).collect()}
    est = 100 * sum(a == b for a, b in zip(sigs[1], sigs[3])) / len(sigs[1])
    assert abs(est - exact) <= 25  # 3σ for k=32 at J≈0.7


LONG_BASE = " ".join(
    f"token{i} word{i % 7} item{i % 11}" for i in range(40)
)  # 120 words → 118 shingles
LONG_NEAR = LONG_BASE.replace("token39", "token39x")  # last word: ≤3 shingles differ


def test_simhash_pairs(spark):
    rows = [(1, LONG_BASE), (2, LONG_BASE.upper()), (3, LONG_NEAR), (4, FAR)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_pairs(df, max_hamming=15, n_chunks=16).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0  # identical sketch
    assert (1, 3) in got  # 3/118 shingles differ → small hamming
    assert all(4 not in p for p in got)


def test_edit_near_dup_finds_planted_pair(spark):
    from logstash_forwarder_spark.operators.dedup import edit_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "s1"),
        (2, base.replace("quick", "quack"), "s1"),  # 1 substitution
        (3, "completely different text about spark shuffles and joins ok", "s1"),
        (4, base, "s2"),  # same text, different source → not a candidate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.doc_a, r.doc_b): r.dist for r in edit_near_dup_pairs(df, max_dist=10).collect()}
    assert out == {(1, 2): 1}


def test_edit_near_dup_threshold_and_blocking(spark):
    from logstash_forwarder_spark.operators.dedup import edit_near_dup_pairs

    a = "a" * 40
    rows = [
        (1, a, "s"),
        (2, a[:-3] + "bbb", "s"),        # same bucket, dist 3
        (3, "a" * 90, "s"),              # different length bucket → blocked out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = edit_near_dup_pairs(df, max_dist=5).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(1, 2)}
    # threshold prunes: with max_dist=2 the planted pair disappears
    assert edit_near_dup_pairs(df, max_dist=2).count() == 0


def test_edit_near_dup_hot_block_cap(spark):
    from logstash_forwarder_spark.operators.dedup import edit_near_dup_pairs

    a = "a" * 40
    rows = [(i, a, "hot") for i in range(6)] + [(100, a, "cold"), (101, a, "cold")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # hot block (6 docs) dropped at cap 5; cold pair survives
    got = edit_near_dup_pairs(df, max_dist=5, max_block_docs=5).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(100, 101)}
    # cap None: all 15 hot pairs + 1 cold pair
    assert edit_near_dup_pairs(df, max_dist=5, max_block_docs=None).count() == 16


def test_minhash_portable_matches_hashlib(spark, tmp_path):
    """The portable md5 signature matrix equals a naive hashlib reference;
    a doc with <3 words yields NULL signatures (empty shingle set)."""
    import hashlib

    from logstash_forwarder_spark.queries import q_minhash_portable

    docs = [
        (1, "the quick brown fox jumps", "s"),
        (2, "one two", "s"),
        (3, "a b c a b c a b c", "s"),
    ]
    df = spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, n_chars long",
    )
    df = df.withColumnRenamed("lang", "source")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in q_minhash_portable(spark, sf).collect()}

    from logstash_forwarder_spark.queries import MINHASH_P, MINHASH_PERMS

    def naive(text, p):
        w = text.lower().split()
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if not sh:
            return None
        a, b = MINHASH_PERMS[p]
        return min(
            (int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P * a + b)
            % MINHASH_P
            for s in sh
        )

    for doc_id, text, _ in docs:
        for p in range(8):
            assert out[doc_id][f"sig{p}"] == naive(text, p), (doc_id, p)


def test_simhash_portable_matches_hashlib(spark, tmp_path):
    import hashlib

    from logstash_forwarder_spark.queries import q_simhash_portable

    docs = [
        (1, "the quick brown fox jumps over the dog", "s"),
        (2, "xy z", "s"),
        (3, "a b c d e", "s"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", len(t)) for i, t, _ in docs],
        "doc_id long, text string, source string, n_chars long",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r.simhash32 for r in q_simhash_portable(spark, sf).collect()}

    def naive(text):
        w = text.lower().split()
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if not sh:
            return None
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh]
        sig = 0
        for b in range(32):
            if 2 * sum((h >> b) & 1 for h in hs) >= len(hs):
                sig |= 1 << b
        return sig

    for doc_id, text, _ in docs:
        assert out[doc_id] == naive(text), doc_id


def test_span_share_stats(spark):
    from logstash_forwarder_spark.operators.dedup import span_share_stats

    span = "one two three four five six seven eight"  # exactly one 8-gram
    rows = [
        (1, span + " nine", "s"),          # grams: [1..8], [2..9] — first is shared
        (2, span + " ten", "s"),           # shares the [1..8] gram with doc 1
        (3, "totally different words here that never repeat anywhere x", "s"),
        (4, "too short", "s"),             # < 8 words → zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in span_share_stats(df, n=8).collect()}
    assert out[1].n_grams == 2 and out[1].n_shared_grams == 1
    assert out[1].shared_ppm == 500000
    assert out[2].n_grams == 2 and out[2].n_shared_grams == 1
    assert out[3].n_grams == 2 and out[3].n_shared_grams == 0
    assert out[4].n_grams == 0 and out[4].shared_ppm == 0


def test_kernel_arbitrary_n_matches_naive():
    """_distinct_shingle_hashes at n != 3: distinct-gram counts per row
    must match a naive Python reference (the n-step fold generalizes the
    3-gram combiner)."""
    import pyarrow as pa

    from logstash_forwarder_spark.operators.dedup import _distinct_shingle_hashes

    texts = [
        "a b c d e f g h i j",
        "a a a a a a a a",          # all grams identical → 1 distinct
        "x y",                       # shorter than any n >= 3
        "",
        "one two three four five six seven eight nine ten eleven",
    ]
    batch = pa.RecordBatch.from_arrays([pa.array(texts, pa.string())], ["text"])
    for n in (2, 5, 8):
        seg_rows, _ss, _dh, dcounts, _wl = _distinct_shingle_hashes(batch, "text", n, 7)
        got = {int(r): int(c) for r, c in zip(seg_rows, dcounts)}
        for i, t in enumerate(texts):
            w = t.split()
            expect = len({tuple(w[k : k + n]) for k in range(len(w) - n + 1)}) if len(w) >= n else 0
            assert got.get(i, 0) == expect, (n, i, t)


def test_mix_n_equals_mix3():
    import numpy as np

    from logstash_forwarder_spark.operators.dedup import _mix3, _mix_n

    rng = np.random.default_rng(0)
    wh = rng.integers(0, 2**63, size=30, dtype=np.uint64)
    pos = np.arange(0, 28, dtype=np.int64)
    assert (_mix_n(wh, pos, 3, 42) == _mix3(wh[pos], wh[pos + 1], wh[pos + 2], 42)).all()


def test_portable_sketches_custom_id_col(spark):
    from logstash_forwarder_spark.operators.dedup import portable_sketches
    from logstash_forwarder_spark.queries import MINHASH_P, MINHASH_PERMS

    df = spark.createDataFrame(
        [("k1", "a b c d e"), ("k2", "x")], "key string, body string"
    )
    out = portable_sketches(
        df, id_col="key", text_col="body",
        minhash_p=MINHASH_P, minhash_perms=MINHASH_PERMS,
    ).collect()
    got = {r.key: r for r in out}
    assert got["k1"].sig0 is not None and got["k1"].simhash32 is not None
    assert got["k2"].sig0 is None  # < 3 words → no shingles → NULLs


from hypothesis import given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=60, deadline=None)
@given(
    _st.text(alphabet="ab \t", min_size=0, max_size=40)
)
def test_sketch_text_property_vs_naive(text):
    """Spark-free property sweep: sketch_text equals an independent naive
    reference (own normalization, own md5 path) on arbitrary
    whitespace-mangled text, including empty and <3-word inputs."""
    import hashlib
    import re

    from logstash_forwarder_spark.operators.dedup import sketch_text
    from logstash_forwarder_spark.queries import MINHASH_P, MINHASH_PERMS

    sigs, sim = sketch_text(
        text, minhash_p=MINHASH_P, minhash_perms=MINHASH_PERMS
    )
    w = re.sub(r"[ \t\n\r\f\v]+", " ", text).strip().lower().split(" ")
    grams = {tuple(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()
    if not grams:
        assert sigs is None and sim is None
        return
    hs = [int(hashlib.md5(" ".join(g).encode()).hexdigest()[:15], 16) for g in grams]
    for p, (a, b) in enumerate(MINHASH_PERMS):
        assert sigs[p] == min((h % MINHASH_P * a + b) % MINHASH_P for h in hs)
    for bit in range(32):
        want = 1 if 2 * sum((h >> bit) & 1 for h in hs) >= len(hs) else 0
        assert (sim >> bit) & 1 == want


def test_span_cut_hand_countable(spark):
    """Duplicated 8-gram spans: first occurrence (min doc_id, then min
    pos) survives, later occurrences lose every covered word; unique text
    is untouched; short docs (<8 words) pass through whole."""
    from logstash_forwarder_spark.operators.dedup import span_cut

    boiler = "the quick brown fox jumps over the lazy"  # exactly 8 words
    rows = [
        (1, f"intro one two {boiler} tail alpha"),
        (2, f"{boiler} something completely different here now ok"),
        (3, "short doc only"),
        (4, f"pre {boiler} post {boiler} end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_cut(df, n=8).collect()}

    # doc 1 owns the gram (min doc_id; its pos 3 is the first occurrence)
    assert out[1].n_removed == 0
    assert out[1].kept_text == f"intro one two {boiler} tail alpha"
    # doc 2's copy at pos 0 is cut: 8 words removed
    assert out[2].n_removed == 8
    assert out[2].kept_text == "something completely different here now ok"
    # short doc: no grams, nothing cut
    assert out[3].n_removed == 0 and out[3].kept_text == "short doc only"
    # doc 4 has the gram twice (pos 1 and pos 10): both lose to doc 1
    assert out[4].n_removed == 16
    assert out[4].kept_text == "pre post end"
    assert all(out[i].n_words == len(rows[i - 1][1].split()) for i in out)


def test_span_cut_property_vs_python_oracle(spark):
    """Randomized corpora vs an independent pure-Python implementation of
    the rule (first occurrence by (doc_id, pos) survives; covered words
    drop; kept text reassembles in order). Small vocab + short grams force
    dense duplication, overlapping spans, and within-doc repeats."""
    import random

    from logstash_forwarder_spark.operators.dedup import span_cut

    def python_oracle(docs, n):
        words = {i: t.split() for i, t in docs}
        occ = []  # (gram, doc, pos)
        for i, w in words.items():
            for p in range(len(w) - n + 1):
                occ.append((tuple(w[p : p + n]), i, p))
        first = {}
        for g, i, p in sorted(occ, key=lambda x: (x[1], x[2])):
            first.setdefault(g, (i, p))
        cut = {}
        for g, i, p in occ:
            if first[g] != (i, p):
                cut.setdefault(i, set()).update(range(p, p + n))
        out = {}
        for i, w in words.items():
            removed = cut.get(i, set())
            kept = [x for j, x in enumerate(w) if j not in removed]
            out[i] = (len(w), len(removed & set(range(len(w)))), " ".join(kept))
        return out

    rng = random.Random(99)
    vocab = ["a", "b", "c", "d"]
    for trial in range(4):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 14))))
            for i in range(12)
        ]
        n = rng.choice([2, 3])
        exp = python_oracle(docs, n)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_words, r.n_removed, r.kept_text)
            for r in span_cut(df, n=n).collect()
        }
        assert got == exp, (trial, n, docs)


def test_winnow_guarantee_and_density(spark):
    """The winnowing GUARANTEE (Schleimer et al. §2): any shared run of
    >= w + k - 1 words between two docs shares at least one fingerprint
    VALUE; and selection density stays near the expected 2/(w+1)."""
    import random

    from logstash_forwarder_spark.operators.dedup import winnow_fingerprints

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(200)]
    shared = " ".join(rng.choice(vocab) for _ in range(6))  # w+k-1 = 6
    doc_a = " ".join(rng.choice(vocab) for _ in range(30)) + " " + shared
    doc_b = shared + " " + " ".join(rng.choice(vocab) for _ in range(30))
    doc_c = " ".join(rng.choice(vocab) for _ in range(40))  # unrelated
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=3, w=4).collect()
    by_doc: dict[int, set] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
    # density: m grams -> roughly 2m/(w+1) selections, never more than m
    for d, text in ((1, doc_a), (2, doc_b), (3, doc_c)):
        m = len(text.split()) - 2
        assert 0 < len(by_doc[d]) <= m


def test_winnow_short_docs_and_ties(spark):
    """Docs shorter than k words emit nothing; docs with fewer than w
    grams winnow their single truncated window; identical-hash ties pick
    the RIGHTMOST position (verified with a repeated gram)."""
    from logstash_forwarder_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "just two"),              # < k words -> nothing
            (2, "alpha beta gamma"),      # exactly 1 gram -> 1 selection
            (3, "x y z x y z x y z x y z"),  # periodic: repeated grams tie
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, k=3, w=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.fp))
    assert 1 not in by_doc
    assert len(by_doc[2]) == 1 and by_doc[2][0][0] == 0
    # doc 3: grams at pos 0..9 cycle 3 values; within any window the min
    # hash appears twice for some windows — selections must be at the
    # RIGHTMOST of tied positions, so positions of one fp value differ
    # by the period (3), never adjacent
    pos_by_fp: dict[int, list] = {}
    for pos, fp in sorted(by_doc[3]):
        pos_by_fp.setdefault(fp, []).append(pos)
    for positions in pos_by_fp.values():
        assert all(b - a >= 3 for a, b in zip(positions, positions[1:]))


def test_winnow_fps_only_equals_distinct_projection(spark):
    """The r8 kernel-side distinct (``fps_only=True``) must equal the
    relational form it replaced — select(id, fp).distinct() over the
    full positional output — including docs whose repeated grams select
    the SAME fp at several positions (the case the dedup exists for)."""
    import random

    from logstash_forwarder_spark.operators.dedup import winnow_fingerprints

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for i in range(200)
    ] + [(200, "x y z x y z x y z x y z"), (201, ""), (202, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = winnow_fingerprints(df, k=3, w=4)
    expected = {(r.doc_id, r.fp) for r in full.select("doc_id", "fp").distinct().collect()}
    got_rows = winnow_fingerprints(df, k=3, w=4, fps_only=True).collect()
    got = {(r.doc_id, r.fp) for r in got_rows}
    assert len(got_rows) == len(got), "kernel distinct emitted duplicates"
    assert got == expected
