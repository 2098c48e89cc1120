"""BPE learn/encode vs a reference single-machine implementation.

The reference below is the classic Sennrich et al. 2016 learn loop
(word-frequency dict, best-pair count, left-to-right replace) written
directly from the public algorithm — the distributed operator must
reproduce its merge sequence exactly (same tie-break)."""

from __future__ import annotations

import collections

import pytest

from dwh_with_dask_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_learn,
    merges_df,
    _norm_py,
)


def ref_bpe_learn(texts: list[str], n_merges: int, min_freq: int = 2):
    """Reference implementation (driver-side, dict-based)."""
    wf = collections.Counter()
    for t in texts:
        for w in _norm_py(t).split(" "):
            if w:
                wf[w] += 1
    vocab = {tuple(list(w) + [END]): c for w, c in wf.items()}
    merges = []
    for rank in range(n_merges):
        pc = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        # tie-break: count desc, then (left, right) asc
        (l, r), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_freq:
            break
        merges.append((rank, l, r, l + r, freq))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_bpe_learn_matches_reference(corpus_df):
    got = bpe_learn(corpus_df, "text", n_merges=10)
    want = ref_bpe_learn(CORPUS, 10)
    assert got == want
    assert len(got) == 10  # corpus is rich enough to reach 10 merges
    # merged symbols grow monotonically useful: first merge is the
    # most frequent character pair overall
    assert got[0][4] == max(m[4] for m in got)


def test_bpe_learn_stable_under_repartition(spark, corpus_df):
    a = bpe_learn(corpus_df, "text", n_merges=6)
    b = bpe_learn(corpus_df.repartition(7), "text", n_merges=6)
    assert a == b


def test_bpe_encode_roundtrip_and_counts(spark, corpus_df):
    merges = bpe_learn(corpus_df, "text", n_merges=10)
    out = {r.doc_id: r for r in bpe_encode(corpus_df, merges).collect()}
    for i, text in enumerate(CORPUS):
        words = [w for w in _norm_py(text).split(" ") if w]
        assert out[i].n_words == len(words)
        # token stream re-concatenates to the words (+ END markers)
        joined = "".join(out[i].tokens)
        assert joined == "".join(w + END for w in words)[: len(joined)]
        assert out[i].n_tokens <= sum(len(w) + 1 for w in words)


def test_norm_py_matches_spark_on_unicode_whitespace(spark):
    """ADVICE r5: Python \\s is Unicode-aware, Java/Spark's is ASCII —
    _norm_py must pin to ASCII so bpe_encode tokenizes identically to
    word_frequency. U+00A0 and U+2009 must NOT split or trim."""
    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.dedup import normalize_text

    cases = [
        "foo bar",           # NBSP inside a word
        " lead and trail ",
        "a b",               # thin space
        "  tabs\tand\nnewlines  ",
        "ordinary text",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "i long, t string")
    got_spark = {
        r.i: r.n for r in df.select("i", normalize_text("t").alias("n")).collect()
    }
    for i, t in enumerate(cases):
        assert _norm_py(t) == got_spark[i], repr(t)


def test_merges_df_schema(spark, corpus_df):
    m = merges_df(spark, bpe_learn(corpus_df, "text", n_merges=3))
    assert m.columns == ["rank", "left", "right", "merged", "freq"]
    assert m.count() == 3


def ref_encode(word: str, merges) -> list[str]:
    """Reference encode: apply merges in rank order, repeatedly."""
    sym = list(word) + [END]
    ranks = {(m[1], m[2]): m[0] for m in merges}
    while True:
        best, best_pair = None, None
        for i in range(len(sym) - 1):
            rk = ranks.get((sym[i], sym[i + 1]))
            if rk is not None and (best is None or rk < best):
                best, best_pair = rk, (sym[i], sym[i + 1])
        if best is None:
            return sym
        l, r = best_pair
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out


def test_bpe_encode_fuzz_vs_reference(spark):
    """Random words through the distributed encoder must match the
    rank-order reference encode word by word."""
    import random

    rng = random.Random(13)
    corpus_words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 8)))
        for _ in range(300)
    ]
    docs = [
        (i, " ".join(rng.choices(corpus_words, k=rng.randint(1, 10))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_learn(df, "text", n_merges=15)

    out = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    for i, text in docs:
        words = [w for w in _norm_py(text).split(" ") if w]
        want: list[str] = []
        for w in words:
            want.extend(ref_encode(w, merges))
        assert out[i].n_tokens == len(want)
        assert list(out[i].tokens) == want[:32]


def test_bpe_learn_driver_equals_distributed(corpus_df):
    """Round 15: the driver fast path (vocab fits the budget → in-process
    merge loop) and the distributed iteration (forced via budget=0)
    produce the identical merge sequence, and both equal the reference."""
    fast = bpe_learn(corpus_df, "text", n_merges=10)  # budget default: fast
    dist = bpe_learn(corpus_df, "text", n_merges=10, driver_vocab_budget=0)
    assert fast == dist == ref_bpe_learn(CORPUS, 10)

    # min_freq early-stop behaves identically on both paths
    fast2 = bpe_learn(corpus_df, "text", n_merges=30, min_freq=6)
    dist2 = bpe_learn(
        corpus_df, "text", n_merges=30, min_freq=6, driver_vocab_budget=0
    )
    assert fast2 == dist2 == ref_bpe_learn(CORPUS, 30, min_freq=6)
