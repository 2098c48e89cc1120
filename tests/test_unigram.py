"""Unigram-LM tokenizer induction (operators/unigram.py) vs a
single-machine reference implementation (Kudo 2018 semantics: EM with
exact forward-backward over the segmentation lattice, Viterbi encode).

No SQL oracle by nature (iterative float EM, same class as PCA/BPE);
these tests carry the reference twin to near-equality plus the EM
monotonicity and closure properties.
"""

from __future__ import annotations

import math

import pytest

from dwh_with_dask_spark.operators.unigram import (
    _viterbi,
    unigram_encode,
    unigram_learn,
)

NEG_INF = float("-inf")


def _ref_seed(word_freq, max_len, seed_size):
    cnt: dict[str, int] = {}
    for w, c in word_freq.items():
        subs = set()
        for i in range(len(w)):
            for n in range(1, min(max_len, len(w) - i) + 1):
                subs.add(w[i : i + n])
        for s in subs:
            cnt[s] = cnt.get(s, 0) + c
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda kv: (-kv[1] * len(kv[0]), kv[0]),
    )[:seed_size]
    out = dict(chars)
    out.update(dict(multi))
    return out


def _lse(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _ref_em(word_freq, vocab, max_len):
    """One E-step: (expected counts, corpus loglik) — independent
    forward-backward implementation."""
    exp: dict[str, float] = {}
    ll = 0.0
    for w, c in word_freq.items():
        n = len(w)
        edges = [[] for _ in range(n + 1)]
        for i in range(n):
            for ln in range(1, min(max_len, n - i) + 1):
                p = w[i : i + ln]
                if p in vocab:
                    edges[i + ln].append((i, p, vocab[p]))
        alpha = [NEG_INF] * (n + 1)
        alpha[0] = 0.0
        for j in range(1, n + 1):
            s = NEG_INF
            for i, _p, lp in edges[j]:
                if alpha[i] != NEG_INF:
                    s = _lse(s, alpha[i] + lp)
            alpha[j] = s
        total = alpha[n]
        if total == NEG_INF:
            continue
        beta = [NEG_INF] * (n + 1)
        beta[n] = 0.0
        for j in range(n, 0, -1):
            if beta[j] == NEG_INF:
                continue
            for i, _p, lp in edges[j]:
                beta[i] = _lse(beta[i], lp + beta[j])
        for j in range(1, n + 1):
            for i, p, lp in edges[j]:
                if alpha[i] == NEG_INF or beta[j] == NEG_INF:
                    continue
                exp[p] = exp.get(p, 0.0) + c * math.exp(
                    alpha[i] + lp + beta[j] - total
                )
        ll += c * total
    return exp, ll


def _ref_learn(word_freq, vocab_size, max_len, seed_size, n_iter, prune_every):
    seed = _ref_seed(word_freq, max_len, seed_size)
    total0 = sum(seed.values())
    vocab = {p: math.log(c / total0) for p, c in seed.items()}
    lls = []
    for it in range(n_iter):
        exp, ll = _ref_em(word_freq, vocab, max_len)
        lls.append(ll)
        if (it + 1) % prune_every == 0 and len(exp) > vocab_size:
            chars = {p for p in exp if len(p) == 1}
            multi = sorted(
                ((p, e) for p, e in exp.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )
            keep = chars | {
                p for p, _ in multi[: max(0, vocab_size - len(chars))]
            }
            exp = {p: e for p, e in exp.items() if p in keep}
        total = sum(exp.values())
        vocab = {p: math.log(e / total) for p, e in exp.items() if e > 0.0}
    return vocab, lls


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox naps under the brown log"),
    (3, "quick foxes and lazy dogs and quick dogs"),
    (4, "the the the quick quick brown brown"),
    (5, "unseen zebra words appear here too"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _word_freq():
    wf: dict[str, int] = {}
    for _i, t in CORPUS:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_unigram_learn_matches_reference_twin(spark, corpus_df):
    got_df, lls = unigram_learn(
        corpus_df, vocab_size=64, max_piece_len=6, seed_size=128,
        n_iter=4, prune_every=2,
    )
    got = {r["piece"]: r["logp"] for r in got_df.collect()}
    want, ref_lls = _ref_learn(
        _word_freq(), vocab_size=64, max_len=6, seed_size=128,
        n_iter=4, prune_every=2,
    )
    assert set(got) == set(want)
    for p, lp in want.items():
        assert got[p] == pytest.approx(lp, rel=1e-9, abs=1e-12), p
    assert len(lls) == 4
    for a, b in zip(lls, ref_lls):
        assert a == pytest.approx(b, rel=1e-9)
    # EM monotonicity between consecutive un-pruned steps: the vocab
    # used for ll[1] came from a pure EM update of the one used for
    # ll[0] (first prune fires after iteration 2's E-step)
    assert lls[1] >= lls[0] - 1e-9
    # single-char closure survives pruning
    alphabet = {ch for w in _word_freq() for ch in w}
    assert alphabet <= set(got)


def test_unigram_encode_roundtrip_and_viterbi(spark, corpus_df):
    vocab_df, _ = unigram_learn(
        corpus_df, vocab_size=64, max_piece_len=6, seed_size=128,
        n_iter=2, prune_every=2,
    )
    vmap = {r["piece"]: r["logp"] for r in vocab_df.collect()}
    out = {
        r["id"]: list(r["pieces"])
        for r in unigram_encode(corpus_df, vocab_df, max_piece_len=6).collect()
    }
    for did, text in CORPUS:
        toks = text.lower().split()
        want: list[str] = []
        for w in toks:
            want.extend(_viterbi(w, vmap, 6))
        assert out[did] == want, did
        # round-trip: concatenating a word's pieces rebuilds the word
        got_concat = "".join(out[did])
        assert got_concat == "".join(toks)


def test_viterbi_prefers_probable_and_fewer_pieces():
    vocab = {
        "a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.3),
        "c": math.log(0.3),
    }
    # ab (0.3) beats a+b (0.04)
    assert _viterbi("ab", vocab, 4) == ["ab"]
    # tie in probability -> fewer pieces wins
    v2 = {"x": math.log(0.25), "xx": math.log(0.0625)}
    assert _viterbi("xx", v2, 4) == ["xx"]
    # unsegmentable word passes through whole
    assert _viterbi("zq", {"z": -1.0}, 4) == ["zq"]