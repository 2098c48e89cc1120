"""Distributed unigram-LM tokenizer induction + Viterbi encoding.

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): the unigram language
model tokenizer of Kudo 2018 (the SentencePiece algorithm; public) —
BPE's sibling and the second of the two tokenizer-induction families a
training-data pipeline actually uses. Where BPE grows a vocabulary by
greedy merges, unigram LM starts from a LARGE seed vocabulary and
EM-fits piece probabilities (forward-backward over each word's
segmentation lattice), then PRUNES low-probability pieces — encoding is
the Viterbi segmentation under the learned log-probabilities.

Scale design (same shape as ``operators/bpe.py``):

- The corpus compresses to its WORD FREQUENCY table first — one
  tokenize + count pass (map-side combined, vocabulary-sized output).
  Everything after runs over vocab rows, never the corpus.
- Seed candidates are each word's distinct substrings up to
  ``max_piece_len`` — an explode over the word table (bounded:
  len(word) × max_piece_len rows per DISTINCT word), aggregated by
  weighted frequency; the seed keeps the top ``seed_size`` by
  count·len (the SentencePiece seed heuristic) plus every single
  character (the closure that guarantees every word segments).
- Each EM iteration: broadcast the current {piece: logp} map into one
  Arrow-batched ``mapInPandas`` over the word table that runs EXACT
  forward-backward per word (lattice nodes = positions, edges = vocab
  pieces matching there; expected edge count = exp(alpha_i + logp +
  beta_j − total)), scaled by the word's corpus frequency; a
  vocab-sized groupBy sums expected counts; new logp = log(count /
  total). No corpus pass, no wide shuffle — the M-step aggregate moves
  (piece, float) rows.
- Pruning (every ``prune_every`` iterations, SentencePiece's shrink
  step simplified to its load-bearing core): keep single chars +
  the top pieces by expected count until ``vocab_size``.
- Encoding: Viterbi per word in ``mapInPandas`` with a per-batch word
  memo — the exact argmax segmentation under the learned logps, ties
  broken toward FEWER pieces then lexicographically smaller piece at
  the latest split (deterministic across partitionings).

Determinism: no RNG anywhere; EM math is per-word-identical IEEE
float; the only cross-partition float aggregation is the M-step sum,
whose order-dependence is below 1e-9 relative (asserted against a
single-machine twin in tests) and cannot flip the Viterbi argmax for
the fixture corpora the tests pin.

No SQL oracle by nature (iterative float EM — same class as PCA/ridge/
logreg); the driver records rows-only and the tests carry a pure-Python
reference implementation run to equality.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.bpe import word_frequency

_NEG_INF = float("-inf")


def _seed_vocab(
    words: DataFrame, max_piece_len: int, seed_size: int
) -> DataFrame:
    """(piece, cnt) seed candidates: every distinct substring (len <=
    max_piece_len) of every word, weighted by word frequency; the top
    ``seed_size`` by cnt·len plus ALL single characters."""
    subs = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(
                            F.lit(max_piece_len), F.length("word") - i + 1
                        ),
                    ),
                    lambda n: F.substr(F.col("word"), i, n),
                ),
            )
        )
    )
    cand = (
        words.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    chars = cand.filter(F.length("piece") == 1)
    multi = (
        cand.filter(F.length("piece") > 1)
        .orderBy(
            (F.col("cnt") * F.length("piece")).desc(), F.col("piece").asc()
        )
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def _em_expected(vocab: dict[str, float], max_piece_len: int):
    """mapInPandas body: per word, exact forward-backward expected
    piece counts under ``vocab`` (piece -> logp), scaled by word
    frequency. Yields (piece, expected, loglik_weighted) rows."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out_piece: list[str] = []
            out_exp: list[float] = []
            out_ll: list[float] = []
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                n = len(word)
                # edges[j] = list of (i, piece, logp) ending at j
                edges: list[list[tuple[int, str, float]]] = [
                    [] for _ in range(n + 1)
                ]
                for i in range(n):
                    for ln in range(1, min(max_piece_len, n - i) + 1):
                        p = word[i : i + ln]
                        lp = vocab.get(p)
                        if lp is not None:
                            edges[i + ln].append((i, p, lp))
                alpha = [_NEG_INF] * (n + 1)
                alpha[0] = 0.0
                for j in range(1, n + 1):
                    s = _NEG_INF
                    for i, _p, lp in edges[j]:
                        if alpha[i] != _NEG_INF:
                            s = _logsumexp2(s, alpha[i] + lp)
                    alpha[j] = s
                total = alpha[n]
                if total == _NEG_INF:
                    continue  # unreachable given single-char closure
                beta = [_NEG_INF] * (n + 1)
                beta[n] = 0.0
                for j in range(n, 0, -1):
                    if beta[j] == _NEG_INF:
                        continue
                    for i, _p, lp in edges[j]:
                        if alpha[i] != _NEG_INF:
                            b = lp + beta[j]
                            beta[i] = _logsumexp2(beta[i], b)
                acc: dict[str, float] = {}
                for j in range(1, n + 1):
                    for i, p, lp in edges[j]:
                        if alpha[i] == _NEG_INF or beta[j] == _NEG_INF:
                            continue
                        e = math.exp(alpha[i] + lp + beta[j] - total)
                        acc[p] = acc.get(p, 0.0) + e
                w = float(cnt)
                for p, e in acc.items():
                    out_piece.append(p)
                    out_exp.append(e * w)
                    out_ll.append(0.0)
                # one row carries the word's weighted log-likelihood
                out_piece.append("")
                out_exp.append(0.0)
                out_ll.append(total * w)
            yield pd.DataFrame(
                {"piece": out_piece, "expected": out_exp, "ll": out_ll}
            )

    return run


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def unigram_learn(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_size: int = 2048,
    n_iter: int = 4,
    prune_every: int = 2,
) -> tuple[DataFrame, list[float]]:
    """Learn a unigram-LM vocabulary from the corpus. Returns
    (vocab DataFrame (piece, logp), per-iteration corpus
    log-likelihoods — non-decreasing between consecutive EM steps on a
    fixed vocabulary, the EM guarantee the tests assert).

    The iteration state (a {piece: logp} dict of at most
    ``seed_size + alphabet`` entries) is driver-held and broadcast into
    each E-step — metadata-sized by construction, the same contract as
    BPE's merge list and the IVF centroids."""
    spark = df.sparkSession
    words = word_frequency(df, text_col).persist()
    n_words = words.count()  # materialize once; also sizes the E-step
    if n_words == 0:
        words.unpersist()
        return (
            spark.createDataFrame([], "piece string, logp double"),
            [],
        )
    seed = _seed_vocab(words, max_piece_len, seed_size).collect()
    total0 = sum(r["cnt"] for r in seed)
    vocab = {
        r["piece"]: math.log(r["cnt"] / total0) for r in seed
    }
    llhist: list[float] = []
    for it in range(n_iter):
        run = _em_expected(vocab, max_piece_len)
        stats = (
            words.mapInPandas(
                run, schema="piece string, expected double, ll double"
            )
            .groupBy("piece")
            .agg(
                F.sum("expected").alias("expected"),
                F.sum("ll").alias("ll"),
            )
            .collect()
        )
        llhist.append(sum(r["ll"] for r in stats))
        exp = {r["piece"]: r["expected"] for r in stats if r["piece"]}
        if (it + 1) % prune_every == 0 and len(exp) > vocab_size:
            # prune: keep all single chars (closure) + top multi-char
            # pieces by expected count (ties: piece asc) to vocab_size
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
        vocab = {
            p: math.log(e / total) for p, e in exp.items() if e > 0.0
        }
    words.unpersist()
    out = spark.createDataFrame(
        sorted(vocab.items()), "piece string, logp double"
    )
    return out, llhist


def _viterbi(word: str, vocab: dict[str, float], max_piece_len: int):
    """Exact argmax segmentation; ties toward FEWER pieces, then the
    lexicographically smaller piece at the latest split — deterministic
    regardless of dict order."""
    n = len(word)
    # state per end-position j: (logp_sum, n_pieces, piece, prev_index)
    st: list[tuple[float, int, str, int] | None] = [None] * (n + 1)
    st[0] = (0.0, 0, "", -1)
    for j in range(1, n + 1):
        chosen: tuple[tuple[float, int], str, int] | None = None
        for ln in range(1, min(max_piece_len, j) + 1):
            i = j - ln
            prev = st[i]
            if prev is None:
                continue
            p = word[i:j]
            lp = vocab.get(p)
            if lp is None:
                continue
            key = (prev[0] + lp, -(prev[1] + 1))
            if (
                chosen is None
                or key > chosen[0]
                or (key == chosen[0] and p < chosen[1])
            ):
                chosen = (key, p, i)
        if chosen is not None:
            st[j] = (chosen[0][0], -chosen[0][1], chosen[1], chosen[2])
    if st[n] is None:
        return [word]  # unsegmentable (char missing): pass through
    pieces: list[str] = []
    j = n
    while j > 0:
        _lp, _np, p, i = st[j]
        pieces.append(p)
        j = i
    return pieces[::-1]


def unigram_encode(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """(id, pieces array<string>, n_pieces) — Viterbi segmentation of
    each document's words under the learned vocabulary. Arrow-batched
    mapInPandas with a per-batch word memo (the ``bpe_encode``
    contract); the vocabulary broadcasts as a closure."""
    vmap = {r["piece"]: r["logp"] for r in vocab.collect()}

    def run(batches):
        import pandas as pd

        for pdf in batches:
            memo: dict[str, list[str]] = {}
            ids, pieces_col, counts = [], [], []
            for did, text in zip(pdf["id"], pdf["text"]):
                toks = (text or "").lower().split()
                pieces: list[str] = []
                for w in toks:
                    got = memo.get(w)
                    if got is None:
                        got = _viterbi(w, vmap, max_piece_len)
                        memo[w] = got
                    pieces.extend(got)
                ids.append(did)
                pieces_col.append(pieces)
                counts.append(len(pieces))
            yield pd.DataFrame(
                {"id": ids, "pieces": pieces_col, "n_pieces": counts}
            )

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(
        run, schema="id long, pieces array<string>, n_pieces long"
    )
