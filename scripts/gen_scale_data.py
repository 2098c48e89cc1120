"""Deterministic local scale-up of the driver's sf0.1 testdata.

The round-2 verdict's bench finding: at sf0.1 (17 MB) Spark's fixed
per-query cost (job scheduling, stage launch, noop-commit) dominates, so
the 2x-of-baseline gate is undecidable there. This script derives a
larger scale (default 10x sf0.1 = "sf1": 6M lineitem rows) from the
read-only driver data WITHOUT touching /root/testdata, writing into a
gitignored repo-local dir. Everything is seeded/deterministic.

- Relational tables (customer/supplier/part/orders/lineitem/events) are
  replicated R times with per-replica key offsets (offset = max(key)+1),
  keeping every non-key distribution, fan-out, and join relationship
  bit-identical to the driver's generator. region/nation are fixed
  dimensions and copied as-is.
- documents gets FRESH text per replica (seeded draw from the base
  corpus's empirical word frequencies and length distribution) so the
  dedup/near-dup workload scales in input size, not in planted
  replica-duplicates that would quadratically distort pair outputs.
- embeddings gets fresh per-replica vectors sampled around the base
  per-label centroids with the base within-label residual spread,
  renormalized to unit length — ANN/centroid/near-dup queries see the
  same cluster geometry at 10x density.

Also generates (--skew) a boilerplate-skewed documents corpus for the
shingle-cap benchmark: 20% of docs share a 40-word header, creating the
hot-shingle blowup `dedup_ngram_jaccard_capped` exists to cap.

Usage:
  python scripts/gen_scale_data.py            # .localdata/sf1 (R=10)
  python scripts/gen_scale_data.py --skew     # .localdata/skew
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_DEFAULT = "/root/testdata/sf0.1"

# (table, [key columns to offset]) — offsets are max(key)+1 in the key's
# own domain so replicated foreign keys stay consistent across tables.
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    # events.user_id joins o_custkey (asof/interval queries) -> custkey domain
    "events": {"event_id": "event_id", "user_id": "c_custkey"},
}

DOMAIN_TABLE = {
    "c_custkey": "customer",
    "o_orderkey": "orders",
    "p_partkey": "part",
    "s_suppkey": "supplier",
    "event_id": "events",
}


def key_domains(con: duckdb.DuckDBPyConnection, base: str) -> dict[str, int]:
    out = {}
    for key, table in DOMAIN_TABLE.items():
        out[key] = (
            con.sql(f"SELECT max({key}) + 1 FROM '{base}/{table}.parquet'").fetchone()[0]
        )
    return out


def replicate_relational(base: str, out: str, replicas: int) -> None:
    con = duckdb.connect()
    dom = key_domains(con, base)
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{base}/{t}.parquet') TO '{out}/{t}.parquet'")
        print(f"  {t}: copied")
    for t, keys in KEYED.items():
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{base}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r * {dom[keys[c]]} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{base}/{t}.parquet' "
            f"CROSS JOIN range({replicas}) rt(r) ORDER BY r) TO '{out}/{t}.parquet'"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows")


def fresh_documents(base: str, out: str, replicas: int, seed: int) -> None:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{base}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    nd = max(r[0] for r in rows) + 1
    words, lengths = [], []
    for _, text, _, _ in rows:
        toks = text.split()
        words.extend(toks)
        lengths.append(len(toks))
    vocab, counts = np.unique(np.array(words), return_counts=True)
    probs = counts / counts.sum()
    lengths = np.array(lengths)
    rng = np.random.default_rng(seed)

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for doc_id, text, lang, source in rows:  # replica 0 = the base corpus
        ids.append(doc_id)
        texts.append(text)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(text))
    for r in range(1, replicas):
        # vectorized draw (r6: replicas=100 for sf10 made the per-doc
        # loop the bottleneck): all lengths, then one flat word draw
        ns = rng.choice(lengths, size=len(rows))
        flat = rng.choice(vocab, size=int(ns.sum()), p=probs)
        offs = np.concatenate([[0], np.cumsum(ns)])
        for i, (doc_id, _, lang, source) in enumerate(rows):
            text = " ".join(flat[offs[i]:offs[i + 1]])
            ids.append(doc_id + r * nd)
            texts.append(text)
            langs.append(lang)
            sources.append(source)
            n_chars.append(len(text))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"  documents: {len(ids)} rows (fresh text from empirical vocab)")


def fresh_embeddings(base: str, out: str, replicas: int, seed: int) -> None:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{base}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    nv = max(r[0] for r in rows) + 1
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    cent = {}
    spread = {}
    for lab in np.unique(labels):
        pts = vecs[labels == lab]
        c = pts.mean(axis=0)
        cent[lab] = c
        spread[lab] = (pts - c).std(axis=0)  # per-dim residual std
    rng = np.random.default_rng(seed + 1)

    ids = [r[0] for r in rows]
    out_vecs = [np.asarray(v, dtype=np.float32) for v in vecs]
    out_labels = list(labels)
    for r in range(1, replicas):
        noise = rng.standard_normal((len(rows), vecs.shape[1]))
        for i, lab in enumerate(labels):
            v = cent[lab] + noise[i] * spread[lab]
            v /= np.linalg.norm(v)
            ids.append(rows[i][0] + r * nv)
            out_vecs.append(v.astype(np.float32))
            out_labels.append(int(lab))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(v) for v in out_vecs], pa.list_(pa.float32())),
            "label": pa.array([int(x) for x in out_labels], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"  embeddings: {len(ids)} rows (cluster-sampled, unit-norm)")


def gen_partsupp(data_dir: str, seed: int = 11) -> None:
    """partsupp for an existing table dir, from ITS part/supplier keys.

    TPC-H-shaped (public spec §4.2.3): 4 suppliers per part via the
    modular spread formula ps_suppkey = ((p + i*(S/4 + (p-1)/S)) % S)+1
    (so a part's suppliers scatter across the supplier domain),
    ps_availqty uniform 1..9999, ps_supplycost uniform 1.00..1000.00 —
    all from one seeded generator, so the same dir always gets the
    same partsupp. Enables TPC-H q2/q11/q20 locally; /root/testdata
    has no partsupp so these stay out of the driver registry."""
    con = duckdb.connect()
    parts = [
        r[0]
        for r in con.sql(
            f"SELECT p_partkey FROM '{data_dir}/part.parquet' ORDER BY 1"
        ).fetchall()
    ]
    s_keys = [
        r[0]
        for r in con.sql(
            f"SELECT s_suppkey FROM '{data_dir}/supplier.parquet' ORDER BY 1"
        ).fetchall()
    ]
    s_n = len(s_keys)
    s_arr = np.array(s_keys)
    n_per = min(4, s_n)
    # step = floor(S/n_per) >= 1 makes i*step for i in 0..n_per-1
    # pairwise distinct mod S -> distinct suppliers per part, always
    step = max(1, s_n // n_per)
    p_arr = np.repeat(np.array(parts), n_per)
    i_arr = np.tile(np.arange(n_per), len(parts))
    # index into the ordered supplier list (works for offset key domains)
    p_ix = np.repeat(np.arange(len(parts)), n_per)
    s_ix = (p_ix + i_arr * step) % s_n
    rng = np.random.default_rng(seed)
    avail = rng.integers(1, 10000, size=len(p_arr))
    cost = np.round(rng.uniform(1.0, 1000.0, size=len(p_arr)), 2)
    tbl = pa.table(
        {
            "ps_partkey": pa.array(p_arr, pa.int64()),
            "ps_suppkey": pa.array(s_arr[s_ix], pa.int64()),
            "ps_availqty": pa.array(avail, pa.int64()),
            "ps_supplycost": pa.array(cost, pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(data_dir, "partsupp.parquet"))
    print(f"  partsupp: {len(p_arr)} rows in {data_dir}")


def fixture_with_partsupp(base: str, out: str, seed: int = 11) -> None:
    """Local fixture dir: every base table copied + partsupp generated —
    the dev_diff/evidence path for q2/q11/q20 (the read-only driver
    testdata cannot carry partsupp)."""
    con = duckdb.connect()
    for f in sorted(os.listdir(base)):
        if f.endswith(".parquet"):
            con.sql(f"COPY (SELECT * FROM '{base}/{f}') TO '{out}/{f}'")
    gen_partsupp(out, seed)
    print(f"  fixture: {out} (base tables + partsupp)")


BOILERPLATE = (
    "terms of service apply to this document copyright notice all rights "
    "reserved unauthorized reproduction prohibited please review the license "
    "agreement before distribution contact the publisher for permissions "
    "this header is standard boilerplate text shared across the corpus"
)


def skewed_documents(base: str, out: str, limit: int | None = None) -> None:
    """20% of docs get a shared 40-word header: a realistic crawled-corpus
    boilerplate pattern whose shingles become hot keys. The uncapped
    inverted-index Jaccard join materializes every header-doc pair through
    those shingles (~(0.2n)^2/2 candidates); max_shingle_freq caps them.

    ``limit`` takes the first N base docs — used with a larger base
    (e.g. sf1's 50k fresh docs) to scale the HOT CLUSTER itself: at
    limit=10000 the shared header spans 2,000 docs, whose ~39 header
    shingles each generate C(2000,2)-scale candidate pairs in the naive
    inverted-index join — the quadratic regime the prefix filter and
    the frequency cap exist for."""
    con = duckdb.connect()
    lim = f"LIMIT {limit}" if limit else ""
    con.sql(
        f"""COPY (SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN '{BOILERPLATE} ' || text
                      ELSE text END AS text,
                 lang, source,
                 CASE WHEN doc_id % 5 = 0 THEN {len(BOILERPLATE) + 1} + n_chars
                      ELSE n_chars END AS n_chars
          FROM (SELECT * FROM '{base}/documents.parquet'
                ORDER BY doc_id {lim})) TO '{out}/documents.parquet'"""
    )
    n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    h = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet' WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    print(f"  documents (skew): {n} rows, {h} with shared boilerplate header")


def natural_skew_documents(
    out: str, n_docs: int = 20000, header_frac: float = 0.5, seed: int = 7
) -> None:
    """Boilerplate-skewed corpus with a NATURAL-LANGUAGE-SHAPED
    vocabulary: body words drawn Zipf(1.1) from a 50k-word vocab plus
    per-doc unique tokens (ids/names/numbers in real text), so shingle
    document frequencies are heavy-tailed — most content shingles are
    near-unique while the shared header's shingles are maximally hot.

    This is the regime split the driver's own synthetic documents
    cannot express (their ~200-word vocab gives every shingle a large,
    corpus-proportional df): here the naive inverted-index Jaccard join
    pays C(header_docs, 2) x header_shingles collision rows, while
    prefix filtering indexes only rare shingles and never touches the
    header at high thresholds."""
    rng = np.random.default_rng(seed)
    vocab_n = 50000
    ranks = np.arange(1, vocab_n + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    texts = []
    for i in range(n_docs):
        body_len = int(rng.integers(60, 120))
        words = [f"w{r}" for r in rng.choice(vocab_n, size=body_len, p=probs)]
        # ~10% per-doc unique tokens (serials, names): guaranteed-rare shingles
        for j in range(max(1, body_len // 10)):
            words[int(rng.integers(0, body_len))] = f"u{i}x{j}"
        body = " ".join(words)
        texts.append(f"{BOILERPLATE} {body}" if i % 2 < 2 * header_frac else body)
    # Plant ~1% true near-duplicates (J >= ~0.9): copy an earlier doc's
    # text with two word substitutions, so the high-threshold queries
    # have a non-empty, checkable answer set.
    for i in rng.choice(np.arange(10, n_docs), size=n_docs // 100, replace=False):
        src_words = texts[int(i) - 5].split(" ")
        for j in (3, 11):
            src_words[j % len(src_words)] = f"sub{i}x{j}"
        texts[int(i)] = " ".join(src_words)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array([f"src{i % 10}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))
    print(f"  documents (skew-nl): {n_docs} rows, {int(n_docs*header_frac)} with header, vocab {vocab_n}")


def skewed_join_fixture(src: str, out: str, seed: int = 23) -> None:
    """Zipf-skewed ORDERKEY fixture for the skew-join bench (VERDICT
    r14 ask #3): the bench corpora carry uniform orderkeys, so the
    skew machinery (AQE skew split, salted_join) was never exercised
    at realistic scale. Takes ``src``'s lineitem, remaps
    ``l_orderkey`` with a Pareto draw over the orders key domain
    (P(K > k) ~ k^-0.2, i.e. Zipf tail exponent ~1.2 — the hottest
    key holds ~13% of ALL lineitem rows), and writes the slim join
    columns to ``out/lineitem_skew.parquet``. Orders is joined
    directly from ``src`` (one row per key — the classic fact x dim
    skew shape). Deterministic via setseed."""
    con = duckdb.connect()
    con.sql(f"SELECT setseed({seed / 100.0})")
    nkeys = con.sql(
        f"SELECT max(o_orderkey) FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT CAST(least(floor(power(random(), -5.0)), {nkeys})
                      AS BIGINT) AS l_orderkey,
                 l_extendedprice, l_discount, l_returnflag
          FROM '{src}/lineitem.parquet'
        ) TO '{out}/lineitem_skew.parquet'
        """
    )
    n, hot = con.sql(
        f"""
        SELECT count(*),
               (SELECT count(*) FROM '{out}/lineitem_skew.parquet'
                WHERE l_orderkey = 1)
        FROM '{out}/lineitem_skew.parquet'
        """
    ).fetchone()
    print(f"  lineitem_skew: {n} rows, hottest key holds {hot} ({hot/n:.1%})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=BASE_DEFAULT)
    ap.add_argument("--out", default=None)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skew", action="store_true", help="generate the boilerplate-skew corpus instead")
    ap.add_argument("--limit", type=int, default=None, help="with --skew: take only the first N base docs")
    ap.add_argument("--skew-nl", action="store_true", help="generate the natural-vocabulary boilerplate corpus instead")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list restricting generation (relational,documents,"
        "embeddings) — sf10 skips embeddings",
    )
    ap.add_argument(
        "--partsupp",
        metavar="DIR",
        default=None,
        help="generate partsupp.parquet into an existing table dir",
    )
    ap.add_argument(
        "--fixture-partsupp",
        nargs=2,
        metavar=("BASE", "OUT"),
        default=None,
        help="copy BASE tables to OUT and add partsupp (local q2/q11/q20 fixture)",
    )
    ap.add_argument(
        "--skew-join",
        nargs=2,
        metavar=("SRC", "OUT"),
        default=None,
        help="write a Zipf-skewed-orderkey lineitem_skew.parquet from "
        "SRC's lineitem into OUT (skew-join bench fixture)",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.partsupp:
        gen_partsupp(args.partsupp)
        return
    if args.fixture_partsupp:
        base, out = args.fixture_partsupp
        os.makedirs(out, exist_ok=True)
        fixture_with_partsupp(base, out)
        return
    if args.skew_join:
        src, out = args.skew_join
        os.makedirs(out, exist_ok=True)
        print(f"skew-join fixture ({src}) -> {out}")
        skewed_join_fixture(src, out, args.seed)
        return
    if args.skew_nl:
        out = args.out or os.path.join(repo, ".localdata", "skewnl")
        os.makedirs(out, exist_ok=True)
        print(f"skew-nl corpus -> {out}")
        natural_skew_documents(out)
        return
    if args.skew:
        out = args.out or os.path.join(repo, ".localdata", "skew")
        os.makedirs(out, exist_ok=True)
        print(f"skew corpus -> {out}")
        skewed_documents(args.base, out, args.limit)
        return
    out = args.out or os.path.join(repo, ".localdata", "sf1")
    os.makedirs(out, exist_ok=True)
    which = set((args.tables or "relational,documents,embeddings").split(","))
    print(f"scale ({args.replicas}x {args.base}) -> {out} [{sorted(which)}]")
    if "relational" in which:
        replicate_relational(args.base, out, args.replicas)
    if "documents" in which:
        fresh_documents(args.base, out, args.replicas, args.seed)
    if "embeddings" in which:
        fresh_embeddings(args.base, out, args.replicas, args.seed)


if __name__ == "__main__":
    sys.exit(main())
