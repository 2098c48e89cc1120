"""Unit tests: heavy hitters, count-min sketch, bloom decontamination,
OOV rate, paragraph dedup — controlled-fixture semantics beyond the
registry's oracle differential."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.operators.curation import bloom_decontaminate, oov_rate
from dwh_with_dask_spark.operators.dedup import paragraph_dedup
from dwh_with_dask_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    heavy_hitters,
)
from tests.conftest import SF_SMOKE


def test_heavy_hitters_counts_and_weights(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    got = {r.k: (r.cnt, r.share) for r in heavy_hitters(df, "k", 0.25).collect()}
    assert got == {"a": (6, 0.6), "b": (3, 0.3)}
    # weighted: weight mass, not row count
    wdf = spark.createDataFrame(
        [("a", 1), ("b", 8), ("c", 1)], "k string, w int"
    )
    got = {r.k: r.cnt for r in heavy_hitters(wdf, "k", 0.5, "w").collect()}
    assert got == {"b": 8}


def test_cms_estimate_is_upper_bound_and_tight_when_wide(spark):
    df = spark.createDataFrame(
        [(f"t{i % 17}",) for i in range(500)], "k string"
    )
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    # narrow sketch: collisions likely, but NEVER an underestimate
    sk = cms_build(df, "k", depth=4, width=8)
    est = {
        r.k: r.cms_est
        for r in cms_estimate(sk, df.select("k").distinct(), "k", 4, 8).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # wide sketch: 17 keys in 4x1024 cells — w >> n makes collisions
    # vanishingly unlikely, so estimates are exact
    sk2 = cms_build(df, "k", depth=4, width=1024)
    est2 = {
        r.k: r.cms_est
        for r in cms_estimate(sk2, df.select("k").distinct(), "k", 4, 1024).collect()
    }
    assert est2 == exact


def test_bottomk_deterministic_under_duplicate_ids(spark):
    """ADVICE r5: duplicate ids tie on the md5 priority; the value
    tie-breaker must make the k-boundary selection deterministic —
    same sample regardless of partitioning."""
    from dwh_with_dask_spark.operators.sketches import bottomk_sample

    rows = [(i % 7, float(v)) for i, v in enumerate(range(100))]
    df = spark.createDataFrame(rows, "id long, v double")
    s1 = sorted(r.value for r in bottomk_sample(df, "v", "id", 10).collect())
    s2 = sorted(
        r.value
        for r in bottomk_sample(df.repartition(13), "v", "id", 10).collect()
    )
    s3 = sorted(
        r.value
        for r in bottomk_sample(df.coalesce(1), "v", "id", 10).collect()
    )
    assert s1 == s2 == s3
    # the selected values are the SMALLEST among each tied-priority
    # group (value asc tie-break), so the boundary is well-defined
    assert len(s1) == 10


def test_bloom_decontaminate_no_false_negatives(spark):
    # doc 17 hashes to 'test' under the default split salt; give an
    # exact duplicate of its text to many train docs — the bloom probe
    # must flag it (bloom filters cannot false-negative).
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    dup_text = docs.filter(F.col("doc_id") == 0).select("text").first()[0]
    out = bloom_decontaminate(docs, k=3, m=4096)
    rows = {r.doc_id: r for r in out.collect()}
    # every eval doc appears exactly once with bounded hits
    evals = docs.select(
        "doc_id",
    ).count()
    assert all(0 <= r.n_hits <= 3 for r in rows.values())
    assert all(r.split in ("val", "test") for r in rows.values())
    # inject: copy an eval doc's text onto a train doc -> contaminated
    from dwh_with_dask_spark.operators.curation import hash_split

    tagged = docs.select(
        "doc_id", hash_split("doc_id", 0.90, 0.05).alias("split"), "text"
    )
    ev = tagged.filter(F.col("split") != "train").first()
    forged = docs.withColumn(
        "text",
        F.when(F.col("doc_id") != ev.doc_id, F.lit(ev.text)).otherwise(
            F.col("text")
        ),
    )
    out2 = {r.doc_id: r for r in bloom_decontaminate(forged, k=3, m=4096).collect()}
    assert out2[ev.doc_id].contaminated


def test_oov_rate_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a b"),
            Row(doc_id=2, text="a c"),
            Row(doc_id=3, text="c c c d"),
        ]
    )
    # totals: c=4, a=3, b=1, d=1 -> vocab_size=2 keeps {c, a}
    got = {r.doc_id: r for r in oov_rate(df, vocab_size=2).collect()}
    assert (got[1].n_tokens, got[1].n_oov) == (3, 1)  # 'b' is OOV
    assert (got[2].n_tokens, got[2].n_oov) == (2, 0)
    assert (got[3].n_tokens, got[3].n_oov) == (4, 1)  # 'd' is OOV
    assert got[3].oov_rate == 0.25


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="p q r s t A B C D E"),
            # doc 2 repeats doc 1's second paragraph, then unique tail
            Row(doc_id=2, text="A B C D E x y z w v"),
            # doc 3 repeats its OWN first paragraph
            Row(doc_id=3, text="m n o u k m n o u k"),
        ]
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, window=5).collect()}
    assert (out[1].n_paras, out[1].n_removed) == (2, 0)
    assert out[1].dedup_text == "p q r s t a b c d e"
    assert (out[2].n_paras, out[2].n_removed) == (2, 1)
    assert out[2].dedup_text == "x y z w v"
    assert (out[3].n_paras, out[3].n_removed) == (2, 1)
    assert out[3].dedup_text == "m n o u k"


def test_paragraph_dedup_custom_splitter(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="hello world|unique bit"),
            Row(doc_id=2, text="hello world|another part"),
        ]
    )
    out = {
        r.doc_id: r
        for r in paragraph_dedup(
            df, paragraphs=F.split(F.col("text"), r"\|")
        ).collect()
    }
    assert out[1].dedup_text == "hello world unique bit"
    assert out[2].n_removed == 1
    assert out[2].dedup_text == "another part"


def test_kmv_distinct_matches_python_twin_and_is_accurate(spark):
    """kmv_distinct is a pure function of the data: a hashlib twin over
    the collected column must reproduce the estimate EXACTLY, the
    estimate must sit within ~4 sigma (0.5 rel) of the exact distinct,
    and the bottom-k state must merge (bottomk(A∪B) ==
    bottomk(bottomk(A) ∪ bottomk(B)))."""
    import hashlib

    from dwh_with_dask_spark.operators.sketches import kmv_distinct

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {
        r.l_returnflag: (r.n_sketch, r.kmv_distinct)
        for r in kmv_distinct(li, ["l_returnflag"], "l_partkey", k=64).collect()
    }

    rows = li.select("l_returnflag", "l_partkey").collect()
    by_flag: dict[str, set[int]] = {}
    for r in rows:
        h = int(
            hashlib.md5(f"{r.l_partkey}kmv".encode()).hexdigest()[:13], 16
        )
        by_flag.setdefault(r.l_returnflag, set()).add(h)
    for flag, hs in by_flag.items():
        kept = sorted(hs)[:64]
        if len(kept) < 64:
            est = float(len(kept))
        else:
            est = 63.0 / (kept[-1] / float(16**13))
        n_sketch, got_est = got[flag]
        assert n_sketch == len(kept)
        assert got_est == est, (flag, got_est, est)
        exact = len({r.l_partkey for r in rows if r.l_returnflag == flag})
        assert abs(est - exact) / exact <= 0.5, (flag, est, exact)

        # mergeability of the bottom-k state on the real hashes
        a, b = sorted(hs)[::2], sorted(hs)[1::2]
        merged = sorted(set(sorted(a)[:64]) | set(sorted(b)[:64]))[:64]
        assert merged == kept


def test_bloom_filter_membership_contract(spark):
    """Bloom seen-set (round 14): no false negatives ever, false
    positives at the sized rate, probe equal to a pure-Python replica
    of the md5 positions + 63-bit packing."""
    import hashlib

    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = [f"url-{i}" for i in range(200)]
    fresh = [f"new-{i}" for i in range(500)]
    m_bits, k = 4096, 4

    dfm = spark.createDataFrame([(x,) for x in members], "key string")
    dfp = spark.createDataFrame(
        [(i, x) for i, x in enumerate(members + fresh)],
        "pid long, key string",
    )
    bloom = bloom_build(dfm, "key", m_bits=m_bits, k=k)
    got = {
        r["pid"]: r["maybe"]
        for r in bloom_probe(
            bloom, dfp, "key", id_col="pid", m_bits=m_bits, k=k,
            out_col="maybe",
        ).collect()
    }

    def positions(key):
        return [
            int(hashlib.md5(f"{key}bf{i}".encode()).hexdigest()[:8], 16)
            % m_bits
            for i in range(k)
        ]

    bits = set()
    for x in members:
        bits.update(positions(x))
    # the stored words equal the replica's packing
    words = {r["word_idx"]: r["word"] for r in bloom.collect()}
    want_words: dict[int, int] = {}
    for p in bits:
        want_words[p // 63] = want_words.get(p // 63, 0) | (1 << (p % 63))
    assert words == want_words

    expect = {
        i: all(p in bits for p in positions(key))
        for i, (key) in enumerate(members + fresh)
    }
    assert got == expect
    # Bloom contract: every member reads True...
    assert all(got[i] for i in range(len(members)))
    # ...and the false-positive rate on fresh keys is near the sized
    # bound (~ (1-e^(-k n/m))^k ~ 0.0035 here; allow generous slack)
    fp = sum(1 for i in range(len(members), len(members) + len(fresh)) if got[i])
    assert fp <= 10, f"false-positive rate implausibly high: {fp}/500"


def test_kmv_set_ops_exact_branch_and_hashlib_twin(spark):
    """kmv_set_ops: (1) when the merged distinct union is < k both
    estimates are EXACT counts; (2) on the estimator branch every
    double is a pure function of the data — a hashlib twin evaluating
    the identical IEEE expression tree reproduces it bit-for-bit."""
    import hashlib

    from dwh_with_dask_spark.operators.sketches import kmv_set_ops

    # exact branch: 10 + 15 values, overlap 5 -> union 20 < k
    rows = [("x", v) for v in range(10)] + [("y", v) for v in range(5, 20)]
    df = spark.createDataFrame(rows, "g string, v int")
    r = kmv_set_ops(df, "g", "v", k=64).collect()
    assert len(r) == 1
    assert (r[0].g_a, r[0].g_b) == ("x", "y")
    assert r[0].union_est == 20.0 and r[0].intersect_est == 5.0
    assert (r[0].n_a_sketch, r[0].n_b_sketch) == (10, 15)

    # estimator branch: 3000/3000 distinct with 1500 shared
    big = [("x", v) for v in range(3000)] + [("y", v) for v in range(1500, 4500)]
    bdf = spark.createDataFrame(big, "g string, v int")
    k = 64
    got = kmv_set_ops(bdf, "g", "v", k=k).collect()[0]

    def h(v):
        return int(hashlib.md5(f"{v}kmv".encode()).hexdigest()[:13], 16)

    sx = sorted({h(v) for v in range(3000)})[:k]
    sy = sorted({h(v) for v in range(1500, 4500)})[:k]
    merged = sorted(set(sx) | set(sy))
    mk = merged[:k]
    shared = set(sx) & set(sy)
    union_est = float(k - 1) / (float(mk[k - 1]) / float(16**13))
    k_shared = len(set(mk) & shared)
    intersect_est = (float(k_shared) / float(k)) * union_est
    assert got.union_est == union_est
    assert got.intersect_est == intersect_est
    # and the estimates are in the ballpark of the truth (k=64 ~ 12.7% rse)
    assert abs(got.union_est - 4500) / 4500 < 0.5
    assert abs(got.intersect_est - 1500) / 1500 < 0.8


def test_bottomk_two_phase_bit_identical(spark):
    """_bottomk_per_group (bucket-parallel prune + final window) equals
    the exact per-group bottom-k, including a skewed group, a group
    with < k values, and k-boundary ties across buckets."""
    import hashlib

    from dwh_with_dask_spark.operators.sketches import kmv_distinct

    rows = (
        [("big", v) for v in range(5000)]       # skewed group
        + [("small", v) for v in range(7)]      # < k values
        + [("edge", v) for v in range(64)]      # exactly k
    )
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        r.g: (r.n_sketch, r.kmv_distinct)
        for r in kmv_distinct(df, ["g"], "v", k=64).collect()
    }

    def h(v):
        return int(hashlib.md5(f"{v}kmv".encode()).hexdigest()[:13], 16)

    for g, vals in (("big", range(5000)), ("small", range(7)), ("edge", range(64))):
        hs = sorted({h(v) for v in vals})[:64]
        n = len(hs)
        est = float(n) if n < 64 else 63.0 / (float(hs[63]) / float(16**13))
        assert got[g] == (n, est), g
