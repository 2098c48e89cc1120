"""Corpus-curation operators: determinism, quotas, packing invariants,
PII scrubbing, BM25 — behavior tests complementing the DuckDB oracle
diff (plans/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} " + ("alpha beta " * (i % 7 + 1)) + f"tail{i}", ["en", "de", "fr"][i % 3])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_split_fractions_and_stability(docs):
    out = docs.select("doc_id", C.hash_split("doc_id", 0.90, 0.05).alias("split"))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == 300
    assert counts["train"] / n == pytest.approx(0.90, abs=0.08)
    # Stability: the assignment is a pure function of the key — identical
    # across plans, partitionings, and runs.
    again = docs.repartition(7).select(
        "doc_id", C.hash_split("doc_id", 0.90, 0.05).alias("split")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_bernoulli_sample_deterministic_subset(docs):
    s1 = {r["doc_id"] for r in C.bernoulli_sample(docs, 0.3, "doc_id").collect()}
    s2 = {r["doc_id"] for r in C.bernoulli_sample(docs, 0.3, "doc_id").collect()}
    assert s1 == s2
    assert len(s1) == pytest.approx(90, abs=30)
    # A smaller fraction with the same salt is a strict subset (the draw
    # is fixed per row; only the threshold moves).
    s_small = {r["doc_id"] for r in C.bernoulli_sample(docs, 0.1, "doc_id").collect()}
    assert s_small <= s1
    # Different salts give (almost surely) different samples.
    s_other = {r["doc_id"] for r in C.bernoulli_sample(docs, 0.3, "doc_id", salt="x").collect()}
    assert s_other != s1


def test_stratified_sample_exact_quota(docs):
    out = C.stratified_sample_exact(docs, "lang", 15, "doc_id")
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 15, "de": 15, "fr": 15}
    # Quota above stratum size returns the whole stratum.
    tiny = docs.filter(F.col("doc_id") < 5)
    got = C.stratified_sample_exact(tiny, "lang", 15, "doc_id").count()
    assert got == 5


def test_pack_sequences_invariants(docs):
    d = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    budget = 64
    packed = C.pack_sequences(d, "n_tokens", budget, "doc_id", n_shards=4).collect()
    assert len(packed) == 300
    by_pack: dict[int, list] = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for rows in by_pack.values():
        rows.sort(key=lambda r: r["pack_pos"])
        # pack_pos is the running token count before each doc, starts at
        # a point below budget (a pack only opens if there is room).
        assert rows[0]["pack_pos"] >= 0
        for prev, cur in zip(rows, rows[1:]):
            assert cur["pack_pos"] == prev["pack_pos"] + prev["n_tokens"]
            # every doc except possibly the last STARTS inside the budget
            assert cur["pack_pos"] < budget
        # shard consistency: packs never span shards
        assert len({r["shard"] for r in rows}) == 1


def test_pii_scrub_counts_and_replacement(spark):
    rows = [
        (1, "contact a.user+tag@example.co.uk or admin@x.io today"),
        (2, "server at 192.168.0.1 and 10.0.0.254, port 8080"),
        (3, "no pii here"),
        (4, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    n_email, n_ip = C.pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id", n_email.alias("e"), n_ip.alias("i"),
            C.pii_scrub("text").alias("s"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"]) == (2, 0)
    assert out[1]["s"] == "contact <EMAIL> or <EMAIL> today"
    assert (out[2]["e"], out[2]["i"]) == (0, 2)
    assert out[2]["s"] == "server at <IP> and <IP>, port 8080"
    assert (out[3]["e"], out[3]["i"]) == (0, 0)
    assert out[4]["s"] == ""


def test_bm25_top_terms_ranks_distinctive_token(spark):
    # doc 1 repeats 'zebra' which appears nowhere else -> its top term;
    # 'the' is in every doc -> low idf, never a top term despite high tf.
    rows = [
        (1, "the zebra zebra zebra runs the field the"),
        (2, "the quick fox jumps over the lazy dog the"),
        (3, "the rain in spain stays mainly the plain the"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    top = C.bm25_top_terms(d, k=3)
    t1 = [r["term"] for r in top.filter(F.col("doc_id") == 1).orderBy("rank").collect()]
    assert t1[0] == "zebra"
    scores = C.bm25_scores(d)
    z = scores.filter((F.col("doc_id") == 1) & (F.col("term") == "zebra")).first()
    the = scores.filter((F.col("doc_id") == 1) & (F.col("term") == "the")).first()
    assert z["df"] == 1 and the["df"] == 3
    assert z["score"] > the["score"] > 0


def test_split_and_sample_have_no_shuffle(docs):
    """Stateless curation ops must not introduce an Exchange — they are
    map-side at any scale."""
    split_plan = docs.select(
        C.hash_split("doc_id").alias("s")
    )._jdf.queryExecution().executedPlan().toString()
    samp_plan = C.bernoulli_sample(
        docs, 0.5, "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in split_plan
    assert "Exchange" not in samp_plan


def test_weighted_sample_favors_heavy_rows(spark):
    rows = [(i, 1.0 if i < 150 else 100.0) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, w double")
    got = C.weighted_sample(d, 50, "w", "doc_id").collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r["w"] == 100.0)
    # P(pick light) ~ 1/100 of heavy per row; expect nearly all heavy.
    assert heavy >= 45
    again = C.weighted_sample(d, 50, "w", "doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    # PPS: weight <= 0 or NULL means zero inclusion probability. Without
    # the guard, u/0 is NULL and Spark's NULLS-FIRST ascending order
    # would put exactly those rows at the top of the sample.
    rows = [(1, 0.0), (2, None), (3, -5.0)] + [(i, 1.0) for i in range(10, 40)]
    d = spark.createDataFrame(rows, "doc_id long, w double")
    got = C.weighted_sample(d, 10, "w", "doc_id").collect()
    assert len(got) == 10
    assert all(r["doc_id"] >= 10 for r in got)


def test_chunk_documents_invariants(spark):
    text = " ".join(f"t{i}" for i in range(100))
    d = spark.createDataFrame([(1, text), (2, "short doc only")],
                              "doc_id long, text string")
    out = C.chunk_documents(d, chunk_tokens=32, overlap=8)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"]))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc -> exactly one chunk, all tokens
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc only"
    # 100 tokens, stride 24 -> ceil((100-8)/24) = 4 chunks
    chunks = by_doc[1]
    assert [r["chunk_id"] for r in chunks] == [0, 1, 2, 3]
    toks = text.split(" ")
    for r in chunks:
        start = r["chunk_id"] * 24
        expect = toks[start : start + 32]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_tokens"] == len(expect)
    # consecutive chunks overlap by 8 tokens (when both are full)
    a, b = chunks[0]["chunk_text"].split(" "), chunks[1]["chunk_text"].split(" ")
    assert a[-8:] == b[:8]
    # coverage: every token appears in some chunk
    seen = set()
    for r in chunks:
        seen.update(r["chunk_text"].split(" "))
    assert seen == set(toks)


def test_contamination_catches_copied_eval_doc(spark):
    # find concrete ids per split under the default salt
    probe = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    splits = {
        r["doc_id"]: r["s"]
        for r in probe.select("doc_id", C.hash_split("doc_id").alias("s")).collect()
    }
    train_id = next(i for i, s in splits.items() if s == "train")
    val_id = next(i for i, s in splits.items() if s == "val")
    other_val = next(i for i, s in splits.items() if s == "val" and i != val_id)

    leaked = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (train_id, leaked),
        (val_id, leaked),                      # contaminated
        (other_val, "completely different text with no shared fingerprint"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    hits = {r["doc_id"] for r in C.contamination_pairs(d).collect()}
    assert val_id in hits
    assert other_val not in hits
    assert train_id not in hits


def test_chunk_udtf_equals_vectorized(spark):
    """The SQL-side UDTF must produce exactly the vectorized
    chunk_documents output (same normalize, stride, tail semantics)."""
    rows = [(1, " ".join(f"t{i}" for i in range(75))), (2, "Tiny  Doc")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    d.createOrReplaceTempView("chunk_udtf_docs")

    spark.udtf.register("chunk_text", C.chunk_text_udtf())
    via_udtf = spark.sql(
        """SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_text
           FROM chunk_udtf_docs d, LATERAL chunk_text(d.text, 32, 8) c"""
    ).collect()
    via_vec = C.chunk_documents(d, chunk_tokens=32, overlap=8).collect()
    assert sorted(map(tuple, via_udtf)) == sorted(map(tuple, via_vec))
    assert len(via_udtf) > 3  # doc 1 actually splits


# --------------------------------------------------------------------------
# Gopher-style repetition stats (operators/textstats.py)
# --------------------------------------------------------------------------

def test_repetition_profile_exact_values(spark):
    from dwh_with_dask_spark.operators import textstats as TS

    rows = [
        (1, "a b a b a b"),            # heavy bigram repetition
        (2, "one two three four five"),  # fully diverse
        (3, "x"),                       # too short for 2/3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TS.repetition_profile(df).collect()}

    r1 = out[1]
    assert r1["top_unigram_frac"] == pytest.approx(3 / 6)
    assert r1["top_bigram_frac"] == pytest.approx(3 / 5)   # "a b" x3 of 5
    assert r1["top_trigram_frac"] == pytest.approx(2 / 4)
    assert r1["distinct_unigram_ratio"] == pytest.approx(2 / 6)

    r2 = out[2]
    assert r2["top_unigram_frac"] == pytest.approx(1 / 5)
    assert r2["top_bigram_frac"] == pytest.approx(1 / 4)
    assert r2["distinct_unigram_ratio"] == pytest.approx(1.0)

    r3 = out[3]
    assert r3["top_unigram_frac"] == pytest.approx(1.0)
    assert r3["top_bigram_frac"] is None       # no bigrams: NULL, not 0
    assert r3["top_trigram_frac"] is None
    assert r3["distinct_unigram_ratio"] == pytest.approx(1.0)


def test_repetition_filter_drops_boilerplate(spark):
    from dwh_with_dask_spark.operators import textstats as TS

    rows = [
        (1, "buy now " * 30),                       # spam: top bigram ~0.5
        (2, "the quick brown fox jumps over lazy dogs near riverbanks today"),
        (3, "ok"),                                  # short: vacuous bigram pass
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in TS.repetition_filter(df).collect()}
    assert kept == {2, 3}


# --------------------------------------------------------------------------
# Skew-safe exact stratified sampling
# --------------------------------------------------------------------------

def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stratified_prefiltered_equals_exact(docs):
    exact = C.stratified_sample_exact(docs, "lang", 20, "doc_id")
    pre = C.stratified_sample_prefiltered(docs, "lang", 20, "doc_id")
    assert _canon(pre.select("doc_id", "lang")) == _canon(
        exact.select("doc_id", "lang")
    )


def test_stratified_prefiltered_fallback_margin(docs):
    """margin ~1.0 makes under-quota survivor sets likely, forcing the
    counted-sufficiency fallback — output must STILL be identical."""
    exact = C.stratified_sample_exact(docs, "lang", 50, "doc_id")
    pre = C.stratified_sample_prefiltered(docs, "lang", 50, "doc_id", margin=1.0)
    assert _canon(pre.select("doc_id", "lang")) == _canon(
        exact.select("doc_id", "lang")
    )


def test_stratified_prefiltered_small_strata(spark):
    """Strata smaller than the quota must return ALL their rows."""
    rows = [(i, "s" if i < 3 else "big") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = C.stratified_sample_prefiltered(df, "grp", 10, "doc_id")
    by_grp = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp == {"s": 3, "big": 10}
    exact = C.stratified_sample_exact(df, "grp", 10, "doc_id")
    assert _canon(out) == _canon(exact)


def test_temperature_sample_rebalances_tail(spark):
    """alpha<1 must upsample tail groups relative to head groups: the
    sampled shares should sit strictly between natural shares and
    uniform, and acceptance must be a stateless per-row draw (stable
    under repartitioning)."""
    from dwh_with_dask_spark.operators.curation import temperature_sample
    from pyspark.sql import functions as F

    # 900 head rows vs 100 tail rows
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 900, "head").otherwise("tail").alias("grp"),
    )
    out = temperature_sample(df, "grp", "id", alpha=0.5, target_rows=400)
    shares = {
        r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    head_share = shares["head"] / (shares["head"] + shares["tail"])
    # natural head share 0.9; sqrt-weights give 30/(30+10) = 0.75
    assert 0.60 < head_share < 0.85
    # tail acceptance rate must exceed head's
    rates = {
        r.grp: r.rate for r in out.select("grp", "rate").distinct().collect()
    }
    assert rates["tail"] > rates["head"]
    # stateless: same accepted ids regardless of partitioning
    a = {r.id for r in out.collect()}
    b = {
        r.id
        for r in temperature_sample(
            df.repartition(13), "grp", "id", alpha=0.5, target_rows=400
        ).collect()
    }
    assert a == b


def test_mixture_sample_hits_target_shares(spark):
    """Weighted mixture: even-group rates must exceed odd-group rates
    when even groups target 3x the share, and the realized weight
    shares move toward the target."""
    from dwh_with_dask_spark.operators.curation import mixture_sample
    from pyspark.sql import functions as F

    rows = [
        (i, "even" if i % 2 == 0 else "odd", 10 + i % 7) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    out = mixture_sample(
        df, "grp", {"even": 0.75, "odd": 0.25}, "id",
        weight_col="w", budget_frac=0.5,
    )
    got = {
        r.grp: r.tw
        for r in out.groupBy("grp").agg(F.sum("w").alias("tw")).collect()
    }
    share_even = got["even"] / (got["even"] + got["odd"])
    # natural share ~0.5; target 0.75
    assert 0.65 < share_even < 0.85
    # absent groups drop
    out2 = mixture_sample(
        df, "grp", {"even": 1.0}, "id", weight_col="w", budget_frac=0.25
    )
    assert out2.filter(F.col("grp") == "odd").count() == 0


def test_c4_clean_line_and_page_rules(spark):
    from dwh_with_dask_spark.operators.c4 import c4_clean

    good = (
        "This is a proper sentence with enough words.\n"
        "Too short line.\n"
        "No terminal punctuation on this long enough line\n"
        "Enable javascript to view this site properly please.\n"
        'A quoted sentence also counts as a terminal line."\n'
        "Another fine sentence that ends with a question mark ok?\n"
        "And one more exclamation heavy sentence right here now!"
    )
    lorem = "Lorem Ipsum dolor sit amet is filler text for sure."
    code = "function f() { return 1; } is code with braces here."
    thin = "Just one good sentence with enough words in it."
    rows = [(1, good), (2, lorem), (3, code), (4, thin)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(d).collect()}

    g = out[1]
    # kept: sentence ., quoted ", question ?, exclamation ! lines;
    # dropped: short line, no-terminal line, javascript line
    assert g.n_lines == 7 and g.n_lines_kept == 4
    assert "javascript" not in g.c4_text
    assert "Too short" not in g.c4_text
    assert g.c4_keep and not g.has_lorem_ipsum and not g.has_brace
    assert out[2].has_lorem_ipsum and not out[2].c4_keep
    assert out[3].has_brace and not out[3].c4_keep
    # page with a single retained sentence fails the >=3 sentence floor
    assert out[4].n_lines_kept == 1 and not out[4].c4_keep


def test_c4_rules_fixture_matches_duckdb(spark, tmp_path):
    """Differential on REALISTIC multi-line text (the sf corpora have no
    newlines, so the registry entry alone never exercises line rules)."""
    import duckdb

    from dwh_with_dask_spark.plans.curation import ORACLES

    texts = [
        "First sentence here is fine and long enough.\nshort.\n"
        "Third line has javascript inside it but is long and ends well.\n"
        "Fourth line is perfectly reasonable and ends properly!\n"
        "Fifth line also ends with terminal punctuation right here?",
        "lorem ipsum page with plenty of words that end properly.",
        "brace { page with plenty of words that end properly.",
        "no terminal lines at all on this page whatsoever",
        "One good sentence only with enough words right here.",
    ]
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pq = str(tmp_path / "documents.parquet")
    d.toPandas().to_parquet(pq)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = {
        r[0]: tuple(r[1:])
        for r in con.sql(ORACLES["corpus_c4_rules"]).fetchall()
    }

    from dwh_with_dask_spark.operators.c4 import c4_clean

    got = {
        r.doc_id: (
            r.n_lines, r.n_lines_kept, r.has_lorem_ipsum,
            r.has_brace, r.n_sentences, r.c4_keep,
        )
        for r in c4_clean(d).select(
            "doc_id", "n_lines", "n_lines_kept", "has_lorem_ipsum",
            "has_brace", "n_sentences", "c4_keep",
        ).collect()
    }
    assert got == want


def test_bm25_indexed_probe_matches_recompute_and_prunes(spark, tmp_path):
    """build_bm25_index + bm25_search_indexed: the probe's results equal
    bm25_search's recompute exactly (the stored postings ARE
    bm25_scores output), duplicate query terms collapse identically,
    and the probe scans ONLY the bucket directories the query's terms
    crc32-hash to — never the corpus."""
    import zlib

    rows = [
        (1, "spark window merge spark spark engine"),
        (2, "window functions rank over partitions window"),
        (3, "merge into target when matched update"),
        (4, "the rain in spain stays mainly on the plain"),
        (5, "spark merge spark window shuffle exchange"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "bm25idx")
    n_buckets = 8
    C.build_bm25_index(d, path, n_buckets=n_buckets)

    terms = ["spark", "window", "merge"]
    got = C.bm25_search_indexed(spark, path, terms, k=10)
    want = C.bm25_search(d, terms, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # set semantics: duplicated query terms change nothing on either path
    got_dup = C.bm25_search_indexed(spark, path, terms + terms, k=10)
    assert sorted(map(tuple, got_dup.collect())) == sorted(
        map(tuple, got.collect())
    )
    # partition pruning: the bucket IN-list must land in the scan's
    # PartitionFilters (directory-level skipping), not a post-scan
    # Filter (inputFiles() reports the unpruned listing, so assert on
    # the executed plan — the repo's standard pruning check)
    want_buckets = {
        zlib.crc32(t.encode()) % n_buckets for t in terms
    }
    assert want_buckets != set(range(n_buckets))  # pruning is non-trivial
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "__bucket" in pf
    # rebuild contract: refuses to clobber unless overwrite=True
    import pytest

    with pytest.raises(FileExistsError):
        C.build_bm25_index(d, path, n_buckets=n_buckets)
    C.build_bm25_index(d, path, n_buckets=n_buckets, overwrite=True)
    again = C.bm25_search_indexed(spark, path, terms, k=10)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bm25_failed_overwrite_rebuild_keeps_old_index(
    spark, tmp_path, monkeypatch
):
    """An overwrite=True rebuild that FAILS mid-build must leave the
    existing index intact and probe-able: staging is built completely
    BEFORE the rename-aside swap touches ``path`` (the
    no-partial-artifact invariant; ADVICE r10 — the previous sequence
    deleted the old index before the expensive tokenize/write)."""
    rows = [(1, "spark window merge"), (2, "window rank over")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "bm25idx")
    C.build_bm25_index(d, path, n_buckets=4)
    before = sorted(
        map(tuple, C.bm25_search_indexed(spark, path, ["window"], k=5).collect())
    )

    def boom(*a, **k):
        raise RuntimeError("simulated build failure")

    monkeypatch.setattr(C, "_bm25_write_segment", boom)
    with pytest.raises(RuntimeError):
        C.build_bm25_index(d, path, n_buckets=4, overwrite=True)
    monkeypatch.undo()
    after = sorted(
        map(tuple, C.bm25_search_indexed(spark, path, ["window"], k=5).collect())
    )
    assert after == before


def test_bm25_refresh_equals_full_rebuild(spark, tmp_path):
    """refresh_bm25_index appends a batch as one new segment WITHOUT
    re-tokenizing the base corpus, and a probe over base+appended
    equals a full rebuild over the union bit-for-bit — the raw-postings
    split (corpus-local postings stored, global stats summed at probe
    time, df counted over probed postings) is what makes the equality
    exact rather than approximate (VERDICT r9 ask #4)."""
    import json
    import os

    base_rows = [
        (1, "spark window merge spark spark engine"),
        (2, "window functions rank over partitions window"),
        (3, "merge into target when matched update"),
        (4, "the rain in spain stays mainly on the plain"),
    ]
    batch_rows = [
        (5, "spark merge spark window shuffle exchange"),
        (6, "broadcast join window spark adaptive"),
        (7, ""),  # zero-token doc: no postings, must not dilute avgdl
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    union = base.union(batch)

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    C.build_bm25_index(base, inc, n_buckets=8)
    stats = C.refresh_bm25_index(batch, inc)
    assert stats["n_docs"] == 2  # the empty doc indexes no rows
    C.build_bm25_index(union, full, n_buckets=8)

    terms = ["spark", "window", "merge"]
    got = C.bm25_search_indexed(spark, inc, terms, k=10).collect()
    want_idx = C.bm25_search_indexed(spark, full, terms, k=10).collect()
    want_live = C.bm25_search(union, terms, k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want_idx))
    assert sorted(map(tuple, got)) == sorted(map(tuple, want_live))

    # the refresh wrote exactly one new segment and left seg 0's bytes
    # untouched (O(batch) — nothing stored is read or rewritten)
    segs = sorted(
        e for e in os.listdir(inc) if e.startswith("__seg=")
    )
    assert segs == ["__seg=0", "__seg=1"]
    with open(os.path.join(inc, "__seg=0", "_bm25_seg.json")) as f:
        assert json.load(f)["n_docs"] == 4

    # scoring params are applied at probe time, not baked into bytes:
    # an override rescoring the SAME index must differ from the default
    # probe and equal a live bm25_search under the same params
    got_b0 = C.bm25_search_indexed(spark, inc, terms, k=10, b=0.0).collect()
    want_b0 = C.bm25_search(union, terms, k=10, b=0.0).collect()
    assert sorted(map(tuple, got_b0)) == sorted(map(tuple, want_b0))
    assert sorted(map(tuple, got_b0)) != sorted(map(tuple, got))

    # crash litter: a half-written refresh leaves a DOT-prefixed staging
    # dir INSIDE the index — it must be invisible to probes (Spark's
    # FileIndex skips dot paths), must not confuse the next refresh's
    # segment numbering, and the next refresh clears it
    litter = os.path.join(inc, ".__seg=9.inprogress")
    os.makedirs(os.path.join(litter, "__bucket=0"), exist_ok=True)
    with open(os.path.join(litter, "__bucket=0", "junk.parquet"), "w") as f:
        f.write("not parquet")
    still = C.bm25_search_indexed(spark, inc, terms, k=10).collect()
    assert sorted(map(tuple, still)) == sorted(map(tuple, got))
    C.refresh_bm25_index(
        spark.createDataFrame([(8, "spark anew")], "doc_id long, text string"),
        inc,
    )
    assert not os.path.exists(litter)
    segs2 = sorted(e for e in os.listdir(inc) if e.startswith("__seg="))
    assert segs2 == ["__seg=0", "__seg=1", "__seg=2"]


def test_bm25_qtf_weighting(spark, tmp_path):
    """use_qtf=True applies Robertson's query-term-frequency weighting:
    a doubled query term contributes twice its score; with all-unique
    terms qtf degenerates to the default set semantics; and the stored
    index probe under qtf equals the live search under qtf."""
    rows = [
        (1, "spark window merge spark spark engine"),
        (2, "window functions rank over partitions window"),
        (3, "merge into target when matched update"),
        (5, "spark merge spark window shuffle exchange"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "window", "merge"]
    dup = terms + ["spark"]

    base = {r.doc_id: r.bm25 for r in C.bm25_search(d, terms, k=10).collect()}
    # unique terms: qtf on == qtf off
    same = {
        r.doc_id: r.bm25
        for r in C.bm25_search(d, terms, k=10, use_qtf=True).collect()
    }
    assert same == base
    # doubled 'spark': its per-doc contribution doubles exactly
    scored = {
        (r.doc_id, r.term): r.score for r in C.bm25_scores(d).collect()
    }
    qtf = {
        r.doc_id: r.bm25
        for r in C.bm25_search(d, dup, k=10, use_qtf=True).collect()
    }
    for doc in base:
        extra = scored.get((doc, "spark"), 0.0)
        assert qtf[doc] == pytest.approx(base[doc] + extra, abs=2e-6)
    # duplicates still collapse when qtf is off (set semantics)
    off = {r.doc_id: r.bm25 for r in C.bm25_search(d, dup, k=10).collect()}
    assert off == base
    # stored-index probe under qtf == live search under qtf
    path = str(tmp_path / "bm25_qtf")
    C.build_bm25_index(d, path, n_buckets=8)
    got = C.bm25_search_indexed(spark, path, dup, k=10, use_qtf=True)
    assert sorted((r.doc_id, r.bm25) for r in got.collect()) == sorted(
        qtf.items()
    )


def test_bm25_compact_preserves_probe(spark, tmp_path):
    """compact_bm25_index merges every segment into one WITHOUT
    re-tokenizing (stored raw postings are simply re-bucketed): the
    probe answers identically before and after, the segment count
    drops to 1, the summed stats sidecar is exact, and a subsequent
    refresh keeps working (the compaction is just another state of the
    same format)."""
    import json
    import os

    base = spark.createDataFrame(
        [(1, "spark window merge engine"),
         (2, "window functions rank over partitions")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "merge into target when matched")],
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame(
        [(4, "spark merge shuffle exchange window")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bm25c")
    C.build_bm25_index(base, path, n_buckets=8)
    C.refresh_bm25_index(b2, path)
    C.refresh_bm25_index(b3, path)
    terms = ["spark", "window", "merge"]
    before = sorted(
        map(tuple, C.bm25_search_indexed(spark, path, terms, k=10).collect())
    )
    stats = C.compact_bm25_index(spark, path)
    assert stats == {"n_docs": 4, "total_len": 4 + 5 + 5 + 5}
    segs = [e for e in os.listdir(path) if e.startswith("__seg=")]
    assert segs == ["__seg=0"]
    with open(os.path.join(path, "__seg=0", "_bm25_seg.json")) as f:
        assert json.load(f) == stats
    after = sorted(
        map(tuple, C.bm25_search_indexed(spark, path, terms, k=10).collect())
    )
    assert after == before
    # refresh still works post-compaction
    C.refresh_bm25_index(
        spark.createDataFrame([(5, "spark spark window")],
                              "doc_id long, text string"),
        path,
    )
    grown = C.bm25_search_indexed(spark, path, terms, k=10).collect()
    assert {r.doc_id for r in grown} >= {r[0] for r in before}


def test_bm25_refresh_auto_compacts_at_threshold(spark, tmp_path):
    """refresh_bm25_index(auto_compact_at=N) turns the measured
    compaction policy into a mechanism: below the threshold refresh
    appends segments untouched; the refresh that brings the count to
    >= N compacts in-line back to one segment, the probe answers
    identically across the trigger, and later refreshes keep
    appending from __seg=1."""
    import os

    def one(i):
        return spark.createDataFrame(
            [(i, f"spark window merge doc{i}")], "doc_id long, text string"
        )

    path = str(tmp_path / "bm25ac")
    C.build_bm25_index(one(0), path, n_buckets=8)
    C.refresh_bm25_index(one(1), path, auto_compact_at=4)

    def segs():
        return sorted(
            e for e in os.listdir(path) if e.startswith("__seg=")
        )

    assert segs() == ["__seg=0", "__seg=1"]  # 2 < 4: untouched
    C.refresh_bm25_index(one(2), path, auto_compact_at=4)
    assert segs() == ["__seg=0", "__seg=1", "__seg=2"]
    terms = ["spark", "window", "merge"]
    stats = C.refresh_bm25_index(one(3), path, auto_compact_at=4)
    assert stats["n_docs"] == 1  # returns the APPENDED segment's stats
    assert segs() == ["__seg=0"]  # 4 >= 4: compacted in-line
    got = sorted(
        map(tuple, C.bm25_search_indexed(spark, path, terms, k=10).collect())
    )
    # identical answers to a never-compacted twin with the same content
    twin = str(tmp_path / "bm25ac_twin")
    C.build_bm25_index(one(0), twin, n_buckets=8)
    for i in (1, 2, 3):
        C.refresh_bm25_index(one(i), twin)
    want = sorted(
        map(tuple, C.bm25_search_indexed(spark, twin, terms, k=10).collect())
    )
    assert got == want
    # refresh keeps working after the in-line compaction
    C.refresh_bm25_index(one(4), path, auto_compact_at=4)
    assert segs() == ["__seg=0", "__seg=1"]
    grown = C.bm25_search_indexed(spark, path, terms, k=10).collect()
    assert {r.doc_id for r in grown} == {0, 1, 2, 3, 4}


def test_dsir_importance_ranks_target_like_docs(spark):
    """DSIR (Xie et al. 2023): docs sharing the target domain's feature
    profile must score higher than off-domain docs. Planted corpus:
    target = lang 'en' docs about one topic; a non-target doc written
    in the same style must outrank a non-target doc in a foreign
    style."""
    from dwh_with_dask_spark.operators.curation import dsir_importance
    from pyspark.sql import functions as F

    rows = [
        (1, "en", "spark engines process big data tables with fast joins"),
        (2, "en", "data tables and joins make spark engines process fast"),
        (3, "en", "big data joins process tables in spark engines"),
        (4, "xx", "spark engines process data tables with joins quickly"),
        (5, "xx", "le chat dort sur le tapis pres de la porte rouge"),
        (6, "xx", "der hund schlaeft unter dem tisch neben der tuer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance(df, F.col("lang") == "en").collect()
    }
    assert set(w) == {1, 2, 3, 4, 5, 6}
    # on-domain non-target doc outranks both off-domain docs
    assert w[4] > w[5] and w[4] > w[6]
    # target docs themselves score at least as high as the off-domain ones
    assert min(w[1], w[2], w[3]) > max(w[5], w[6])


def test_dsir_resample_steers_toward_target(spark):
    """dsir_resample (round 14): a PPS draw on exp(dsir_logw) must
    raise the target-profile share above its corpus share, and must
    equal the explicit dsir_importance -> log_weighted_sample
    composition bit-for-bit. Corpus: 30 'style A' docs (10 of them the
    en target) + 30 'style B' docs."""
    import itertools

    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.curation import (
        dsir_importance,
        dsir_resample,
        log_weighted_sample,
    )

    a_words = ["spark", "data", "join", "table", "engine", "query"]
    b_words = ["chat", "chien", "porte", "table2", "rouge", "nuit"]
    rows = []
    for i in range(30):
        perm = list(itertools.islice(itertools.cycle(a_words), i % 6, i % 6 + 6))
        rows.append((i, "en" if i < 10 else "xx", " ".join(perm * 2)))
    for i in range(30, 60):
        perm = list(itertools.islice(itertools.cycle(b_words), i % 6, i % 6 + 6))
        rows.append((i, "xx", " ".join(perm * 2)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    out = dsir_resample(df, F.col("lang") == "en", k=20)
    got = [(r["doc_id"], r["dsir_logw"]) for r in out.collect()]
    assert len(got) == 20
    # steering: style-A docs (ids < 30) carry the target profile; their
    # share in the sample must exceed their 50% corpus share
    a_share = sum(1 for i, _ in got if i < 30) / 20
    assert a_share > 0.5, f"resample did not steer: A share {a_share}"

    # equals the explicit composition
    wts = dsir_importance(df, F.col("lang") == "en")
    joined = df.join(wts.select("doc_id", "dsir_logw"), "doc_id")
    want = [
        (r["doc_id"], r["dsir_logw"])
        for r in log_weighted_sample(
            joined, 20, "dsir_logw", "doc_id", salt="dsir"
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_ngram_decontaminate_matches_python_twin(spark):
    """ngram_decontaminate equals an exact hashlib twin on a corpus with
    planted eval->train quotation: shared n-grams are counted per train
    doc, docs with zero overlap are absent, share_frac is exact."""
    import hashlib
    import random

    from dwh_with_dask_spark.operators.curation import ngram_decontaminate

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
    # plant quotations: doc i copies a 8-token run from doc i+1 (splits
    # are md5-assigned, so some of these straddle train/eval)
    for i in range(0, 50, 5):
        toks = docs[i + 1].split()
        if len(toks) >= 8:
            docs[i] = docs[i] + " " + " ".join(toks[:8])
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.id: (r.n_shared, r.n_grams, r.share_frac)
        for r in ngram_decontaminate(df, n=5).collect()
    }

    def split(i):
        return (
            "train"
            if hashlib.md5(f"{i}split".encode()).hexdigest()[:4]
            < format(int(0.90 * 65536), "04x")
            else "eval"
        )

    def grams(text, n=5):
        toks = text.lower().split()
        return {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }

    ev = set()
    for i, t in docs.items():
        if split(i) != "train":
            ev |= grams(t)
    want = {}
    for i, t in docs.items():
        if split(i) != "train":
            continue
        g = grams(t)
        shared = len(g & ev)
        if shared:
            want[i] = (shared, len(g), shared / len(g))
    assert got == want
    assert want, "fixture must actually plant cross-split overlap"


def test_token_budget_sample_dict_budgets_and_twin(spark):
    """token_budget_sample: per-source dict budgets (absent sources
    excluded), docs taken in md5-draw order, kept iff the running
    total INCLUDING the doc stays within budget — equals a hashlib
    twin exactly."""
    import hashlib

    from dwh_with_dask_spark.operators.curation import token_budget_sample

    rows = []
    for i in range(40):
        src = ["web", "code", "books"][i % 3]
        rows.append((i, src, " ".join(f"t{j}" for j in range(2 + i % 7))))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"web": 25, "code": 12}
    got = {
        r.id: (r.source, r.n_tokens, r.cum_tokens)
        for r in token_budget_sample(df, budgets).collect()
    }

    def draw(i):
        return hashlib.md5(f"{i}tbudget".encode()).hexdigest()[:8]

    want = {}
    for src, cap in budgets.items():
        docs = sorted(
            ((draw(i), i, len(t.split())) for i, s, t in rows if s == src),
        )
        cum = 0
        for d, i, n in docs:
            cum += n
            if cum <= cap:
                want[i] = (src, n, cum)
    assert got == want
    assert not any(s == "books" for s, _, _ in got.values())
    # every budget is actually binding (fixture sanity)
    assert {s for s, _, _ in got.values()} == {"web", "code"}
