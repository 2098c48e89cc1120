"""Unit tests for the analytics operators: gap fill / interpolation,
funnel, deletion-neighborhood fuzzy join, profiling, winsorization,
bigram LM scoring. (Their end-to-end DuckDB differentials run in
test_driver_contract.py via plans/analytics.py.)"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.funnel import funnel_counts, funnel_reach
from dwh_with_dask_spark.operators.joins import _deletion_variants, fuzzy_join
from dwh_with_dask_spark.operators.profile import profile_table, winsorize_agg
from dwh_with_dask_spark.operators.textstats import bigram_logprob_scores
from dwh_with_dask_spark.operators.timeseries import gap_fill


def _ts(minute: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, hour, minute)


# ---------------------------------------------------------------- gap fill


@pytest.fixture(scope="module")
def series_df(spark):
    # key 'a': observations in hours 0, 3 (hole at 1, 2); key 'b': hour 1 only
    rows = [
        ("a", _ts(0, 0), 10.0),
        ("a", _ts(30, 0), 20.0),  # same bucket as above -> avg 15.0
        ("a", _ts(0, 3), 40.0),
        ("b", _ts(0, 1), 7.0),
    ]
    return spark.createDataFrame(rows, "key_in string, t timestamp, v double")


def test_gap_fill_locf(series_df):
    out = gap_fill(
        series_df, "key_in", "t", "v", unit="hour", method="locf",
        value_decimals=2,
    )
    got = {
        (r.key, r.bucket.hour): (r.value, r.filled) for r in out.collect()
    }
    assert got[("a", 0)] == (15.0, False)
    assert got[("a", 1)] == (15.0, True)  # carried forward
    assert got[("a", 2)] == (15.0, True)
    assert got[("a", 3)] == (40.0, False)
    assert got[("b", 1)] == (7.0, False)
    assert len(got) == 5  # spine bounded per key, no cross-key spill


def test_gap_fill_linear(series_df):
    out = gap_fill(
        series_df, "key_in", "t", "v", unit="hour", method="linear",
        value_decimals=2,
    )
    got = {(r.key, r.bucket.hour): r.value for r in out.collect()}
    # 15 -> 40 over 3 hours: 1/3 and 2/3 of the way
    assert got[("a", 1)] == pytest.approx(15.0 + 25.0 / 3)
    assert got[("a", 2)] == pytest.approx(15.0 + 50.0 / 3)
    assert got[("a", 0)] == 15.0 and got[("a", 3)] == 40.0


# ------------------------------------------------------------------ funnel


@pytest.fixture(scope="module")
def funnel_df(spark):
    rows = [
        # u1 completes a->b->c in order
        (1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(2), "c"),
        # u2 does b BEFORE a: b must not count until after a
        (2, _ts(0), "b"), (2, _ts(1), "a"), (2, _ts(2), "b"),
        # u3 only reaches a; the later c (no b) must not count
        (3, _ts(0), "a"), (3, _ts(5), "c"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_ordering(funnel_df):
    out = {
        r.step: r.n_keys
        for r in funnel_counts(funnel_df, ["a", "b", "c"]).collect()
    }
    assert out == {"a": 3, "b": 2, "c": 1}


def test_funnel_reach_takes_first_qualifying(funnel_df):
    reach = {
        r.key: r.reach
        for r in funnel_reach(funnel_df, ["a", "b", "c"]).collect()
    }
    assert reach[2][0] == _ts(1)  # a at t1, not the pre-a b
    assert reach[2][1] == _ts(2)  # the post-a b
    assert reach[2][2] is None
    assert reach[3] == [_ts(0), None, None]


def test_funnel_rejects_repeated_steps(funnel_df):
    with pytest.raises(ValueError):
        funnel_counts(funnel_df, ["a", "a"])


def test_funnel_within_window(spark):
    rows = [
        # u1: b 1 minute after a -> inside any window
        (1, _ts(0), "a"), (1, _ts(1), "b"),
        # u2: b 10 minutes after a -> outside a 5-minute window;
        # the later b at +3min from... none. stays unconverted
        (2, _ts(0), "a"), (2, _ts(10), "b"),
        # u3: first-touch anchoring — a at t0, b at t8 (out of window
        # even though a second a at t5 would put it in range)
        (3, _ts(0), "a"), (3, _ts(5), "a"), (3, _ts(8), "b"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.step: r.n_keys
        for r in funnel_counts(df, ["a", "b"], within="5 MINUTES").collect()
    }
    assert out == {"a": 3, "b": 1}


# -------------------------------------------------------------- fuzzy join


def test_deletion_variants_counts(spark):
    df = spark.range(1).select(
        _deletion_variants(F.lit("abc"), 2).alias("v")
    )
    got = sorted(df.collect()[0].v)
    # "abc", 3 single deletions, 3 distinct double deletions
    assert got == ["a", "ab", "abc", "ac", "b", "bc", "c"]


def test_fuzzy_join_complete_recall_both_ends_edited(spark):
    # cold tub / gold tube: first AND last chars differ (prefix+suffix
    # blocking both fail here) yet lev = 2 -> deletion index must find it
    left = spark.createDataFrame([("cold tub",)], "l string")
    right = spark.createDataFrame([("gold tube",), ("red bolt",)], "r string")
    got = [(r.l, r.r, r.dist) for r in fuzzy_join(left, right, "l", "r", 2).collect()]
    assert got == [("cold tub", "gold tube", 2)]


def test_fuzzy_join_no_false_positives(spark):
    left = spark.createDataFrame([("abcdef",)], "l string")
    right = spark.createDataFrame([("abcxyz",)], "r string")  # lev 3
    assert fuzzy_join(left, right, "l", "r", 2).count() == 0


# -------------------------------------------------------------- profiling


def test_profile_table_nulls_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (4, "y")], "a long, b string"
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["a"].n_rows == 3 and got["a"].n_nulls == 0
    assert got["a"].n_distinct == 3
    assert (got["a"].min_val, got["a"].max_val) == ("1", "4")
    assert got["b"].n_nulls == 1 and got["b"].n_distinct == 2
    assert got["b"].min_val == "x"


def test_winsorize_clamps_outlier(spark):
    rows = [("g", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]]
    df = spark.createDataFrame(rows, "grp_in string, v double")
    r = winsorize_agg(df, "grp_in", "v", 0.0, 0.9).collect()[0]
    # p90 of 1..9,1000 (linear interp) = 9 + 0.1*991 = 108.1
    assert r.hi == pytest.approx(108.1)
    assert r.mean_winsorized < r.mean_raw
    assert r.mean_winsorized == pytest.approx((sum(range(1, 10)) + 108.1) / 10)


# ------------------------------------------------------------- bigram LM


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b" x2 and "a c": contexts {a}, V=1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_logprob_scores(df).collect()}
    # p(b|a) = (2+1)/(3+1); p(c|a) = (1+1)/(3+1)
    assert got[1].avg_logprob == pytest.approx(round(math.log(3 / 4), 6))
    assert got[3].avg_logprob == pytest.approx(round(math.log(2 / 4), 6))
    assert got[1].n_bigrams == 1
    assert 4 not in got  # single-token doc has no bigrams


# -------------------------------------------------- quantile sketch


def test_bottomk_sample_is_mergeable(spark):
    from dwh_with_dask_spark.operators.sketches import bottomk_sample

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3 % 997).cast("double").alias("v")
    )
    half1 = df.filter(F.col("id") < 500)
    half2 = df.filter(F.col("id") >= 500)
    whole = {r.value for r in bottomk_sample(df, "v", "id", 50).collect()}
    merged_input = bottomk_sample(half1, "v", "id", 50).unionByName(
        bottomk_sample(half2, "v", "id", 50)
    )
    merged = {
        r.value
        for r in merged_input.orderBy("__pri").limit(50).collect()
    }
    assert whole == merged


def test_quantile_sketch_tracks_exact(spark):
    from dwh_with_dask_spark.operators.sketches import quantile_sketch

    df = spark.range(10000).select(
        F.col("id"), F.col("id").cast("double").alias("v")
    )
    est = {r.p: r.est for r in quantile_sketch(df, "v", "id", k=1000).collect()}
    # uniform 0..9999: exact quantile q = 9999*p; k=1000 sample error
    # bound ~ 3/sqrt(k) of the range with overwhelming probability
    for p, e in est.items():
        assert abs(e - 9999 * p) < 9999 * 0.1


# -------------------------------------------------- webdataset export


def test_export_webdataset_deterministic_and_complete(spark, tmp_path):
    import hashlib
    import tarfile

    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.sinks import export_webdataset
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()

    def run(sub):
        out = str(tmp_path / sub)
        m = export_webdataset(
            docs, out, n_shards=4, meta_cols=("lang", "source")
        ).collect()
        return out, sorted((r.shard, r.n_samples, r.sha256) for r in m)

    out1, m1 = run("a")
    out2, m2 = run("b")
    assert m1 == m2  # byte-identical re-run (zeroed tar metadata)
    assert {s for s, _, _ in m1} == {0, 1, 2, 3}
    assert sum(n for _, n, _ in m1) == n_docs

    # readback: every sample's .txt payload matches the source text
    texts = {str(r.doc_id): (r.text or "") for r in docs.collect()}
    seen = 0
    for shard, _, sha in m1:
        p = f"{out1}/shard-{shard:05d}.tar"
        with open(p, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == sha
        with tarfile.open(p) as tar:
            for member in tar.getmembers():
                if member.name.endswith(".txt"):
                    rid = member.name[:-4]
                    got = tar.extractfile(member).read().decode("utf-8")
                    assert got == texts[rid]
                    seen += 1
    assert seen == n_docs


# ------------------------------------------------------ asof tolerance


def test_asof_join_tolerance_nulls_stale_matches(spark):
    from dwh_with_dask_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, _ts(0, 10)), (1, _ts(0, 23))], "k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(0, 9), "fresh")], "k long, rt timestamp, v string"
    )
    out = {
        r.lt.hour: r.v
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            tolerance="2 HOURS",
        ).collect()
    }
    assert out[10] == "fresh"   # 1h-old match inside the cap
    assert out[23] is None      # 14h-old match nulled out


# -------------------------------------------------------------- dq checks


def test_dq_checks_detects_violations(spark):
    from dwh_with_dask_spark.operators.dq import Rule, dq_checks

    df = spark.createDataFrame(
        [(1, "A", 5.0), (1, "B", -2.0), (2, None, 50.0), (3, "Z", None)],
        "k long, status string, v double",
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    out = {
        r.rule: (r.violations, r.passed)
        for r in dq_checks(
            df,
            [
                Rule("unique", "k"),
                Rule("not_null", "status"),
                Rule("in_set", "status", values=["A", "B"]),
                Rule("in_range", "v", lo=0.0, hi=10.0),
                Rule(
                    "predicate", "v", name="pred",
                    predicate=F.col("v") > F.col("k"),
                ),
                Rule("foreign_key", "k", name="fk", ref=ref, ref_col="rk"),
            ],
        ).collect()
    }
    assert out["unique:k"] == (1, False)        # k=1 twice
    assert out["not_null:status"] == (1, False)
    assert out["in_set:status"] == (2, False)   # null + 'Z'
    assert out["in_range:v"] == (3, False)      # -2.0, 50.0, null
    # predicate v > k: rows (1,5.0) ok, (1,-2.0) bad, (2,50.0) ok,
    # (3,null) -> null predicate counts as violation
    assert out["pred"] == (2, False)
    assert out["fk"] == (1, False)              # k=3 orphan


def test_dq_checks_all_pass(spark):
    from dwh_with_dask_spark.operators.dq import Rule, dq_checks

    df = spark.createDataFrame([(1, "A"), (2, "B")], "k long, s string")
    out = dq_checks(
        df, [Rule("unique", "k"), Rule("not_null", "s")]
    ).collect()
    assert all(r.passed and r.violations == 0 for r in out)
    assert all(r.n_rows == 2 for r in out)


def test_dq_checks_empty_rules_raises(spark):
    """ADVICE r5: no rules must be a clear ValueError, not IndexError."""
    from dwh_with_dask_spark.operators.dq import dq_checks

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="no rules"):
        dq_checks(df, [])


# -------------------------------------------- webdataset round trip


def test_webdataset_datasource_roundtrip(spark, tmp_path):
    """export_webdataset -> spark.read.format('webdataset') must round
    trip every sample: same keys, same text, same metadata."""
    import json

    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.sinks import export_webdataset
    from dwh_with_dask_spark.sources.webdataset_source import (
        WebdatasetDataSource,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "wds")
    export_webdataset(docs, out, n_shards=3, meta_cols=("lang",)).collect()

    spark.dataSource.register(WebdatasetDataSource)
    back = spark.read.format("webdataset").load(out)
    rows = back.collect()
    assert len(rows) == docs.count()
    want = {str(r.doc_id): (r.text or "", r.lang) for r in docs.collect()}
    for r in rows:
        text, lang = want[r.key]
        assert r.txt == text
        assert json.loads(r.meta)["lang"] == lang
        assert r.shard.startswith("shard-") and r.shard.endswith(".tar")


# ------------------------------------------------------------------ PCA


def test_pca_matches_numpy_reference(spark):
    import numpy as np

    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.operators.pca import pca_fit, pca_project
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    comps, vals, mean = pca_fit(e, "embedding", k=4)
    x = np.asarray([r.embedding for r in e.collect()], dtype=np.float64)

    # reference full-data PCA
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    ref_vals, ref_vecs = w[order], v[:, order].T

    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(vals, ref_vals, rtol=1e-8)
    # components equal up to sign
    for got, want in zip(comps, ref_vecs):
        assert (
            np.allclose(got, want, atol=1e-6)
            or np.allclose(got, -want, atol=1e-6)
        )
    # orthonormality
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)

    # projections: per-component variance == eigenvalue
    proj = pca_project(e, comps, mean)
    y = np.asarray([r.pc for r in proj.collect()])
    assert np.allclose(y.var(axis=0, ddof=1), vals, rtol=1e-6)
    # projection of the mean-centered data has ~zero mean
    assert np.allclose(y.mean(axis=0), 0.0, atol=1e-9)


def test_pca_stable_under_repartition(spark):
    import numpy as np

    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.operators.pca import pca_fit
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    c1, v1, m1 = pca_fit(e, "embedding", k=3)
    c2, v2, m2 = pca_fit(e.repartition(11), "embedding", k=3)
    assert np.allclose(v1, v2, rtol=1e-9)
    assert np.allclose(np.abs(c1), np.abs(c2), atol=1e-9)


def test_ridge_probe_matches_numpy_closed_form(spark):
    import numpy as np

    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.operators.pca import ridge_fit, ridge_r2
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    w, b, n = ridge_fit(e, "embedding", "label", l2=1e-2)

    rows = e.select("embedding", "label").collect()
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    y = np.asarray([r.label for r in rows], dtype=np.float64)
    a = np.hstack([x, np.ones((len(x), 1))])
    reg = 1e-2 * np.eye(a.shape[1]); reg[-1, -1] = 0.0
    ref = np.linalg.solve(a.T @ a + reg, a.T @ y)

    assert n == len(x)
    assert np.allclose(w, ref[:-1], rtol=1e-8, atol=1e-10)
    assert np.isclose(b, ref[-1], rtol=1e-8)

    r2 = ridge_r2(e, w, b, "embedding", "label")
    yhat = x @ ref[:-1] + ref[-1]
    ref_r2 = 1 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert np.isclose(r2, ref_r2, rtol=1e-8)
    # a scalar regression onto a CATEGORICAL label is weak by
    # construction (clusters aren't ordinally arranged); the test's
    # point is the exactness above — just require better than nothing
    assert r2 > 0.0


def test_webdataset_multimodal_payload_roundtrip(spark, tmp_path):
    """Binary payload columns export as extra members and come back as
    bytes via the DataSource's bin/bin_suffix columns."""
    from dwh_with_dask_spark.sinks import export_webdataset
    from dwh_with_dask_spark.sources.webdataset_source import (
        WebdatasetDataSource,
    )

    rows = [
        (1, "caption one", bytes([137, 80, 78, 71, 1, 2, 3])),
        (2, "caption two", bytes(range(64))),
        (3, "no image", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, content binary")
    out = str(tmp_path / "mmwds")
    export_webdataset(
        df, out, n_shards=2, payload_cols={"content": "png"}
    ).collect()

    spark.dataSource.register(WebdatasetDataSource)
    back = {r.key: r for r in spark.read.format("webdataset").load(out).collect()}
    assert len(back) == 3
    for rid, text, blob in rows:
        r = back[str(rid)]
        assert r.txt == text
        if blob is None:
            assert r.bin is None and r.bin_suffix is None
        else:
            assert bytes(r.bin) == blob and r.bin_suffix == "png"


def test_webdataset_two_payloads_roundtrip(spark, tmp_path):
    """ADVICE r5: a two-payload export must not lose members on
    readback — every binary member surfaces in the bins map, and
    bin/bin_suffix carry the first member in tar order."""
    from dwh_with_dask_spark.sinks import export_webdataset
    from dwh_with_dask_spark.sources.webdataset_source import (
        WebdatasetDataSource,
    )

    rows = [
        (1, "pair", bytes([1, 2, 3]), bytes([9, 9])),
        (2, "img only", bytes([4, 5]), None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, img binary, aud binary"
    )
    out = str(tmp_path / "wds2")
    export_webdataset(
        df, out, n_shards=1, payload_cols={"img": "png", "aud": "wav"}
    ).collect()

    spark.dataSource.register(WebdatasetDataSource)
    back = {r.key: r for r in spark.read.format("webdataset").load(out).collect()}
    r1 = back["1"]
    assert {k: bytes(v) for k, v in r1.bins.items()} == {
        "png": bytes([1, 2, 3]),
        "wav": bytes([9, 9]),
    }
    r2 = back["2"]
    assert {k: bytes(v) for k, v in r2.bins.items()} == {"png": bytes([4, 5])}


def test_webdataset_rejects_colliding_suffixes(spark, tmp_path):
    from dwh_with_dask_spark.sinks import export_webdataset

    df = spark.createDataFrame([(1, "t", b"x", b"y")],
                               "doc_id long, text string, a binary, b binary")
    with pytest.raises(ValueError, match="distinct"):
        export_webdataset(df, str(tmp_path / "w"), 1,
                          payload_cols={"a": "png", "b": "png"})
    with pytest.raises(ValueError, match="txt"):
        export_webdataset(df, str(tmp_path / "w"), 1,
                          payload_cols={"a": "txt"})


# ----------------------------------------------------- seeded fuzzing


def test_funnel_fuzz_vs_python_reference(spark):
    """200 random users x random event streams: the distributed fold
    must equal a direct python implementation of the min-scan funnel
    semantics (one Spark job for all cases). Step names are chosen so
    lexicographic order is ADVERSE to funnel order (later steps sort
    earlier) — ties on ts must resolve by step index, not type string
    (ADVICE r5). Coarse timestamp granularity forces many exact ties."""
    import random

    rng = random.Random(42)
    steps = ["zz_first", "mm_second", "dd_third", "aa_fourth"]
    rows = []
    for u in range(200):
        for i in range(rng.randint(0, 12)):
            rows.append(
                (u, _ts(rng.randint(0, 5), rng.randint(0, 3)),
                 rng.choice(steps + ["noise"]))
            )
    if not rows:
        rows = [(0, _ts(0), steps[0])]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    got = {r.key: list(r.reach) for r in funnel_reach(df, steps).collect()}

    # python reference: sort by (ts, STEP INDEX); first qualifying fill
    ref: dict[int, list] = {}
    by_user: dict[int, list] = {}
    for u, t, s in rows:
        if s in steps:
            by_user.setdefault(u, []).append((t, s))
    for u, evs in by_user.items():
        reach = [None] * len(steps)
        for t, s in sorted(evs, key=lambda e: (e[0], steps.index(e[1]))):
            i = steps.index(s)
            if reach[i] is not None:
                continue
            if i == 0 or (reach[i - 1] is not None and t >= reach[i - 1]):
                reach[i] = t
        ref[u] = reach
    assert got == ref


def test_funnel_equal_timestamp_conversion_counts(spark):
    """ADVICE r5 repro: view@T + click@T with steps [view, click] —
    'click' < 'view' lexicographically, so a struct(t, s) sort would
    fold click first and drop the conversion. The oracle's `>=`
    min-scan counts it; the fold must too."""
    t = _ts(5)
    df = spark.createDataFrame(
        [(1, t, "view"), (1, t, "click")],
        "user_id long, ts timestamp, event_type string",
    )
    reach = funnel_reach(df, ["view", "click"]).collect()[0].reach
    assert list(reach) == [t, t]
    out = {r.step: r.n_keys for r in funnel_counts(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_fuzzy_join_fuzz_complete_vs_bruteforce(spark):
    """Random short strings: the deletion-index join must output
    EXACTLY the brute-force levenshtein<=2 pairs."""
    import random

    rng = random.Random(7)
    alphabet = "abcde"
    words = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(60)
    })
    left = spark.createDataFrame([(w,) for w in words[:30]], "l string")
    right = spark.createDataFrame([(w,) for w in words[30:]], "r string")

    got = {(r.l, r.r) for r in fuzzy_join(left, right, "l", "r", 2).collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b)
        for a in words[:30]
        for b in words[30:]
        if lev(a, b) <= 2
    }
    assert got == want


def test_gap_fill_fuzz_vs_python_reference(spark):
    """Random sparse hourly series: locf and linear fills must equal a
    direct python densification of the same buckets."""
    import random

    rng = random.Random(11)
    rows = []
    for key in ["a", "b", "c", "d"]:
        hours = sorted(rng.sample(range(48), rng.randint(1, 10)))
        for h in hours:
            rows.append((key, _ts(0, 0).replace(hour=h % 24, day=1 + h // 24),
                         float(rng.randint(0, 100))))
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")

    # python reference over the same (key, hour-bucket) means
    from collections import defaultdict

    series = defaultdict(dict)
    agg = defaultdict(list)
    for k, t, v in rows:
        agg[(k, t)].append(v)
    for (k, t), vs in agg.items():
        series[k][t] = sum(vs) / len(vs)

    import datetime as dt

    for method in ("locf", "linear"):
        got = {
            (r.key, r.bucket): (r.value, r.filled)
            for r in gap_fill(df, "k", "t", "v", "hour", method=method).collect()
        }
        want = {}
        for k, pts in series.items():
            ts_sorted = sorted(pts)
            lo, hi = ts_sorted[0], ts_sorted[-1]
            t = lo
            while t <= hi:
                if t in pts:
                    want[(k, t)] = (pts[t], False)
                else:
                    prev_t = max(x for x in ts_sorted if x < t)
                    next_t = min(x for x in ts_sorted if x > t)
                    if method == "locf":
                        v = pts[prev_t]
                    else:
                        frac = (t - prev_t) / (next_t - prev_t)
                        v = pts[prev_t] + (pts[next_t] - pts[prev_t]) * frac
                    want[(k, t)] = (v, True)
                t += dt.timedelta(hours=1)
        assert set(got) == set(want)
        for kk in want:
            assert got[kk][1] == want[kk][1]
            assert got[kk][0] == pytest.approx(want[kk][0], abs=1e-9)


def test_winsorize_fuzz_vs_numpy(spark):
    """Random groups: exact percentile clamp + means must match numpy's
    linear-interpolation quantiles and the clamped mean."""
    import random

    import numpy as np

    rng = random.Random(3)
    rows = [
        (f"g{g}", float(rng.randint(0, 10_000)) / 7.0)
        for g in range(5)
        for _ in range(rng.randint(5, 80))
    ]
    df = spark.createDataFrame(rows, "grp_in string, v double")
    got = {r.grp: r for r in winsorize_agg(df, "grp_in", "v", 0.1, 0.9).collect()}

    from collections import defaultdict

    per = defaultdict(list)
    for g, v in rows:
        per[g].append(v)
    for g, vs in per.items():
        x = np.asarray(vs)
        lo = np.quantile(x, 0.1)  # numpy default = linear interpolation
        hi = np.quantile(x, 0.9)
        assert got[g].lo == pytest.approx(lo, rel=1e-12)
        assert got[g].hi == pytest.approx(hi, rel=1e-12)
        assert got[g].mean_winsorized == pytest.approx(
            np.clip(x, lo, hi).mean(), rel=1e-9
        )
        assert got[g].n == len(vs)


def test_profile_fuzz_vs_pandas(spark):
    """Random frame with nulls: profile counts must match pandas."""
    import random

    import pandas as pd

    rng = random.Random(9)
    pdf = pd.DataFrame(
        {
            "a": [rng.choice([None, rng.randint(0, 20)]) for _ in range(300)],
            "b": [rng.choice([None, "x", "y", "z"]) for _ in range(300)],
        }
    )
    df = spark.createDataFrame(pdf.astype({"a": "Int64"}))
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["a"].n_nulls == int(pdf["a"].isna().sum())
    assert got["a"].n_distinct == pdf["a"].dropna().nunique()
    assert got["b"].n_distinct == pdf["b"].dropna().nunique()
    assert got["a"].n_rows == 300
    assert got["a"].min_val == str(int(pdf["a"].dropna().min()))
    assert got["b"].max_val == str(pdf["b"].dropna().max())


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from dwh_with_dask_spark.operators.graph import pagerank

    edges = [
        ("a", "x", 2.0), ("a", "y", 1.0), ("b", "x", 1.0),
        ("c", "y", 3.0), ("c", "z", 1.0), ("d", "z", 2.0),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r.node: r.rank for r in pagerank(e, weight="w", iters=5).collect()}

    # numpy twin: identical undirected mirror + (1-d)/N + d*sum updates
    und = edges + [(d_, s, w) for s, d_, w in edges]
    nodes = sorted({s for s, _, _ in und} | {d_ for _, d_, _ in und})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, _, w in und:
        outw[idx[s]] += w
    p = np.zeros((n, n))  # p[dst, src]
    for s, d_, w in und:
        p[idx[d_], idx[s]] += w / outw[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        r = 0.15 / n + 0.85 * (p @ r)
    want = {nodes[i]: r[i] for i in range(n)}

    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_directed_dangling_mass(spark):
    """Directed mode: a sink node contributes nothing; every node keeps
    the (1-d)/N floor — the documented dropped-dangling-mass contract."""
    from dwh_with_dask_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)], "src string, dst string, w double"
    )
    got = {
        r.node: r.rank
        for r in pagerank(e, weight="w", iters=3, undirected=False).collect()
    }
    assert set(got) == {"a", "b", "c"}
    floor = 0.15 / 3
    assert abs(got["a"] - floor) < 1e-12  # nothing points at 'a'
    assert got["c"] > got["b"] > got["a"]


def test_logreg_fit_matches_numpy_twin(spark):
    import numpy as np

    from dwh_with_dask_spark.operators.pca import logreg_accuracy, logreg_fit

    rng = np.random.default_rng(11)
    n, dim = 400, 4
    x = rng.normal(size=(n, dim))
    w_true = np.array([2.0, -1.5, 0.5, 0.0])
    y = (x @ w_true + 0.3 > 0).astype(int)

    rows = [(i, [float(v) for v in x[i]], int(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>, y int")
    iters, lr, l2 = 25, 1.0, 1e-4
    w, b, n_got, loss = logreg_fit(df, "embedding", "y", iters=iters, lr=lr, l2=l2)

    # numpy twin: identical zero-init full-batch GD
    a = np.hstack([x, np.ones((n, 1))])
    wv = np.zeros(dim + 1)
    for _ in range(iters):
        z = a @ wv
        p = 1.0 / (1.0 + np.exp(-z))
        grad = a.T @ (p - y) / n
        grad[:-1] += l2 * wv[:-1]
        wv -= lr * grad

    assert n_got == n
    assert np.allclose(w, wv[:-1], atol=1e-6)
    assert abs(b - wv[-1]) < 1e-6
    acc = logreg_accuracy(df, w, b, "embedding", "y")
    assert acc > 0.9
    assert loss < 0.69  # better than the zero-weight log(2) start


def test_quality_classifier_scores_learns_weak_label(spark):
    """The distilled classifier must rank label-1 docs above label-0
    docs on average (features exclude the label's own signal) and its
    scores must be valid probabilities."""
    from dwh_with_dask_spark.plans.llm import QUERIES

    out = QUERIES["quality_classifier_scores"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert len(rows) == 500
    assert all(0.0 <= r.score <= 1.0 for r in rows)
    pos = [r.score for r in rows if r.y == 1]
    neg = [r.score for r in rows if r.y == 0]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_pagerank_and_logreg_empty_inputs(spark):
    import pytest as _pytest

    from dwh_with_dask_spark.operators.graph import pagerank
    from dwh_with_dask_spark.operators.pca import logreg_fit

    empty_e = spark.createDataFrame([], "src string, dst string, w double")
    with _pytest.raises(ValueError):
        pagerank(empty_e, weight="w", iters=2)
    empty_v = spark.createDataFrame([], "embedding array<double>, y int")
    with _pytest.raises(ValueError):
        logreg_fit(empty_v, "embedding", "y", iters=1)


def test_c4_clean_null_text_is_empty_page(spark):
    from dwh_with_dask_spark.operators.c4 import c4_clean

    d = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = c4_clean(d).collect()[0]
    assert (r.n_lines, r.n_lines_kept, r.n_sentences) == (1, 0, 0)
    assert r.c4_keep is False and r.c4_text == ""


def test_triangle_count_known_graph(spark):
    """Hand-counted graph: K4 on {1,2,3,4} (4 triangles) plus a
    pendant edge and a disconnected edge (0 triangles); duplicate,
    reversed, and self-loop edges must not change the count."""
    from dwh_with_dask_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),            # pendant
        (8, 9),            # island
        (2, 1), (3, 1),    # reversed dups
        (1, 2),            # exact dup
        (7, 7),            # self-loop
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(e).first().n_triangles == 4
    per = {
        r.node: r.n_triangles
        for r in triangle_count(e, per_node=True).collect()
    }
    # apex = smallest id of each triangle: {1,2,3},{1,2,4},{1,3,4} -> 1;
    # {2,3,4} -> 2
    assert per == {1: 3, 2: 1}
    assert sum(per.values()) == 4


def test_triangle_per_vertex_and_min_count_guard(spark):
    """per_vertex returns TRUE per-node counts (every vertex of every
    triangle — they sum to 3x the global count); min_count is the
    operator-level density guard: multi-edge rows below the threshold
    drop BEFORE the wedge join."""
    import pytest

    from dwh_with_dask_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),
        (8, 9),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    pv = {
        r.node: r.n_triangles
        for r in triangle_count(e, per_vertex=True).collect()
    }
    # K4: every vertex is in C(3,2)=3 triangles; pendant/island in none
    assert pv == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(pv.values()) == 3 * 4
    with pytest.raises(ValueError, match="mutually exclusive"):
        triangle_count(e, per_node=True, per_vertex=True)

    # min_count: the K4 edges appear twice (two "orders"), the closing
    # edge of a second triangle {5,6,7} only once -> guarded graph keeps
    # only the K4 triangles
    multi = edges * 2 + [(5, 6), (5, 7), (6, 7)]
    m = spark.createDataFrame(multi, "src long, dst long")
    assert triangle_count(m).first().n_triangles == 5  # unguarded: K4 + {5,6,7}
    assert triangle_count(m, min_count=2).first().n_triangles == 4


def test_clustering_coefficient_known_graph(spark):
    """Hand-computed coefficients: K4 vertices are fully triangulated
    (coeff 1.0); the pendant vertex 5 has degree 1 -> 0.0 by
    convention; vertex 4 (K4 + pendant) has deg 4, T=3 ->
    2*3/(4*3) = 0.5."""
    from dwh_with_dask_spark.operators.graph import clustering_coefficient

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.n_triangles, r.degree, r.clustering_coeff)
        for r in clustering_coefficient(e).collect()
    }
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (3, 3, 1.0)
    assert got[4] == (3, 4, 0.5)
    assert got[5] == (0, 1, 0.0)


def test_link_prediction_hand_checked(spark):
    """Hand-computed RA / common-neighbors scores on a known graph:
    square 1-2-3-4-1 (non-edges (1,3) and (2,4), each with two
    degree-2 common neighbors -> RA = 1/2+1/2 = 1.0) plus a pendant 5
    on node 1 — (5,2) and (5,4) get RA 1/3 via common neighbor 1
    (deg 3); adjacent pairs never appear."""
    from dwh_with_dask_spark.operators.graph import link_prediction

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ra = {
        (r.node_a, r.node_b): (r.n_common, r.score)
        for r in link_prediction(e, method="ra").collect()
    }
    assert ra[(1, 3)] == (2, 1.0)  # via 2 and 4, both deg 2
    assert ra[(2, 4)] == (2, 0.833333)  # via 3 (deg 2) and 1 (deg 3)
    cn = {
        (r.node_a, r.node_b): r.n_common
        for r in link_prediction(e, method="common_neighbors").collect()
    }
    assert cn[(1, 3)] == 2 and cn[(2, 4)] == 2
    assert (2, 5) in ra and ra[(2, 5)][1] == round(1 / 3, 6)
    assert (4, 5) in ra and ra[(4, 5)][1] == round(1 / 3, 6)
    assert (3, 5) not in ra  # no common neighbor
    # no adjacent pair is ever scored
    assert not (set(ra) & {(1, 2), (2, 3), (3, 4), (1, 4), (1, 5)})
    import pytest

    with pytest.raises(ValueError, match="unknown link_prediction"):
        link_prediction(e, method="katz")


def test_link_prediction_degree_join_broadcasts(spark):
    """The documented 'broadcast-sized degree join' must be the PLAN,
    not an AQE hope (VERDICT r9 ask #8): under the node-count guard the
    degree side joins as a BroadcastHashJoin in the EXECUTED plan; with
    the guard disabled (broadcast_deg_limit=0) no broadcast hint is
    injected on that join."""
    from dwh_with_dask_spark.operators.graph import link_prediction

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    # Disable size-based auto-broadcast so the ONLY possible
    # BroadcastHashJoin is the operator's explicit hint — on a tiny
    # fixture AQE would otherwise broadcast every join and the assert
    # would pass vacuously.
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    before = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        out = link_prediction(e, method="ra")
        out.collect()  # finalize AQE before reading the executed plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        off = link_prediction(e, method="ra", broadcast_deg_limit=0)
        off.collect()
        plan_off = off._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_off, plan_off
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_two_proportion_ztest_hand_checked(spark):
    """Known counts: control 1/4 vs treatment 3/4 -> pooled p = 0.5,
    se = sqrt(.5*.5*(1/4+1/4)), z = 0.5/se = sqrt(2) exactly (all IEEE
    correctly-rounded ops). Degenerate inputs yield NULL, not a
    division-by-zero error under ANSI mode."""
    import math

    from dwh_with_dask_spark.operators.experiment import two_proportion_ztest

    rows = [("control", i < 1) for i in range(4)] + [
        ("treatment", i < 3) for i in range(4)
    ]
    u = spark.createDataFrame(rows, "arm string, converted boolean")
    r = two_proportion_ztest(u).first()
    assert (r.n_control, r.x_control) == (4, 1)
    assert (r.n_treatment, r.x_treatment) == (4, 3)
    assert r.rate_control == 0.25 and r.rate_treatment == 0.75
    assert r.abs_lift == 0.5
    assert abs(r.z_score - math.sqrt(2)) < 1e-12
    # everyone converts -> pooled p = 1 -> NULL z, no ANSI error
    allc = spark.createDataFrame(
        [("control", True), ("treatment", True)],
        "arm string, converted boolean",
    )
    r2 = two_proportion_ztest(allc).first()
    assert r2.z_score is None and r2.abs_lift is None
    # missing arm -> NULL rate and z
    onearm = spark.createDataFrame(
        [("control", True)], "arm string, converted boolean"
    )
    r3 = two_proportion_ztest(onearm).first()
    assert r3.rate_treatment is None and r3.z_score is None


def test_ab_assign_stable_and_balanced(spark):
    """md5 assignment: deterministic across evaluations, ~50/50 over
    1000 units, and independent across experiment salts."""
    from dwh_with_dask_spark.operators.experiment import ab_assign

    d = spark.range(1000).withColumn("a1", ab_assign("id", salt="e1"))
    again = spark.range(1000).withColumn("a1", ab_assign("id", salt="e1"))
    assert sorted(map(tuple, d.collect())) == sorted(
        map(tuple, again.collect())
    )
    frac = d.filter("a1 = 'treatment'").count() / 1000
    assert 0.42 <= frac <= 0.58
    both = d.withColumn("a2", ab_assign("id", salt="e2"))
    n_disagree = both.filter("a1 <> a2").count()
    assert n_disagree > 300  # independent draws disagree ~half the time


def test_population_stability_detects_shift(spark):
    """PSI discrimination: identical snapshots read ~0; a +50 location
    shift over [0,100) bins reads far past the 0.25 'shifted' bar; an
    empty-on-one-side bin is floored, never infinite."""
    from dwh_with_dask_spark.operators.profile import population_stability

    old = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    same = population_stability(old, old, "v", lo=0.0, hi=100.0, bins=10)
    rows = same.collect()
    assert sum(r.psi_term for r in rows) == 0.0
    assert all(r.n_old == r.n_new for r in rows)

    shifted = spark.range(1000).selectExpr(
        "CAST(50 + (id % 50) AS DOUBLE) AS v"
    )
    drift = population_stability(
        old, shifted, "v", lo=0.0, hi=100.0, bins=10
    ).collect()
    total = sum(r.psi_term for r in drift)
    assert total > 0.25  # standard 'shifted' threshold
    # bins 0-4 are empty on the new side: floored proportions, finite
    import math

    assert all(math.isfinite(r.psi_term) for r in drift)
    empty_new = [r for r in drift if r.n_new == 0]
    assert empty_new and all(r.p_new == 0.0001 for r in empty_new)


def test_cusum_alarm_matches_recursion(spark):
    """Hand-computed CUSUM (drift k=4) over [5,1,5,6]: the prefix-sum
    floor formulation must equal the textbook recursion
    C_t = max(0, C_{t-1} + x_t - k) -> [1, 0, 1, 3]; threshold 2.5
    alarms only the final point. Default drift = exact raw mean."""
    import datetime as _dt

    from dwh_with_dask_spark.operators.timeseries import cusum_alarm

    T = _dt.datetime
    rows = [
        ("a", T(2024, 1, d + 1), float(v))
        for d, v in enumerate([5, 1, 5, 6])
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = (
        cusum_alarm(df, "k", "ts", "v", threshold=2.5, drift=4.0)
        .orderBy("bucket")
        .collect()
    )
    assert [r.cusum for r in out] == [1.0, 0.0, 1.0, 3.0]
    assert [r.alarm for r in out] == [False, False, False, True]
    # recursion twin in python
    c, want = 0.0, []
    for v in [5, 1, 5, 6]:
        c = max(0.0, c + v - 4.0)
        want.append(c)
    assert [r.cusum for r in out] == want
    # default drift = exact raw mean (17/4 = 4.25): same shape, floored
    out2 = (
        cusum_alarm(df, "k", "ts", "v", threshold=2.0)
        .orderBy("bucket")
        .collect()
    )
    c, want2 = 0.0, []
    for v in [5, 1, 5, 6]:
        c = max(0.0, c + v - 4.25)
        want2.append(round(c, 6))
    assert [r.cusum for r in out2] == want2


def test_cuped_variance_reduction(spark):
    """CUPED on a strongly covariate-driven population (y = 0.8x +
    noise + 3·treatment): theta recovers ~0.8, the Welch standard
    error shrinks >90%, the adjusted t-stat exceeds the raw one, and
    the adjusted lift estimate lands nearer the true effect (the raw
    estimate carries covariate imbalance)."""
    import random

    from dwh_with_dask_spark.operators.experiment import cuped_welch_report

    random.seed(7)
    rows = []
    for i in range(400):
        x = round(random.uniform(0, 100), 2)
        noise = round(random.gauss(0, 5), 2)
        arm = "treatment" if i % 2 else "control"
        y = round(0.8 * x + noise + (3.0 if arm == "treatment" else 0.0), 2)
        rows.append((arm, y, x))
    u = spark.createDataFrame(rows, "arm string, metric double, covariate double")
    got = {r.variant: r for r in cuped_welch_report(u).collect()}
    raw, cup = got["raw"], got["cuped"]
    assert abs(cup.theta - 0.8) < 0.05
    assert cup.var_reduction > 0.9
    assert cup.t_stat > raw.t_stat
    assert abs(cup.lift - 3.0) < abs(raw.lift - 3.0)
    # zero-variance covariate degrades gracefully: cuped == raw numbers
    flat = spark.createDataFrame(
        [(r[0], r[1], 1.0) for r in rows],
        "arm string, metric double, covariate double",
    )
    g2 = {r.variant: r for r in cuped_welch_report(flat).collect()}
    assert g2["cuped"].theta is None
    assert g2["cuped"].t_stat == g2["raw"].t_stat


def test_mann_whitney_hand_checked(spark):
    """Textbook example with ties: control [1,2,3] vs treatment
    [2,3,4] -> midranks {1:1, 2:2.5, 3:4.5, 4:6}, U = 13 - 6 = 7,
    mu = 4.5, tie term (2^3-2)*2 = 12, var = 4.95,
    z = 2.5/sqrt(4.95). Degenerate single-arm input yields NULL z."""
    import math

    from dwh_with_dask_spark.operators.experiment import mann_whitney_u

    rows = [("control", v) for v in (1.0, 2.0, 3.0)] + [
        ("treatment", v) for v in (2.0, 3.0, 4.0)
    ]
    u = spark.createDataFrame(rows, "arm string, metric double")
    r = mann_whitney_u(u).first()
    assert (r.n_control, r.n_treatment) == (3, 3)
    assert r.u_stat == 7.0 and r.mu == 4.5
    assert r.z_score == round(2.5 / math.sqrt(4.95), 6)
    one = spark.createDataFrame([("control", 1.0)], "arm string, metric double")
    assert mann_whitney_u(one).first().z_score is None
    # all-tied values: zero variance -> NULL, not a division error
    tied = spark.createDataFrame(
        [("control", 5.0), ("treatment", 5.0)], "arm string, metric double"
    )
    assert mann_whitney_u(tied).first().z_score is None


def test_srm_check_alarms_on_broken_split(spark):
    """SRM guardrail: a clean 50/50 split stays quiet; a corrupted
    80/20 realization of a designed 50/50 alarms hard; a designed-30%
    split evaluated at f=0.3 stays quiet (the check tests the DESIGN
    fraction, not 50/50)."""
    from dwh_with_dask_spark.operators.experiment import ab_assign, srm_check

    clean = spark.range(2000).select(ab_assign("id", salt="s1").alias("arm"))
    r = srm_check(clean).first()
    assert not r.srm_alarm and abs(r.srm_z) < 3.0

    broken = spark.range(1000).selectExpr(
        "CASE WHEN id % 10 < 8 THEN 'treatment' ELSE 'control' END AS arm"
    )
    rb = srm_check(broken).first()
    assert rb.srm_alarm and rb.srm_z > 3.0
    # design fraction respected
    skewed = spark.range(3000).select(
        ab_assign("id", salt="s2", treat_frac=0.3).alias("arm")
    )
    rs = srm_check(skewed, expected_treat_frac=0.3).first()
    assert not rs.srm_alarm


def test_experiment_edge_inputs_round9_review(spark):
    """Round-9 review fixes: empty frames yield ZERO counts (not NULL),
    MWU excludes NULL metrics, PSI rejects inverted bounds."""
    import pytest

    from dwh_with_dask_spark.operators.experiment import (
        mann_whitney_u,
        srm_check,
        two_proportion_ztest,
    )
    from dwh_with_dask_spark.operators.profile import population_stability

    empty = spark.createDataFrame([], "arm string, converted boolean")
    r = two_proportion_ztest(empty).first()
    assert (r.n_control, r.x_control, r.n_treatment, r.x_treatment) == (
        0, 0, 0, 0,
    )
    e2 = spark.createDataFrame([], "arm string, metric double")
    rm = mann_whitney_u(e2).first()
    assert (rm.n_control, rm.n_treatment) == (0, 0) and rm.z_score is None
    rs = srm_check(spark.createDataFrame([], "arm string")).first()
    assert (rs.n_control, rs.n_treatment) == (0, 0)
    # NULL metrics carry no rank: result equals the non-NULL subset's
    rows = [("control", 1.0), ("control", None), ("treatment", 2.0),
            ("treatment", 3.0), ("treatment", None)]
    u = spark.createDataFrame(rows, "arm string, metric double")
    got = mann_whitney_u(u).first()
    want = mann_whitney_u(
        u.filter("metric IS NOT NULL")
    ).first()
    assert got == want and got.n_control == 1 and got.n_treatment == 2
    old = spark.range(10).selectExpr("CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="hi > lo"):
        population_stability(old, old, "v", lo=10.0, hi=0.0)


def test_benjamini_hochberg_hand_checked(spark):
    """BH step-up on known p-values, including the monotonization case
    (a later rank's smaller q must pull earlier ranks DOWN) and the
    NULL-p passthrough; plus the A&S normal-p calibration at the two
    textbook anchors (z=1.959964 -> p~0.05, z=0 -> p~1)."""
    from dwh_with_dask_spark.operators.experiment import (
        benjamini_hochberg,
        normal_two_sided_p,
    )

    rows = [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005),
            ("e", None)]
    d = spark.createDataFrame(rows, "metric string, p_value double")
    got = {
        r.metric: (r.p_rank, r.p_adj, r.reject)
        for r in benjamini_hochberg(d, alpha=0.03).collect()
    }
    # m=4 (NULL excluded); q = [0.02, 0.02, 0.04, 0.04] by rank;
    # step-up mins: ranks 1-2 -> 0.02, ranks 3-4 -> 0.04
    assert got["d"] == (1, 0.02, True)
    assert got["a"] == (2, 0.02, True)
    assert got["c"] == (3, 0.04, False)
    assert got["b"] == (4, 0.04, False)
    assert got["e"] == (None, None, False)

    # monotonization: rank 3's q=0.028 caps ranks 1-2's q=0.04
    d2 = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.021), ("d", 0.9)],
        "metric string, p_value double",
    )
    adj = {
        r.metric: round(r.p_adj, 9)
        for r in benjamini_hochberg(d2, alpha=0.05).collect()
    }
    assert adj == {"a": 0.028, "b": 0.028, "c": 0.028, "d": 0.9}

    # p-value calibration (A&S 26.2.17, |err| < 7.5e-8)
    pz = spark.createDataFrame(
        [(1.959964,), (0.0,), (None,)], "z double"
    ).select(normal_two_sided_p(F.col("z")).alias("p")).collect()
    assert abs(pz[0].p - 0.05) < 1e-5
    assert abs(pz[1].p - 1.0) < 1e-6
    assert pz[2].p is None


def test_correction_methods_holm_and_by(spark):
    """Holm step-down and Benjamini-Yekutieli on the same known
    p-values as the BH hand-check: Holm's running MAX of p*(m-i+1)
    gives [0.02, 0.03, 0.06, 0.06] (FWER — stricter than BH's
    [0.02, 0.02, 0.04, 0.04]); BY inflates BH by the harmonic sum
    c(4) = 25/12. Unknown methods raise."""
    from dwh_with_dask_spark.operators.experiment import benjamini_hochberg

    d = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        "metric string, p_value double",
    )
    holm = {
        r.metric: (r.p_rank, round(r.p_adj, 9), r.reject)
        for r in benjamini_hochberg(d, alpha=0.05, method="holm").collect()
    }
    assert holm["d"] == (1, 0.02, True)
    assert holm["a"] == (2, 0.03, True)
    assert holm["c"] == (3, 0.06, False)
    assert holm["b"] == (4, 0.06, False)  # monotone: capped by rank 3

    c4 = 1.0 + 0.5 + 1.0 / 3.0 + 0.25  # 25/12
    by = {
        r.metric: r.p_adj
        for r in benjamini_hochberg(d, method="by").collect()
    }
    assert by["d"] == pytest.approx(0.005 * 4 * c4 / 1, rel=1e-6)
    assert by["a"] == pytest.approx(0.005 * 4 * c4 / 1, rel=1e-6)  # min'd
    assert by["c"] == pytest.approx(0.03 * 4 * c4 / 3, rel=1e-6)
    # BY is uniformly more conservative than BH
    bh = {
        r.metric: r.p_adj for r in benjamini_hochberg(d).collect()
    }
    assert all(by[m] >= bh[m] for m in bh)

    with pytest.raises(ValueError, match="unknown correction"):
        benjamini_hochberg(d, method="bonferroni")


def test_msprt_hand_computed_and_degenerate(spark):
    """mSPRT always-valid p on known counters: control 10/100 vs
    treatment 30/100 with tau=0.1 — Lambda computed by hand in
    IEEE doubles; a strong effect rejects while a null split reads
    p ~ 1; degenerate inputs yield NULLs and reject=false."""
    import math

    from dwh_with_dask_spark.operators.experiment import msprt_always_valid

    def units(nc, xc, nt, xt):
        rows = [("control", 1)] * xc + [("control", 0)] * (nc - xc)
        rows += [("treatment", 1)] * xt + [("treatment", 0)] * (nt - xt)
        return spark.createDataFrame(rows, "arm string, converted int")

    r = msprt_always_valid(units(100, 10, 100, 30), tau=0.1).first()
    theta = 30 / 100 - 10 / 100
    pool = 40 / 200
    v = pool * (1.0 - pool) * (1.0 / 100 + 1.0 / 100)
    t2 = 0.1 * 0.1
    lam = math.sqrt(v / (v + t2)) * math.exp(
        theta * theta * t2 / (2.0 * v * (v + t2))
    )
    assert r.lambda_stat == round(lam, 9)
    assert r.p_always_valid == round(min(1.0, 1.0 / lam), 9)
    assert r.reject  # 20-point lift on n=200: decisive
    assert r.abs_lift == theta

    # null split: p pinned at 1 (Lambda < 1 clips via LEAST)
    r0 = msprt_always_valid(units(100, 20, 100, 20), tau=0.1).first()
    assert r0.p_always_valid == 1.0 and not r0.reject
    # degenerate: everyone converts -> pooled rate 1 -> NULLs, no raise
    rd = msprt_always_valid(units(10, 10, 10, 10), tau=0.1).first()
    assert rd.lambda_stat is None and rd.p_always_valid is None
    assert rd.reject is False
    # empty frame: counters 0, reject false
    re_ = msprt_always_valid(
        spark.createDataFrame([], "arm string, converted int"), tau=0.1
    ).first()
    assert re_.n_control == 0 and re_.reject is False


def test_ks_two_sample_hand_computed(spark):
    """KS drift test: D on known staircases (old {1..5} vs new {3..7}
    -> sup gap 0.4 at v in [2,5]), the Kolmogorov p from the same
    truncated series evaluated in Python, identical samples read D=0 /
    p=1 (the small-lambda guard — a truncated alternating series at
    lambda~0 would otherwise read p~0), a large shifted sample
    rejects, and an empty side yields NULLs with reject=false."""
    import math

    from dwh_with_dask_spark.operators.profile import ks_two_sample

    def frame(vals):
        return spark.createDataFrame([(float(v),) for v in vals], "v double")

    old = frame([1, 2, 3, 4, 5])
    new = frame([3, 4, 5, 6, 7])
    r = ks_two_sample(old, new, "v").first()
    assert r.n_old == 5 and r.n_new == 5
    assert r.ks_d == 0.4
    lam = 0.4 * math.sqrt(25 / 10)
    assert r.ks_lambda == round(lam, 9)
    q = 2.0 * sum(
        (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        for k in range(1, 101)
    )
    assert r.p_value == round(min(1.0, max(0.0, q)), 9)
    assert not r.reject  # n=5 vs 5: far from significance

    same = ks_two_sample(old, frame([1, 2, 3, 4, 5]), "v").first()
    assert same.ks_d == 0.0 and same.p_value == 1.0 and not same.reject

    big_old = frame([i % 100 for i in range(2000)])
    big_new = frame([i % 100 + 30 for i in range(2000)])
    shifted = ks_two_sample(big_old, big_new, "v").first()
    assert shifted.ks_d >= 0.29 and shifted.reject

    empty = ks_two_sample(old, frame([]), "v").first()
    assert empty.n_new == 0 and empty.ks_d is None
    assert empty.p_value is None and empty.reject is False


def test_ks_binned_identity_bound_and_empty(spark):
    """ks_two_sample_binned: with unit bins aligned to integer data
    the report EQUALS the exact test column-for-column (bins == value
    groups — the identity that pins the shared scoring tree); on a
    coarse grid the binned D never exceeds the exact D and stays
    within the documented one-bin-mass bound; an empty side yields
    NULLs with reject=false."""
    from dwh_with_dask_spark.operators.profile import (
        ks_two_sample,
        ks_two_sample_binned,
    )

    def frame(vals):
        return spark.createDataFrame([(float(v),) for v in vals], "v double")

    old = frame([i % 20 for i in range(800)])
    new = frame([(i % 20) + 4 for i in range(600)])
    exact = ks_two_sample(old, new, "v").first()
    # unit bins over [0, 24): every integer value gets its own bin
    unit = ks_two_sample_binned(old, new, "v", 0.0, 24.0, bins=24).first()
    assert tuple(unit) == tuple(exact)
    # coarse bins: D_binned <= D_exact <= D_binned + max bin mass
    coarse = ks_two_sample_binned(old, new, "v", 0.0, 24.0, bins=4).first()
    assert coarse.ks_d <= exact.ks_d
    # max bin mass at 4 bins over 20/24 occupied values: 6/20 = 0.3
    assert exact.ks_d <= coarse.ks_d + 0.3 + 1e-12
    empty = ks_two_sample_binned(old, frame([]), "v", 0.0, 24.0, 4).first()
    assert empty.n_new == 0 and empty.ks_d is None and empty.reject is False
