"""SCD2 versioning + Z-order clustering tests."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.operators.scd import scd2_from_changelog, scd2_merge
from dwh_with_dask_spark.operators.zorder import (
    scale_to_bits,
    write_zordered,
    zvalue,
)
from tests.conftest import SF_SMOKE


def test_scd2_changelog_compacts_and_tiles(spark):
    rows = [
        # key A: value repeats (compacts), then changes, then repeats
        Row(k="A", ts=1, seq=1, v="x"),
        Row(k="A", ts=2, seq=2, v="x"),
        Row(k="A", ts=3, seq=3, v="y"),
        Row(k="A", ts=4, seq=4, v="y"),
        Row(k="A", ts=5, seq=5, v="x"),
        # key B: NULL value observed, then set — null-safe change detection
        Row(k="B", ts=1, seq=6, v=None),
        Row(k="B", ts=2, seq=7, v=None),
        Row(k="B", ts=3, seq=8, v="z"),
        # key C: tie on ts broken by seq
        Row(k="C", ts=1, seq=9, v="p"),
        Row(k="C", ts=1, seq=10, v="q"),
    ]
    df = spark.createDataFrame(rows)
    out = scd2_from_changelog(df, "k", "ts", ["v"], tiebreak_col="seq")
    got = {
        (r.k, r.version): (r.v, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got[("A", 1)] == ("x", 1, 3, False)
    assert got[("A", 2)] == ("y", 3, 5, False)
    assert got[("A", 3)] == ("x", 5, None, True)
    assert got[("B", 1)] == (None, 1, 3, False)
    assert got[("B", 2)] == ("z", 3, None, True)
    # tie on ts: seq decides the version order deterministically
    assert got[("C", 1)] == ("p", 1, 1, False)
    assert got[("C", 2)] == ("q", 1, None, True)
    # invariants: exactly one open row per key, intervals tile
    per_key = {}
    for (k, ver), (_, vf, vt, cur) in got.items():
        per_key.setdefault(k, []).append((ver, vf, vt, cur))
    for k, versions in per_key.items():
        versions.sort()
        assert sum(1 for *_, cur in versions if cur) == 1
        for (_, _, vt1, _), (_, vf2, _, _) in zip(versions, versions[1:]):
            assert vt1 == vf2


def test_scd2_merge_all_branches(spark):
    dim = spark.createDataFrame(
        [
            # k1: history row + open row that the batch changes
            Row(k=1, v="old", valid_from=10, valid_to=20, is_current=False),
            Row(k=1, v="a", valid_from=20, valid_to=None, is_current=True),
            # k2: open row, batch carries the identical value (no-op)
            Row(k=2, v="b", valid_from=10, valid_to=None, is_current=True),
            # k3: open row, not in the batch
            Row(k=3, v="c", valid_from=10, valid_to=None, is_current=True),
            # k5: open NULL value, batch sets it (null-safe change)
            Row(k=5, v=None, valid_from=10, valid_to=None, is_current=True),
        ],
        "k int, v string, valid_from int, valid_to int, is_current boolean",
    )
    updates = spark.createDataFrame(
        [Row(k=1, v="a2"), Row(k=2, v="b"), Row(k=4, v="new"), Row(k=5, v="e")],
        "k int, v string",
    )
    out = scd2_merge(dim, updates, "k", ["v"], F.lit(30))
    rows = {(r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows == {
        (1, "old", 10, 20, False),  # history passthrough
        (1, "a", 20, 30, False),  # closed
        (1, "a2", 30, None, True),  # re-opened
        (2, "b", 10, None, True),  # identical update -> untouched
        (3, "c", 10, None, True),  # absent from batch -> untouched
        (4, "new", 30, None, True),  # brand-new key
        (5, None, 10, 30, False),  # NULL -> value closes the NULL row
        (5, "e", 30, None, True),
    }


def _z_ref(vals: list[int], bits: int) -> int:
    z = 0
    for i, v in enumerate(vals):
        v &= (1 << bits) - 1
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zvalue_matches_reference_interleave(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, 123)]
    df = spark.createDataFrame(cases, "x long, y long").withColumn(
        "z", zvalue([F.col("x"), F.col("y")], 16)
    )
    for r in df.collect():
        assert r.z == _z_ref([r.x, r.y], 16), (r.x, r.y)


def test_zvalue_guards():
    with pytest.raises(ValueError):
        zvalue([F.col("x")], 16)
    with pytest.raises(ValueError):
        zvalue([F.col("x"), F.col("y")], 32)


def _files_containing(path: str, col: str, value) -> tuple[int, int]:
    """(#files whose [min,max] stats span value, #files) via parquet
    footers — exactly the information a min/max-pruning reader uses."""
    import glob

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        if lo <= value <= hi:
            hit += 1
    return hit, len(files)


def test_write_zordered_prunes_on_both_dims(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1992-01-01"))
        ).alias("day"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    # Normalize both dims to equal bit width (scale_to_bits docstring:
    # raw interleave of an 8-bit and a 12-bit dimension degrades to a
    # day-only sort). Bounds are the table's own min/max — metadata.
    lo = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("day"), F.max("day")
    ).collect()[0]
    dims = [
        scale_to_bits(F.col("o_custkey"), lo[0], lo[1], 8),
        scale_to_bits(F.col("day"), lo[2], lo[3], 8),
    ]
    write_zordered(o, zpath, dims, 8, n_files=8)
    # baseline: same file count, sorted on day only
    o.repartitionByRange(8, "day").sortWithinPartitions("day").write.parquet(lpath)

    med = o.approxQuantile(["o_custkey", "day"], [0.5], 0.0)
    ck, day = int(med[0][0]), int(med[1][0])

    z_ck, n = _files_containing(zpath, "o_custkey", ck)
    z_day, _ = _files_containing(zpath, "day", day)
    l_ck, nl = _files_containing(lpath, "o_custkey", ck)
    # Z-order: BOTH dimensions prune (a median point value must not span
    # every file); the single-column sort prunes day perfectly but its
    # custkey stats span everything.
    assert n == 8 and z_ck < n and z_day < n
    assert l_ck == nl  # linear clustering cannot prune the other dim
    # round-trip: clustering must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == o.count()


def test_scd2_changelog_fuzz_vs_python_reference(spark):
    """Random changelogs: the windowed compaction must equal a direct
    python scan (version boundaries, intervals, open tails)."""
    import datetime
    import random

    from dwh_with_dask_spark.operators.scd import scd2_from_changelog

    rng = random.Random(5)
    rows = []
    seq = 0
    for key in range(30):
        t = datetime.datetime(2024, 1, 1)
        for _ in range(rng.randint(1, 15)):
            t += datetime.timedelta(minutes=rng.randint(0, 90))  # ties possible
            rows.append((key, t, rng.choice(["A", "B", "C"]), seq))
            seq += 1
    df = spark.createDataFrame(rows, "k long, ts timestamp, val string, lsn long")

    got = sorted(
        (r.k, r.val, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in scd2_from_changelog(df, "k", "ts", ["val"], "lsn").collect()
    )

    # python reference: sort (ts, lsn) per key, collapse equal runs
    want = []
    from collections import defaultdict

    per = defaultdict(list)
    for k, t, v, lsn in rows:
        per[k].append((t, lsn, v))
    for k, evs in per.items():
        evs.sort()
        versions = []
        for t, _lsn, v in evs:
            if not versions or versions[-1][1] != v:
                versions.append((t, v))
        for i, (t, v) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            want.append((k, v, t, nxt, nxt is None, i + 1))
    assert got == sorted(want)


def test_dq_row_flags_guards_and_empty_rules(spark):
    import pytest as _pytest

    from dwh_with_dask_spark.operators.dq import Rule, dq_row_flags

    d = spark.createDataFrame([(1, "a")], "id long, cat string")
    out = dq_row_flags(d, [])
    assert out.collect()[0].dq_violations == []
    with _pytest.raises(ValueError):
        dq_row_flags(d, [Rule(kind="unique", column="id")])


def test_merge_into_all_branches(spark):
    """merge_into: kept / updated / conditionally-updated / deleted /
    inserted, plus the cardinality guard. Python-reference twin."""
    from pyspark.sql.utils import PythonException

    from dwh_with_dask_spark.operators.scd import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, x double",
    )
    source = spark.createDataFrame(
        [
            (2, "U", "bb", 22.0),   # update
            (3, "D", None, None),   # delete
            (4, "SKIP", "zz", 0.0), # matched, neither cond -> kept
            (9, "I", "new", 90.0),  # insert
        ],
        "k long, op string, s string, x double",
    )
    out = merge_into(
        target,
        source,
        ["k"],
        update_condition=F.col("src.op") == "U",
        delete_condition=F.col("src.op") == "D",
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [
        (1, "a", 10.0),    # no source match
        (2, "bb", 22.0),   # updated
        (4, "d", 40.0),    # matched but SKIP -> kept
        (9, "new", 90.0),  # inserted
    ]

    # insert=False drops unmatched source rows
    no_ins = merge_into(
        target, source, ["k"],
        update_condition=F.col("src.op") == "U",
        delete_condition=F.col("src.op") == "D",
        insert=False,
    )
    assert sorted(r.k for r in no_ins.collect()) == [1, 2, 4]

    # default conditions: every matched row updates, inserts apply
    plain = merge_into(
        target, source.drop("op").filter(F.col("k").isin(2, 9)), ["k"]
    )
    assert sorted(map(tuple, plain.collect())) == [
        (1, "a", 10.0), (2, "bb", 22.0), (3, "c", 30.0),
        (4, "d", 40.0), (9, "new", 90.0),
    ]

    # a source column absent from the target inserts as NULL via schema
    # alignment, and update_cols restricts which columns change
    partial = merge_into(
        target,
        source.filter("op = 'U'").select("k", "x"),
        ["k"],
        update_cols=["x"],
    )
    assert sorted(map(tuple, partial.collect())) == [
        (1, "a", 10.0), (2, "b", 22.0), (3, "c", 30.0), (4, "d", 40.0),
    ]

    # duplicate source keys must raise (MERGE cardinality rule)
    dup = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "k long, s string, x double"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="multiple source rows"):
        merge_into(target, dup, ["k"]).collect()


def test_point_in_time_join_versions_partition_timeline(spark):
    """point_in_time_join: each fact row matches exactly the dim version
    whose [valid_from, valid_to) interval contains its ts; boundary facts
    take the NEWER version (exclusive upper bound); pre-history and
    unknown keys keep NULL dim columns under how='left'."""
    import datetime as _dt

    from dwh_with_dask_spark.operators.joins import point_in_time_join

    T = _dt.datetime
    dim = spark.createDataFrame(
        [
            (1, "v1", T(2024, 1, 1), T(2024, 2, 1)),
            (1, "v2", T(2024, 2, 1), T(2024, 3, 1)),
            (1, "v3", T(2024, 3, 1), None),
            (2, "w1", T(2024, 1, 15), None),
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    fact = spark.createDataFrame(
        [
            (100, 1, T(2024, 1, 10)),   # inside v1
            (101, 1, T(2024, 2, 1)),    # boundary -> v2 (exclusive hi)
            (102, 1, T(2024, 5, 5)),    # open version v3
            (103, 1, T(2023, 12, 1)),   # pre-history -> NULL
            (104, 2, T(2024, 1, 15)),   # first instant of w1
            (105, 3, T(2024, 1, 1)),    # unknown key -> NULL
        ],
        "fid long, k long, ts timestamp",
    )
    out = point_in_time_join(fact, dim, ["k"], "ts", how="left")
    got = {r.fid: r.attr for r in out.collect()}
    assert got == {
        100: "v1", 101: "v2", 102: "v3", 103: None, 104: "w1", 105: None,
    }
    assert out.count() == fact.count()  # left join preserves cardinality
    # inner join drops only the unmatched facts
    inner = point_in_time_join(fact, dim, ["k"], "ts", how="inner")
    assert sorted(r.fid for r in inner.collect()) == [100, 101, 102, 104]


def test_point_in_time_join_plans_as_equi_join(spark):
    """The 100 TB contract: the interval predicate must ride a KEY
    equi-join as a residual filter — never a BroadcastNestedLoopJoin
    over the fact."""
    import datetime as _dt

    from dwh_with_dask_spark.operators.joins import point_in_time_join

    T = _dt.datetime
    dim = spark.createDataFrame(
        [(i, f"v{i}", T(2024, 1, 1), None) for i in range(100)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    fact = spark.createDataFrame(
        [(i, i % 100, T(2024, 6, 1)) for i in range(1000)],
        "fid long, k long, ts timestamp",
    )
    plan = (
        point_in_time_join(fact, dim, ["k"], "ts", how="inner")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan), plan


def test_merge_into_plans_one_join_no_extra_shuffle(spark):
    """merge_into's 100 TB contract: the whole merge is ONE key join
    (full-outer hash/sort-merge) plus row-local emit — the uniqueness
    window on the source reuses its own key exchange for the join
    (subset-of-grouping-keys rule), so no additional shuffle appears,
    and nothing plans as a nested loop."""
    from dwh_with_dask_spark.operators.scd import merge_into

    target = spark.range(2000).selectExpr(
        "id AS k", "CAST(id % 7 AS STRING) AS s", "id * 1.5 AS x"
    )
    source = spark.range(0, 2000, 10).selectExpr(
        "id AS k", "'u' AS s", "id * 2.0 AS x"
    )
    plan = (
        merge_into(target, source, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_joins = (
        plan.count("SortMergeJoin")
        + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
    )
    assert n_joins == 1, plan
    assert "NestedLoop" not in plan, plan
    # exchanges: one per join side at most (the window's exchange IS the
    # source's join exchange; AQE may replace one with a broadcast)
    assert plan.count("Exchange") <= 2, plan


def test_point_in_time_join_suffixes_clashing_dim_columns(spark):
    """A dim column named like a fact column must come out suffixed —
    never a silent duplicate name (AMBIGUOUS_REFERENCE downstream);
    validity columns stay out unless keep_validity."""
    import datetime as _dt

    from dwh_with_dask_spark.operators.joins import point_in_time_join

    T = _dt.datetime
    dim = spark.createDataFrame(
        [(1, "typA", T(2024, 1, 1), None)],
        "k long, ts string, valid_from timestamp, valid_to timestamp",
    ).withColumnRenamed("ts", "attr").withColumn("ts", F.lit("dimside"))
    fact = spark.createDataFrame(
        [(100, 1, T(2024, 2, 1))], "fid long, k long, ts timestamp"
    )
    out = point_in_time_join(fact, dim, ["k"], "ts")
    assert out.columns == ["fid", "k", "ts", "attr", "ts_dim"]
    r = out.first()
    assert r.ts_dim == "dimside" and r.attr == "typA"
    kept = point_in_time_join(fact, dim, ["k"], "ts", keep_validity=True)
    assert "valid_from" in kept.columns and "valid_to" in kept.columns


def test_point_in_time_join_rejects_residual_suffix_collision(spark):
    """ADVICE r8: the clash rename can itself collide (dim carrying both
    'ts' and 'ts_dim' maps two columns onto one name) — that must raise
    a clear ValueError at call time, never emit the duplicate-column
    frame the docstring forbids."""
    import datetime as _dt

    import pytest

    from dwh_with_dask_spark.operators.joins import point_in_time_join

    T = _dt.datetime
    dim = spark.createDataFrame(
        [(1, "a", "b", T(2024, 1, 1), None)],
        "k long, c1 string, c2 string, valid_from timestamp, "
        "valid_to timestamp",
    ).withColumnRenamed("c1", "ts").withColumnRenamed("c2", "ts_dim")
    fact = spark.createDataFrame(
        [(100, 1, T(2024, 2, 1))], "fid long, k long, ts timestamp"
    )
    with pytest.raises(ValueError, match="does not disambiguate"):
        point_in_time_join(fact, dim, ["k"], "ts")
    # a non-colliding suffix still works
    out = point_in_time_join(fact, dim, ["k"], "ts", suffix="_v")
    assert out.columns == ["fid", "k", "ts", "ts_v", "ts_dim"]
