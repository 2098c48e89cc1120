"""Structured Streaming tests (SURVEY.md §5.5).

Strategy: stream the events parquet through the file source one file per
micro-batch into a memory sink, and assert the streamed result equals
the batch twin of the same transformation — plus an explicit
watermark/late-data drop check with a crafted out-of-order stream.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.streaming.events import (
    read_events_stream,
    session_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir_spark(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def run_stream_to_memory(spark, stream_df, name: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_equals_batch(spark, tmpdir_spark):
    # Stage the events table as a multi-file stream input.
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = f"{tmpdir_spark}/events_in"
    events.repartition(4).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    name = f"t_{uuid.uuid4().hex[:8]}"
    streamed = run_stream_to_memory(
        spark, tumbling_counts(stream), name, f"{tmpdir_spark}/ckpt1"
    )
    batch = tumbling_counts(events)

    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_streaming_session_counts_equals_batch(spark, tmpdir_spark):
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = f"{tmpdir_spark}/events_in2"
    events.repartition(2).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"s_{uuid.uuid4().hex[:8]}"
    streamed = run_stream_to_memory(
        spark, session_counts(stream), name, f"{tmpdir_spark}/ckpt2"
    )
    batch = session_counts(events)
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_watermark_drops_late_rows(spark, tmpdir_spark):
    """A row arriving behind the watermark must be excluded from its
    (already finalized) window in append mode."""
    import glob
    import os
    import shutil as sh
    from datetime import datetime

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = f"{tmpdir_spark}/late_in"
    os.makedirs(src)
    batch1 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 5), 1, "click", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 3, 0), 1, "click", 1.0, "{}"),  # advances watermark
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [(3, datetime(2024, 1, 1, 3, 30), 1, "click", 1.0, "{}")],  # on time
        schema,
    )
    batch3 = spark.createDataFrame(
        [(4, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}")],  # late beyond 1h
        schema,
    )

    # The file source processes in modification-time order — stage the
    # micro-batches with explicit names and mtimes so batch order is
    # deterministic (plain writes would get random UUID part names).
    # The watermark advances at the START of the batch after the data
    # that moved it, and state eviction happens at END of batch — so the
    # hour-0 window is finalized+evicted at the end of batch 2, and the
    # late row in batch 3 must be dropped (a late row arriving in batch 2
    # would legally still be aggregated; Spark's watermark is a drop
    # *bound*, not an exact cut).
    def stage(df, name, mtime):
        tmp = f"{tmpdir_spark}/stage_{name}"
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/{name}.parquet"
        sh.copyfile(part, dest)
        os.utime(dest, (mtime, mtime))

    stage(batch1, "00-first", 1_700_000_000)
    stage(batch2, "01-ontime", 1_700_000_100)
    stage(batch3, "02-late", 1_700_000_200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = f"w_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt3")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {str(r["ws"]): r["n"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # Batch 1 advances the watermark to 02:00 and finalizes the hour-0
    # window with exactly the on-time row; batch 2's late row (00:10)
    # is behind the watermark and must be dropped, never resurrecting
    # the finalized window.
    assert rows["2024-01-01 00:00:00"] == 1


def test_stateful_user_stats_carries_state_across_batches(spark, tmpdir_spark):
    """applyInPandasWithState: per-user running totals must accumulate
    across micro-batches (state store), and the final emitted row per
    user must equal the batch groupBy over all the data."""
    import uuid as _uuid

    from dwh_with_dask_spark.streaming.events import stateful_user_stats

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = f"{tmpdir_spark}/events_state"
    events.repartition(3).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"st_{_uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # Update mode emits one row per (user, batch-it-appeared-in); the row
    # with the max n_events per user is the final state.
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            f"""SELECT user_id, n_events, total_value FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC) rk
                  FROM {name}) WHERE rk = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want


def test_stateful_sessions_event_time_timeout(spark, tmpdir_spark):
    """EventTimeTimeout eviction: a user idle past (last event + gap)
    once the watermark passes must emit a final closed=true row and lose
    its state; a user with fresh data must stay open."""
    import glob
    import os
    import shutil as sh
    import uuid as _uuid
    from datetime import datetime

    from dwh_with_dask_spark.streaming.events import stateful_user_sessions

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = f"{tmpdir_spark}/sess_in"
    os.makedirs(src)
    batch1 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 5), 1, "click", 2.0, "{}"),
            (3, datetime(2024, 1, 1, 0, 0), 2, "click", 5.0, "{}"),
        ],
        schema,
    )
    # User 1 stays active much later; user 2 goes idle.
    batch2 = spark.createDataFrame(
        [(4, datetime(2024, 1, 1, 6, 0), 1, "click", 3.0, "{}")], schema
    )
    # Any further batch: watermark (6:00 - 1h = 5:00) now exceeds user
    # 2's timeout (0:00 + 30min) -> its group fires with hasTimedOut.
    batch3 = spark.createDataFrame(
        [(5, datetime(2024, 1, 1, 6, 10), 3, "click", 1.0, "{}")], schema
    )

    def stage(df, name, mtime):
        tmp = f"{tmpdir_spark}/sess_stage_{name}"
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/{name}.parquet"
        sh.copyfile(part, dest)
        os.utime(dest, (mtime, mtime))

    stage(batch1, "00-open", 1_700_000_000)
    stage(batch2, "01-later", 1_700_000_100)
    stage(batch3, "02-tick", 1_700_000_200)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    name = f"sess_{_uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_sessions(stream, gap_ms=30 * 60 * 1000, watermark="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()

    closed = {r["user_id"]: r for r in rows if r["closed"]}
    # User 2 evicted with its full accumulated session.
    assert set(closed) == {2}
    assert closed[2]["n_events"] == 1 and closed[2]["total_value"] == 5.0
    # User 1 never closed; its last open row carries both batches' data.
    open_u1 = [r for r in rows if r["user_id"] == 1 and not r["closed"]]
    assert max(r["n_events"] for r in open_u1) == 3
    assert max(round(r["total_value"], 6) for r in open_u1) == 6.0


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmpdir_spark):
    """An event redelivered in a later micro-batch (within the watermark)
    must appear exactly once; the batch twin agrees."""
    import glob
    import os
    import shutil as sh
    import uuid as _uuid
    from datetime import datetime

    from dwh_with_dask_spark.streaming.events import dedup_stream

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = f"{tmpdir_spark}/dedup_in"
    os.makedirs(src)
    batch1 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 1), 1, "view", 2.0, "{}"),
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),  # redelivery
            (3, datetime(2024, 1, 1, 0, 2), 2, "click", 3.0, "{}"),
        ],
        schema,
    )

    def stage(df, name, mtime):
        tmp = f"{tmpdir_spark}/dedup_stage_{name}"
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/{name}.parquet"
        sh.copyfile(part, dest)
        os.utime(dest, (mtime, mtime))

    stage(batch1, "00-a", 1_700_000_000)
    stage(batch2, "01-b", 1_700_000_100)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    name = f"dd_{_uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_dd")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.sql(f"SELECT * FROM {name}").collect())
    assert got == [1, 2, 3]

    batch_twin = dedup_stream(batch1.unionByName(batch2))
    assert sorted(r["event_id"] for r in batch_twin.collect()) == [1, 2, 3]


def test_streaming_minute_rollup_append_then_fold(spark, tmpdir_spark):
    """Continuous-aggregate path: the stream appends finalized minute
    partials (exactly-once, append mode); folding them with the batch
    cascade gives values bit-identical to the batch rollup for every
    emitted bucket — and the watermark guarantees full coverage of all
    but the stream's final watermark-delay tail."""
    import uuid

    from dwh_with_dask_spark.operators.rollup import (
        cascade_from_partials,
        minute_partials,
    )
    from dwh_with_dask_spark.streaming.events import minute_rollup_stream

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # Stage files in CHRONOLOGICAL order (one time-slice per file, oldest
    # first): the file source reads oldest-mtime first, so the watermark
    # advances monotonically — the arrival pattern append-mode
    # finalization is designed for. (A randomly time-interleaved file set
    # would jump the watermark to near-max after one batch and every
    # older window from later files would be late data.)
    import time as _time

    src = f"{tmpdir_spark}/events_roll"
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 4
    for i in range(4):
        part = events.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 3 else hi + span))
        )
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"r_{uuid.uuid4().hex[:8]}"
    q = (
        minute_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_roll")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql(f"SELECT * FROM {name}")

    batch = minute_partials(events)
    skey = {
        (r["bucket"], r["event_type"]): (r["__n"], r["__sdec"], r["__mn"], r["__mx"])
        for r in streamed.collect()
    }
    bkey = {
        (r["bucket"], r["event_type"]): (r["__n"], r["__sdec"], r["__mn"], r["__mx"])
        for r in batch.collect()
    }
    assert skey, "stream emitted nothing"
    # every finalized window is exactly the batch value (exactly-once)
    for k, v in skey.items():
        assert bkey[k] == v, k
    # coverage: all buckets except the final watermark tail are emitted
    max_ts = events.agg(F.max("ts")).first()[0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=3)
    missing = [k for k in bkey if k not in skey and k[0] < cutoff]
    assert missing == []

    # folding streamed partials == batch rollup, restricted to streamed buckets
    folded = cascade_from_partials(streamed).filter(F.col("level") == "minute")
    direct = cascade_from_partials(batch).filter(F.col("level") == "minute")
    fold_map = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"],
                                         r["min_value"], r["max_value"])
        for r in folded.collect()
    }
    direct_map = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"],
                                         r["min_value"], r["max_value"])
        for r in direct.collect()
    }
    for k, v in fold_map.items():
        assert direct_map[k] == v, k


def test_streaming_sliding_window_equals_batch(spark, tmpdir_spark):
    import uuid

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = f"{tmpdir_spark}/events_slide"
    events.repartition(3).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"sl_{uuid.uuid4().hex[:8]}"
    streamed = run_stream_to_memory(
        spark,
        tumbling_counts(stream, window="1 hour", slide="30 minutes"),
        name,
        f"{tmpdir_spark}/ckpt_slide",
    )
    batch = tumbling_counts(events, window="1 hour", slide="30 minutes")
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_upsert_rollup_sink_maintains_complete_table(spark, tmpdir_spark):
    """Update-mode minute partials + foreachBatch upsert => the parquet
    table equals the batch aggregate over ALL events (in-flight windows
    included), across multiple micro-batches touching the same days."""
    import uuid

    from dwh_with_dask_spark.operators.rollup import minute_partials
    from dwh_with_dask_spark.streaming.events import (
        minute_rollup_stream,
        upsert_rollup_sink,
    )

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # chronological staging (see rollup append test)
    import time as _time

    src = f"{tmpdir_spark}/events_upsert"
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 4
    for i in range(4):
        part = events.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 3 else hi + span))
        )
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    table = f"{tmpdir_spark}/rollup_table"
    q = (
        minute_rollup_stream(stream)
        .writeStream.foreachBatch(upsert_rollup_sink(table))
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_upsert")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["bucket"], r["event_type"]): (r["__n"], r["__sdec"], r["__mn"], r["__mx"])
        for r in spark.read.parquet(table).collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (r["__n"], r["__sdec"], r["__mn"], r["__mx"])
        for r in minute_partials(events).collect()
    }
    assert got == want


def test_stream_static_enrichment_equals_batch(spark, tmpdir_spark):
    import uuid

    from dwh_with_dask_spark.streaming.events import enrich_with_users

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    users = (
        events.select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )
    src = f"{tmpdir_spark}/events_enrich"
    events.repartition(3).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"en_{uuid.uuid4().hex[:8]}"
    q = (
        enrich_with_users(stream, users)
        .select("event_id", "user_id", "tier")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_enrich")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    batch = sorted(
        map(tuple, enrich_with_users(events, users)
            .select("event_id", "user_id", "tier").collect())
    )
    assert streamed == batch and len(streamed) > 0


def test_stream_stream_interval_join_equals_batch(spark, tmpdir_spark):
    import time as _time
    import uuid

    from dwh_with_dask_spark.streaming.events import self_join_follow_events

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # chronological staging so watermarks advance monotonically
    src = f"{tmpdir_spark}/events_ssj"
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    for i in range(3):
        part = events.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 2 else hi + span))
        )
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    sa = read_events_stream(spark, src, max_files_per_trigger=1)
    sb = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        self_join_follow_events(sa, sb, within="12 hours", watermark="13 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = set(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    batch = set(
        map(
            tuple,
            self_join_follow_events(
                events, events, within="12 hours", watermark="13 hours"
            ).collect(),
        )
    )
    # every streamed pair is a true pair, and the stream covers all
    # pairs whose join range closed before the final watermark (the
    # tail within the watermark delay of stream end may be missing)
    assert streamed <= batch
    assert len(streamed) >= int(0.5 * len(batch)) > 0


def test_rowlocal_signatures_equal_exploded(spark):
    # The streaming-safe per-row MinHash form must emit exactly the
    # batch (explode + groupBy) signatures — same ids, same arrays.
    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_rowlocal,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    a = {r["id"]: list(r["sig"]) for r in minhash_signatures(docs).collect()}
    b = {r["id"]: list(r["sig"]) for r in minhash_signatures_rowlocal(docs).collect()}
    assert a == b and a
    # ... and per hash family: the md5 (oracle-able) family's rowlocal
    # form must match its exploded form too, so a streaming probe
    # against an md5-built corpus_index sees the same signatures
    am = {
        r["id"]: list(r["sig"])
        for r in minhash_signatures(docs, hash_family="md5").collect()
    }
    bm = {
        r["id"]: list(r["sig"])
        for r in minhash_signatures_rowlocal(
            docs, hash_family="md5"
        ).collect()
    }
    assert am == bm and am
    assert am != a  # the two families genuinely differ


def test_flag_against_md5_index_batch(spark):
    # family-matched probe: an md5-built corpus_index probed with
    # hash_family='md5' finds the exact+near matches (the contract the
    # round-13 hash_family threading exists to keep honest)
    from dwh_with_dask_spark.operators.dedup import (
        corpus_index,
        incremental_dedup,
    )
    from dwh_with_dask_spark.streaming.docs import flag_against_index

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps on the warm mat near the old wooden door"
    )
    near = base.replace("lazy", "sleepy")
    rows = [
        (2, base), (4, "totally different corpus content here entirely"),
        (1, base),                      # exact dup of corpus doc 2
        (3, near),                      # near dup of corpus doc 2
        (5, "novel text about spark engines and parquet files"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index = corpus_index(corpus, hash_family="md5").persist()
    index.count()
    flags = flag_against_index(
        batch, index, hash_family="md5"
    ).collect()
    kinds = {(r["doc_id"], r["corpus_id"], r["kind"]) for r in flags}
    # cross-check against the batch-side incremental path (same family)
    inc = incremental_dedup(batch, index, hash_family="md5").collect()
    exact_want = {
        (r["doc_id"], r["exact_dup_of"]) for r in inc if r["exact_dup_of"] is not None
    }
    exact_got = {(d, c) for d, c, k in kinds if k == "exact"}
    assert exact_want <= exact_got and exact_want
    near_docs_want = {r["doc_id"] for r in inc if r["near_dup_of"] is not None}
    near_docs_got = {d for d, _c, k in kinds if k == "near"}
    assert near_docs_want <= near_docs_got and 3 in near_docs_got
    index.unpersist()


def test_streaming_incremental_dedup_equals_batch(spark, tmpdir_spark):
    import uuid

    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.operators.dedup import corpus_index
    from dwh_with_dask_spark.streaming.docs import (
        flag_against_index,
        read_documents_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx_path = f"{tmpdir_spark}/docs_index"
    corpus_index(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    src = f"{tmpdir_spark}/docs_stream"
    batch.repartition(3).write.parquet(src)

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        flag_against_index(stream, index, threshold=0.4)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_docs_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def match_set(df):
        # near events are at-least-once (one per colliding band): both
        # sides compare as idempotent (doc, corpus, kind) sets.
        return {
            (r["doc_id"], r["corpus_id"], r["kind"], round(r["agree_frac"], 6))
            for r in df.collect()
        }

    streamed = match_set(spark.sql(f"SELECT * FROM {name}"))
    batched = match_set(flag_against_index(batch, index, threshold=0.4))
    assert streamed == batched


def test_flag_against_index_joins_are_stream_static_only(spark, tmpdir_spark):
    # State-growth contract: every join in the plan must have the static
    # index on one side. Regression: the near leg used to join the
    # band-bucket frame back to the signature frame on doc_id — a
    # stream-stream self-join with unbounded state. With the signature
    # carried through the bucket rows the whole query has exactly 3
    # joins (exact: 1, near: bucket⋈index + verify⋈index), all
    # stream-static.
    from dwh_with_dask_spark.catalog import load_table
    from dwh_with_dask_spark.operators.dedup import corpus_index
    from dwh_with_dask_spark.streaming.docs import flag_against_index

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    idx_path = f"{tmpdir_spark}/docs_index_plan"
    corpus_index(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    out = flag_against_index(docs.filter(F.col("doc_id") % 2 == 1), index)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join ") == 3


def test_stateful_funnel_equals_batch(spark, tmpdir_spark):
    """Streaming funnel: final per-user reach emitted across
    time-ordered micro-batches must equal the batch array-fold
    (operators.funnel.funnel_reach) — the contract when events arrive
    time-ordered across batches."""
    import uuid as _uuid

    from dwh_with_dask_spark.operators.funnel import funnel_reach
    from dwh_with_dask_spark.streaming.events import stateful_funnel

    steps = ["view", "click", "purchase"]
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # Three contiguous time slices written sequentially -> the file
    # source replays them oldest-first, preserving per-user time order
    # across micro-batches.
    src = f"{tmpdir_spark}/events_funnel"
    bounds = events.selectExpr(
        "percentile(cast(ts as double), 0.33) p1",
        "percentile(cast(ts as double), 0.66) p2",
    ).collect()[0]
    slices = [
        events.filter(F.col("ts").cast("double") <= bounds.p1),
        events.filter(
            (F.col("ts").cast("double") > bounds.p1)
            & (F.col("ts").cast("double") <= bounds.p2)
        ),
        events.filter(F.col("ts").cast("double") > bounds.p2),
    ]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"fn_{_uuid.uuid4().hex[:8]}"
    q = (
        stateful_funnel(stream, steps)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_funnel")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {(r.user_id, r.step_no): r.reached_at for r in got_rows}
    # each slot fills once -> no duplicate emissions
    assert len(got) == len(got_rows)

    want = {}
    for r in funnel_reach(events, steps).collect():
        for i, t in enumerate(r.reach):
            if t is not None:
                want[(r.key, i + 1)] = t
    assert got == want
    assert len(want) > 0


def test_stateful_funnel_within_caps_conversion(spark, tmpdir_spark):
    """The streaming conversion-window cap must match the batch
    operator's 'within' semantics on the same single-batch input."""
    import uuid as _uuid

    from dwh_with_dask_spark.operators.funnel import funnel_reach
    from dwh_with_dask_spark.streaming.events import stateful_funnel

    steps = ["view", "click"]
    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = f"{tmpdir_spark}/events_funnel_w"
    events.coalesce(1).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"fw_{_uuid.uuid4().hex[:8]}"
    q = (
        stateful_funnel(stream, steps, within="12 HOURS")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_funnel_w")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.step_no): r.reached_at
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {}
    for r in funnel_reach(events, steps, within="12 HOURS").collect():
        for i, t in enumerate(r.reach):
            if t is not None:
                want[(r.key, i + 1)] = t
    assert got == want


def test_stateful_funnel_fuzz_random_batches(spark, tmpdir_spark):
    """Random event streams split into time-contiguous micro-batches at
    random boundaries: the streaming funnel's final reach must equal the
    batch fold — the cross-batch state-carry fuzz."""
    import random
    import uuid as _uuid

    from dwh_with_dask_spark.operators.funnel import funnel_reach
    from dwh_with_dask_spark.streaming.events import stateful_funnel

    # lexicographic order adverse to funnel order + repeated timestamps
    # allowed (delta can be 0) so ties exercise the step-index tie-break
    rng = random.Random(21)
    steps = ["c", "b", "a"]
    rows = []
    base = __import__("datetime").datetime(2024, 1, 1)
    for u in range(60):
        t = base
        for _ in range(rng.randint(0, 10)):
            t += __import__("datetime").timedelta(minutes=rng.randint(0, 200))
            rows.append((u, t, rng.choice(steps + ["x"])))
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )

    # 4 contiguous time slices at random quantile boundaries
    ts_sorted = sorted(t for _, t, _ in rows)
    cuts = sorted(rng.sample(range(1, len(ts_sorted) - 1), 3))
    bounds = [ts_sorted[c] for c in cuts]
    src = f"{tmpdir_spark}/events_fuzz"
    prev = None
    from pyspark.sql import functions as FF

    for b in [*bounds, None]:
        sl = events
        if prev is not None:
            sl = sl.filter(FF.col("ts") > prev)
        if b is not None:
            sl = sl.filter(FF.col("ts") <= b)
        sl.coalesce(1).write.mode("append").parquet(src)
        prev = b

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    name = f"fz_{_uuid.uuid4().hex[:8]}"
    q = (
        stateful_funnel(stream, steps)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_fz")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.step_no): r.reached_at
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {}
    for r in funnel_reach(events, steps).collect():
        for i, t in enumerate(r.reach):
            if t is not None:
                want[(r.key, i + 1)] = t
    assert got == want


def test_stateless_curation_on_stream_equals_batch(spark, tmpdir_spark):
    """The curation layer's stateless md5-draw operators (hash split,
    Bernoulli sample, temperature-rate filter) are streaming-legal
    as-is — pure per-row filters/projections, no state — and must
    select EXACTLY the batch rows on a streamed corpus."""
    import uuid as _uuid

    from dwh_with_dask_spark.operators import curation as C
    from dwh_with_dask_spark.streaming.docs import read_documents_stream

    docs = load_table(spark, SF_SMOKE, "documents")
    src = f"{tmpdir_spark}/docs_cur"
    docs.repartition(3).write.parquet(src)

    # temperature rates derive from the static corpus profile; applying
    # them to the stream is a stream-static broadcast join + filter.
    batch_out = C.temperature_sample(
        C.bernoulli_sample(
            docs.withColumn("split", C.hash_split("doc_id", 0.90, 0.05))
            .filter(F.col("split") == "train"),
            0.5, "doc_id", salt="scur",
        ),
        "lang", "doc_id", alpha=0.5, target_rows=200,
    ).select("doc_id", "lang", "split")

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    # rates derive from the STATIC corpus profile (profile=docs) — on a
    # stream the operator must not aggregate its streaming input
    stream_out = C.temperature_sample(
        C.bernoulli_sample(
            stream.withColumn("split", C.hash_split("doc_id", 0.90, 0.05))
            .filter(F.col("split") == "train"),
            0.5, "doc_id", salt="scur",
        ),
        "lang", "doc_id", alpha=0.5, target_rows=200,
        profile=C.bernoulli_sample(
            docs.withColumn("split", C.hash_split("doc_id", 0.90, 0.05))
            .filter(F.col("split") == "train"),
            0.5, "doc_id", salt="scur",
        ),
    ).select("doc_id", "lang", "split")

    name = f"cur_{_uuid.uuid4().hex[:8]}"
    q = (
        stream_out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_cur")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {tuple(r) for r in batch_out.collect()}
    assert got == want
    assert len(want) > 0


def test_streaming_cms_equals_batch_cells(spark, tmpdir_spark):
    """VERDICT r5 ask #8: the incremental CMS over micro-batched
    documents must end bit-equal to the batch sketch over the same
    corpus — cells are additive, so stream-merge == batch-merge."""
    import uuid as _uuid

    from dwh_with_dask_spark.operators.sketches import cms_build
    from dwh_with_dask_spark.streaming.docs import (
        read_documents_stream,
        streaming_cms,
    )
    from dwh_with_dask_spark.operators.dedup import text_tokens

    docs = load_table(spark, SF_SMOKE, "documents")
    src = f"{tmpdir_spark}/docs_cms"
    docs.repartition(5).write.parquet(src)  # 5 files -> 5 micro-batches

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    name = f"cms_{_uuid.uuid4().hex[:8]}"
    streamed = run_stream_to_memory(
        spark, streaming_cms(stream), name, f"{tmpdir_spark}/ckpt_cms"
    )

    terms = docs.select(F.explode(text_tokens("text")).alias("term"))
    batch = cms_build(terms, "term", depth=4, width=64)

    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b
    assert len(a) > 0


def test_streaming_cms_estimates_are_upper_bounds(spark, tmpdir_spark):
    """A snapshot of the streaming sketch must estimate >= true counts
    (the CMS bound), via the SAME cms_estimate probe as batch."""
    import uuid as _uuid

    from dwh_with_dask_spark.operators.dedup import text_tokens
    from dwh_with_dask_spark.operators.sketches import cms_estimate
    from dwh_with_dask_spark.streaming.docs import (
        read_documents_stream,
        streaming_cms,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = f"{tmpdir_spark}/docs_cms2"
    docs.repartition(3).write.parquet(src)

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    name = f"cmse_{_uuid.uuid4().hex[:8]}"
    sketch = run_stream_to_memory(
        spark, streaming_cms(stream), name, f"{tmpdir_spark}/ckpt_cms2"
    )

    terms = docs.select(F.explode(text_tokens("text")).alias("term"))
    exact = terms.groupBy("term").agg(F.count("*").alias("cnt"))
    est = cms_estimate(sketch, exact.select("term"), "term", 4, 64)
    joined = {r.term: r.cms_est for r in est.collect()}
    for r in exact.collect():
        assert joined[r.term] >= r.cnt


def _span_fixture_rows(seed: int, lo: int, n: int, boiler, vocab, every=3):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(lo, lo + n):
        toks = [rng.choice(vocab) for _ in range(rng.randint(8, 25))]
        if i % every == 0:
            at = rng.randint(0, len(toks))
            toks[at:at] = boiler
        rows.append((i, " ".join(toks), "en", "src0", 0))
    return rows


def test_streaming_span_hits_equal_batch_join(spark, tmpdir_spark):
    """flag_span_hits on the doc stream == the batch windows⋈index
    left-semi join: no state, append-legal, same events."""
    import uuid as _uuid

    from dwh_with_dask_spark.operators.dedup import (
        _span_windows,
        build_span_index,
    )
    from dwh_with_dask_spark.streaming.docs import (
        flag_span_hits,
        read_documents_stream,
    )

    vocab = [f"v{i}" for i in range(20)]
    boiler = [f"s{i}" for i in range(10)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    corpus = spark.createDataFrame(
        _span_fixture_rows(1, 0, 40, boiler, vocab), schema
    )
    arriving = spark.createDataFrame(
        _span_fixture_rows(2, 1000, 30, boiler, vocab), schema
    )
    index = build_span_index(corpus).persist()
    src = f"{tmpdir_spark}/docs_span"
    arriving.repartition(3).write.parquet(src)
    try:
        stream = read_documents_stream(spark, src, max_files_per_trigger=1)
        q = (
            flag_span_hits(stream, index)
            .writeStream.format("memory")
            .queryName(f"spanhits_{_uuid.uuid4().hex[:8]}")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir_spark}/ckpt_span")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            map(tuple, spark.sql(f"SELECT * FROM {q.name}").collect())
        )
        want = sorted(
            (r.id, r.pos)
            for r in _span_windows(arriving, "text", "doc_id", 8)
            .join(index.select("h"), "h", "left_semi")
            .collect()
        )
        assert got == want
        assert got  # boilerplate must actually produce hits
    finally:
        index.unpersist()


def test_span_probe_sink_grows_index_across_batches(spark, tmpdir_spark):
    """Two micro-batches through span_probe_sink: each batch's coverage
    equals incremental_duplicate_spans against the index AS IT STOOD
    (corpus + earlier batches), and the final stored index equals the
    batch-built index of everything seen."""
    from dwh_with_dask_spark.operators.dedup import (
        build_span_index,
        incremental_duplicate_spans,
    )
    from dwh_with_dask_spark.streaming.docs import (
        read_documents_stream,
        span_probe_sink,
    )

    vocab = [f"v{i}" for i in range(20)]
    boiler = [f"s{i}" for i in range(10)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    corpus = spark.createDataFrame(
        _span_fixture_rows(3, 0, 40, boiler, vocab), schema
    )
    fa = spark.createDataFrame(
        _span_fixture_rows(4, 1000, 20, boiler, vocab, every=2), schema
    )
    fb = spark.createDataFrame(
        _span_fixture_rows(5, 2000, 20, boiler, vocab, every=2), schema
    )
    src = f"{tmpdir_spark}/docs_grow"
    fa.coalesce(1).write.parquet(src)
    fb.coalesce(1).write.mode("append").parquet(src)
    index_path = f"{tmpdir_spark}/span_index"
    out_path = f"{tmpdir_spark}/span_cov"
    build_span_index(corpus).write.parquet(index_path)

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(span_probe_sink(index_path, out_path))
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_grow")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r.doc_id, r.n_dup_windows, r.dup_tokens)
        for r in spark.read.parquet(out_path).collect()
    )

    def expected(first, second):
        i0 = build_span_index(corpus).persist()
        e1 = incremental_duplicate_spans(first, i0).collect()
        i1 = i0.unionByName(build_span_index(first)).distinct().persist()
        e2 = incremental_duplicate_spans(second, i1).collect()
        rows = sorted(
            (r.doc_id, r.n_dup_windows, r.dup_tokens) for r in e1 + e2
        )
        i0.unpersist()
        i1.unpersist()
        return rows

    assert got in (expected(fa, fb), expected(fb, fa))
    assert got  # fixture must exercise the path

    stored = {r.h for r in spark.read.parquet(index_path).collect()}
    full = {
        r.h
        for r in build_span_index(
            corpus.unionByName(fa).unionByName(fb)
        ).collect()
    }
    assert stored == full


def test_span_probe_sink_fresh_pipeline_self_seeds(spark, tmpdir_spark):
    """ADVICE r6: a fresh pipeline with NO pre-seeded index must not
    die on the first micro-batch — the sink seeds an empty index, the
    first batch's coverage reflects only batch-internal repeats, and
    the stored index afterwards equals the batch-built index."""
    from dwh_with_dask_spark.operators.dedup import (
        build_span_index,
        incremental_duplicate_spans,
    )
    from dwh_with_dask_spark.streaming.docs import (
        read_documents_stream,
        span_probe_sink,
    )

    vocab = [f"v{i}" for i in range(20)]
    boiler = [f"s{i}" for i in range(10)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    fa = spark.createDataFrame(
        _span_fixture_rows(4, 1000, 20, boiler, vocab, every=2), schema
    )
    src = f"{tmpdir_spark}/docs_fresh"
    fa.coalesce(1).write.parquet(src)
    index_path = f"{tmpdir_spark}/span_index_fresh"  # never created
    out_path = f"{tmpdir_spark}/span_cov_fresh"

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(span_probe_sink(index_path, out_path))
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_fresh")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    empty_idx = spark.createDataFrame([], "h string")
    exp = sorted(
        (r.doc_id, r.n_dup_windows, r.dup_tokens)
        for r in incremental_duplicate_spans(fa, empty_idx).collect()
    )
    got = sorted(
        (r.doc_id, r.n_dup_windows, r.dup_tokens)
        for r in spark.read.parquet(out_path).collect()
    )
    assert got == exp
    stored = {r.h for r in spark.read.parquet(index_path).collect()}
    assert stored == {r.h for r in build_span_index(fa).collect()}


def test_span_probe_sink_kill_and_restart_exactly_once(
    spark, tmpdir_spark, monkeypatch
):
    """Kill-and-restart-from-checkpoint leg (VERDICT r13 ask #6): the
    stream CRASHES mid-batch — after the batch's coverage write, before
    its index append — then restarts from the checkpoint, which REPLAYS
    that batch_id. The restarted pipeline's stored index AND coverage
    must equal a never-killed control run bit-for-bit: coverage is
    idempotent because each batch overwrites its own batch_id
    partition (round 14 — a blind append duplicated the crashed
    attempt's rows), the index because novel hashes are anti-joined
    against the current index."""
    import dwh_with_dask_spark.operators.dedup as DD
    from dwh_with_dask_spark.streaming.docs import (
        read_documents_stream,
        span_probe_sink,
    )

    vocab = [f"v{i}" for i in range(20)]
    boiler = [f"s{i}" for i in range(10)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    corpus = spark.createDataFrame(
        _span_fixture_rows(6, 0, 40, boiler, vocab), schema
    )
    fa = spark.createDataFrame(
        _span_fixture_rows(7, 1000, 20, boiler, vocab, every=2), schema
    )
    fb = spark.createDataFrame(
        _span_fixture_rows(8, 2000, 20, boiler, vocab, every=2), schema
    )
    # one file per wave -> deterministic batch boundaries in every run
    src = f"{tmpdir_spark}/docs_kill"
    fa.coalesce(1).write.parquet(src)
    fb.coalesce(1).write.mode("append").parquet(src)

    def run(tag, sink_crashes=False):
        index_path = f"{tmpdir_spark}/idx_{tag}"
        out_path = f"{tmpdir_spark}/cov_{tag}"
        ckpt = f"{tmpdir_spark}/ckpt_{tag}"
        DD.build_span_index(corpus).write.parquet(index_path)

        if sink_crashes:
            # crash INSIDE the sink's second batch, after its coverage
            # write (build_span_index is the sink's next step)
            real = DD.build_span_index
            state = {"calls": 0}

            def flaky(df, k=8):
                state["calls"] += 1
                if state["calls"] == 2:
                    raise RuntimeError("injected crash before index append")
                return real(df, k)

            monkeypatch.setattr(DD, "build_span_index", flaky)
        try:
            q = (
                read_documents_stream(spark, src, max_files_per_trigger=1)
                .writeStream.foreachBatch(span_probe_sink(index_path, out_path))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(180)
                crashed = False
            except Exception:
                crashed = True
        finally:
            if sink_crashes:
                monkeypatch.setattr(DD, "build_span_index", real)
        if sink_crashes:
            assert crashed, "the injected crash must kill the query"
            # RESTART from the same checkpoint: batch 1 replays
            q2 = (
                read_documents_stream(spark, src, max_files_per_trigger=1)
                .writeStream.foreachBatch(span_probe_sink(index_path, out_path))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q2.awaitTermination(180)
        idx = sorted(r.h for r in spark.read.parquet(index_path).collect())
        cov = sorted(
            (r.batch_id, r.doc_id, r.n_dup_windows, r.dup_tokens)
            for r in spark.read.parquet(out_path).collect()
        )
        return idx, cov

    idx_ctl, cov_ctl = run("ctl")
    idx_kill, cov_kill = run("kill", sink_crashes=True)
    assert idx_kill == idx_ctl, "restarted index diverged from control"
    assert cov_kill == cov_ctl, (
        "replayed batch duplicated or lost coverage rows"
    )
    assert cov_ctl and idx_ctl  # fixture exercises the path


def test_scd2_merge_sink_applies_stream_batches(spark, tmpdir_spark):
    """Micro-batched dimension updates through scd2_merge_sink: keys
    touched by the stream gain a closed + a new current version; keys
    untouched pass through open. Update batches touch DISJOINT keys so
    the final table is micro-batch-order independent."""
    import datetime as _dt

    from dwh_with_dask_spark.operators.scd import scd2_from_changelog
    from dwh_with_dask_spark.streaming.warehouse import scd2_merge_sink

    base_ts = _dt.datetime(2024, 1, 1)
    seed = [(k, f"seg{k % 3}", base_ts, k) for k in range(20)]
    chg = spark.createDataFrame(
        seed, "cust long, segment string, ts timestamp, lsn long"
    )
    dim_path = f"{tmpdir_spark}/dim"
    scd2_from_changelog(
        chg, "cust", "ts", ["segment"], tiebreak_col="lsn"
    ).write.parquet(dim_path)

    t1 = _dt.datetime(2024, 2, 1)
    fa = spark.createDataFrame(
        [(k, "gold", t1) for k in range(0, 6)],
        "cust long, segment string, ts timestamp",
    )
    fb = spark.createDataFrame(
        [(k, "silver", t1) for k in range(10, 14)],
        "cust long, segment string, ts timestamp",
    )
    src = f"{tmpdir_spark}/updates"
    fa.coalesce(1).write.parquet(src)
    fb.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "cust long, segment string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            scd2_merge_sink(dim_path, "cust", ["segment"], "ts")
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_scd2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    dim = spark.read.parquet(dim_path)
    cur = {r.cust: r.segment for r in dim.filter("is_current").collect()}
    assert all(cur[k] == "gold" for k in range(0, 6))
    assert all(cur[k] == "silver" for k in range(10, 14))
    assert all(cur[k] == f"seg{k % 3}" for k in range(6, 10))
    changed = set(range(0, 6)) | set(range(10, 14))
    n_hist = dim.filter("NOT is_current").count()
    assert n_hist == len(changed)
    closed = {
        r.cust: r.valid_to for r in dim.filter("NOT is_current").collect()
    }
    assert set(closed) == changed
    assert all(v == t1 for v in closed.values())


def test_scd2_merge_sink_crash_replay_is_idempotent(spark, tmpdir_spark):
    """VERDICT r6 ask #5 + ADVICE r6: the write-new/rename commit has a
    window between the two renames where NO table sits at dim_path (the
    complete previous table is at .__old__, a possibly-partial write at
    .__tmp__). Simulate a crash inside that window, then deliver the
    batch: _recover_dim_swap must restore the backup and discard the
    partial tmp, and the merge must apply. Deliver the SAME batch once
    more (foreachBatch redelivery after a crash-after-commit): the
    dimension must be row-identical — the idempotent-merge claim."""
    import datetime as _dt
    import os as _os

    from dwh_with_dask_spark.operators.scd import scd2_from_changelog
    from dwh_with_dask_spark.streaming.warehouse import scd2_merge_sink

    base_ts = _dt.datetime(2024, 1, 1)
    seed = [(k, f"seg{k % 3}", base_ts, k) for k in range(10)]
    chg = spark.createDataFrame(
        seed, "cust long, segment string, ts timestamp, lsn long"
    )
    dim_path = f"{tmpdir_spark}/dim_crash"
    scd2_from_changelog(
        chg, "cust", "ts", ["segment"], tiebreak_col="lsn"
    ).write.parquet(dim_path)

    t1 = _dt.datetime(2024, 2, 1)
    batch = spark.createDataFrame(
        [(k, "gold", t1) for k in range(0, 4)],
        "cust long, segment string, ts timestamp",
    )
    fn = scd2_merge_sink(dim_path, "cust", ["segment"], "ts")

    # crash state: dim renamed away, backup complete, tmp partial junk
    old, tmp = dim_path + ".__old__", dim_path + ".__tmp__"
    _os.rename(dim_path, old)
    batch.limit(1).write.parquet(tmp)  # stand-in for a partial write
    assert not _os.path.exists(dim_path)

    fn(batch, 7)  # delivery after the crash: recover, then merge
    assert _os.path.exists(dim_path)
    assert not _os.path.exists(tmp)

    def rows():
        return sorted(
            (r.cust, r.segment, r.valid_from, r.valid_to, r.is_current)
            for r in spark.read.parquet(dim_path).collect()
        )

    after_first = rows()
    cur = {c: s for c, s, _f, _t, is_c in after_first if is_c}
    assert all(cur[k] == "gold" for k in range(0, 4))
    assert all(cur[k] == f"seg{k % 3}" for k in range(4, 10))

    fn(batch, 7)  # redelivery of the identical batch
    assert rows() == after_first


def test_upsert_sink_stream_equals_batch_merge_and_replay(
    spark, tmpdir_spark
):
    """Type-1 dimension streaming leg: micro-batched upserts through
    merge_into produce exactly the per-key-latest table, and replaying
    a batch is a no-op by VALUE idempotence (same values rewrite the
    same rows — no watermark needed, unlike the agg sink)."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from dwh_with_dask_spark.streaming.warehouse import upsert_sink

    T = _dt.datetime
    rows = [
        (k, f"v{b}_{k}", T(2024, 1, b + 1))
        for b in range(4)
        for k in range(b, 10 + b)  # overlapping key ranges per batch
    ]
    src = f"{tmpdir_spark}/ups_in"
    for b in range(4):
        spark.createDataFrame(
            [r for r in rows if r[2] == T(2024, 1, b + 1)],
            "k long, s string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)

    dim = f"{tmpdir_spark}/ups_dim"
    stream = spark.readStream.schema("k long, s string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(upsert_sink(dim, ["k"], ts_col="ts"))
        .option("checkpointLocation", f"{tmpdir_spark}/ups_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def rows_of():
        return sorted(
            (r.k, r.s, r.ts) for r in spark.read.parquet(dim).collect()
        )

    got = rows_of()
    # batch twin: latest observation per key across the whole input
    from pyspark.sql.window import Window as _W

    d = spark.createDataFrame(rows, "k long, s string, ts timestamp")
    want = sorted(
        (r.k, r.s, r.ts)
        for r in d.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("k").orderBy(F.col("ts").desc(), F.col("k"))
            ),
        )
        .filter("__rn = 1")
        .drop("__rn")
        .collect()
    )
    assert got == want

    # replay the last batch: value-idempotent
    fn = upsert_sink(dim, ["k"], ts_col="ts")
    fn(
        spark.createDataFrame(
            [r for r in rows if r[2] == T(2024, 1, 4)],
            "k long, s string, ts timestamp",
        ),
        99,
    )
    assert rows_of() == got


def test_incremental_agg_sink_stream_equals_batch_and_replay(
    spark, tmpdir_spark
):
    """Streaming leg of merge_aggregate_state (VERDICT r7 ask #7): a
    real micro-batched stream folds per-batch partials into the stored
    state; the final state must equal the one-shot batch aggregate
    BIT-FOR-BIT (exact DECIMAL sums — merge order can't change a bit).
    Then the exactly-once contract: redelivering an already-folded
    batch_id is a no-op (sum-folding is NOT idempotent, the _meta.json
    watermark is the dedup), and a crash inside the swap window heals
    on the next delivery."""
    import os as _os

    from pyspark.sql import functions as F

    from dwh_with_dask_spark.streaming.warehouse import incremental_agg_sink

    rows = [(i % 7, float(i * 3 % 11) + 0.25) for i in range(200)]
    d = spark.createDataFrame(rows, "k long, v double")
    src = f"{tmpdir_spark}/agg_in"
    for i in range(4):  # 4 files -> 4 micro-batches
        spark.createDataFrame(
            rows[i * 50 : (i + 1) * 50], "k long, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    def partial(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(23,2)")).alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )

    state = f"{tmpdir_spark}/agg_state"
    stream = spark.readStream.schema("k long, v double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(incremental_agg_sink(state, ["k"], partial))
        .option("checkpointLocation", f"{tmpdir_spark}/agg_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def rows_of(df):
        return sorted(
            (r.k, r.n, str(r.sum_v), r.min_v, r.max_v) for r in df.collect()
        )

    got = rows_of(spark.read.parquet(state))
    want = rows_of(partial(d))
    assert got == want  # stream == batch, bit-for-bit

    # redelivery of an already-folded batch_id: watermark makes it a no-op
    fn = incremental_agg_sink(state, ["k"], partial)
    replay = spark.createDataFrame(rows[:50], "k long, v double")
    fn(replay, 0)
    assert rows_of(spark.read.parquet(state)) == want

    # a NEW batch_id folds; then crash inside the swap window + redeliver
    extra = spark.createDataFrame([(99, 5.0), (99, 7.0)], "k long, v double")
    fn(extra, 100)
    after = rows_of(spark.read.parquet(state))
    assert (99, 2, "12.00", 5.0, 7.0) in after
    _os.rename(state, state + ".__old__")
    extra.limit(1).write.parquet(state + ".__tmp__")  # partial junk
    fn(extra, 101)  # heal, then fold 101
    healed = rows_of(spark.read.parquet(state))
    assert (99, 4, "24.00", 5.0, 7.0) in healed
    assert not _os.path.exists(state + ".__tmp__")


def test_dq_gate_sink_routes_and_counts(spark, tmpdir_spark):
    from dwh_with_dask_spark.operators.dq import Rule
    from dwh_with_dask_spark.streaming.warehouse import dq_gate_sink

    rows = [
        (1, "a", 10.0), (2, None, 5.0), (3, "b", -1.0),
        (4, "zz", 7.0), (5, "a", None), (6, "b", 3.0),
    ]
    d = spark.createDataFrame(rows, "id long, cat string, val double")
    src = f"{tmpdir_spark}/dq_in"
    d.repartition(2).write.parquet(src)

    rules = [
        Rule(kind="not_null", column="cat"),
        Rule(kind="in_set", column="cat", values=["a", "b"]),
        Rule(kind="in_range", column="val", lo=0.0, hi=100.0),
    ]
    pp, qp, sp = (
        f"{tmpdir_spark}/dq_pass",
        f"{tmpdir_spark}/dq_quar",
        f"{tmpdir_spark}/dq_stats",
    )
    stream = spark.readStream.schema("id long, cat string, val double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(dq_gate_sink(rules, pp, qp, sp))
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_dq")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    passed = {r.id for r in spark.read.parquet(pp).collect()}
    quar = {
        r.id: set(r.dq_violations)
        for r in spark.read.parquet(qp).collect()
    }
    assert passed == {1, 4, 6} - {4}  # 4 fails in_set
    assert passed == {1, 6}
    assert quar[2] == {"not_null:cat", "in_set:cat"}
    assert quar[3] == {"in_range:val"}
    assert quar[4] == {"in_set:cat"}
    assert quar[5] == {"in_range:val"}
    assert set(quar) | passed == {1, 2, 3, 4, 5, 6}
    stats = {
        (r.rule): r.n
        for r in spark.read.parquet(sp)
        .groupBy("rule")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert stats == {"not_null:cat": 1, "in_set:cat": 2, "in_range:val": 2}


def test_upsert_sink_same_ts_tie_is_deterministic(spark, tmpdir_spark):
    """Two observations with the same key AND timestamp must pick a
    winner that is a pure function of the data (the value-struct
    tie-break), not of partitioning: any partitioning of the batch
    produces the identical stored row."""
    import datetime as _dt

    from dwh_with_dask_spark.streaming.warehouse import upsert_sink

    T = _dt.datetime
    batch = [(1, s, T(2024, 1, 1)) for s in ("alpha", "zeta", "mid")]
    results = []
    for parts in (1, 3, 7):
        dim = f"{tmpdir_spark}/tie_{parts}"
        fn = upsert_sink(dim, ["k"], ts_col="ts")
        fn(
            spark.createDataFrame(
                batch, "k long, s string, ts timestamp"
            ).repartition(parts),
            0,
        )
        results.append(spark.read.parquet(dim).collect()[0].s)
    assert results == ["zeta", "zeta", "zeta"]  # max value struct


def test_versioned_commit_sink_stats_propagate_to_prune(
    spark, tmpdir_spark
):
    """VERDICT r8 ask #7: versioned_commit_sink(stats_cols=...) must
    carry per-BATCH min/max into each streamed commit's manifest, and a
    pruned read over the streamed table must return exactly the
    batch-filtered rows while listing only the overlapping batch
    directories."""
    import datetime as _dt

    from dwh_with_dask_spark.versioned import (
        list_versions,
        manifest_dirs,
        read_version,
        versioned_commit_sink,
    )

    T = _dt.datetime
    src = f"{tmpdir_spark}/batches"
    days = [1, 2, 3]
    for d in days:  # one file per day -> one micro-batch per day
        spark.createDataFrame(
            [(d * 10 + j, T(2024, 1, d, 6 + j)) for j in range(4)],
            "id long, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)

    table = f"{tmpdir_spark}/vtable"
    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            versioned_commit_sink(table, mode="append", stats_cols=["ts"])
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_vsink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    manifests = list_versions(table)
    assert len(manifests) == 3  # one commit per micro-batch
    final = manifests[-1]
    assert len(final["dirs"]) == 3
    # every streamed dir carries ts stats spanning exactly one day
    assert set(final["stats"]) == set(final["dirs"])
    for st in final["stats"].values():
        lo, hi = st["ts"]
        assert lo[:10] == hi[:10]
    # pruned read: only day-2's dir is listed, rows are exactly day 2
    pruned = manifest_dirs(
        table, prune={"ts": (T(2024, 1, 2), T(2024, 1, 2, 23))}
    )
    assert len(pruned) == 1
    df = read_version(
        spark, table, prune={"ts": (T(2024, 1, 2), T(2024, 1, 2, 23))}
    )
    assert all(pruned[0] in f for f in df.inputFiles())
    assert sorted(r.id for r in df.collect()) == [20, 21, 22, 23]


def test_streaming_srm_counters_equal_batch_guardrail(
    spark, tmpdir_spark
):
    """Experiment monitoring composes with the exactly-once streaming
    state: per-arm unit counters folded by incremental_agg_sink over 3
    micro-batches equal the full-batch counts, and the SRM z recomputed
    from the STORED counters equals srm_check over all units — the
    always-on guardrail pattern (counters stream, the test reads
    state)."""
    import math

    from dwh_with_dask_spark.operators.experiment import ab_assign, srm_check
    from dwh_with_dask_spark.streaming.warehouse import incremental_agg_sink

    src = f"{tmpdir_spark}/units"
    for b in range(3):  # disjoint unit ranges, one file -> one batch
        spark.range(b * 1000, (b + 1) * 1000).select(
            F.col("id").alias("user_id")
        ).coalesce(1).write.mode("append").parquet(src)

    state = f"{tmpdir_spark}/srm_state"

    def partial(df):
        return (
            df.select(ab_assign("user_id", salt="sexp").alias("arm"))
            .groupBy("arm")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_agg_sink(state, ["arm"], partial)
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_srm")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    counts = {r.arm: r.n for r in spark.read.parquet(state).collect()}
    full = spark.range(3000).select(
        ab_assign("id", salt="sexp").alias("arm")
    )
    want = srm_check(full).first()
    assert counts["control"] == want.n_control
    assert counts["treatment"] == want.n_treatment
    n = counts["control"] + counts["treatment"]
    z = round(
        (counts["treatment"] - n * 0.5) / math.sqrt(n * 0.5 * (1.0 - 0.5)),
        6,
    )
    assert z == want.srm_z


def test_streaming_psi_counters_equal_batch_drift(spark, tmpdir_spark):
    """Monitoring composes with the exactly-once streaming state the
    same way SRM does (round 10): per-BIN counters folded by
    incremental_agg_sink over 3 micro-batches feed
    psi_from_bin_counts, and every report column equals the batch
    population_stability over the same snapshots bit-for-bit — the
    binning expression (psi_bin) and the scoring tree are shared, the
    counts are exact longs, so streaming cannot drift from batch."""
    from dwh_with_dask_spark.operators.profile import (
        population_stability,
        psi_bin,
        psi_from_bin_counts,
    )
    from dwh_with_dask_spark.streaming.warehouse import incremental_agg_sink

    lo, hi, bins = 0.0, 100.0, 10

    def vals(seed, n):
        # deterministic synthetic metric, shifted per snapshot
        return [(i, float((i * 37 + seed) % 120) - 10.0) for i in range(n)]

    old_df = spark.createDataFrame(vals(0, 900), "id long, v double")
    src = f"{tmpdir_spark}/psi_new"
    for b in range(3):  # one file -> one micro-batch
        spark.createDataFrame(
            vals(53, 900)[b * 300 : (b + 1) * 300], "id long, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    state = f"{tmpdir_spark}/psi_state"

    def partial(df):
        return (
            df.filter(F.col("v").isNotNull())
            .select(psi_bin("v", lo, hi, bins).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_new"))
        )

    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_agg_sink(state, ["bin"], partial)
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_psi")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    old_counts = (
        old_df.filter(F.col("v").isNotNull())
        .select(psi_bin("v", lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    stored = spark.read.parquet(state).select("bin", "n_new")
    got = sorted(
        map(tuple, psi_from_bin_counts(old_counts, stored).collect())
    )
    new_df = spark.read.parquet(src)
    want = sorted(
        map(
            tuple,
            population_stability(old_df, new_df, "v", lo, hi, bins).collect(),
        )
    )
    assert got == want
    # the shifted snapshot genuinely drifts (nonzero total PSI)
    assert sum(r[5] for r in got) > 0


def test_streaming_ks_counters_equal_batch_binned(spark, tmpdir_spark):
    """Binned KS closes the streaming gap the exact test documents
    (VERDICT r10 ask #4 — ks_two_sample's state is distinct-value-
    sized on continuous columns): per-BIN counters folded exactly-once
    by incremental_agg_sink over 3 micro-batches feed
    ks_from_bin_counts, and every report column equals the batch
    ks_two_sample_binned over the same snapshots BIT-FOR-BIT — the
    binning expression (psi_bin) and the _ks_report scoring tree are
    shared, the counters are exact longs. The shifted snapshot also
    pins discrimination (reject fires) and the documented resolution
    bound (D_binned <= D_exact)."""
    from dwh_with_dask_spark.operators.profile import (
        ks_from_bin_counts,
        ks_two_sample,
        ks_two_sample_binned,
        psi_bin,
    )
    from dwh_with_dask_spark.streaming.warehouse import incremental_agg_sink

    lo, hi, bins = 0.0, 100.0, 20

    def vals(shift, n):
        # continuous-ish synthetic metric: every value distinct, so the
        # exact test's state would be n rows; the binned state is 20
        return [
            (i, ((i * 37) % 120) + i / 10000.0 + shift) for i in range(n)
        ]

    old_df = spark.createDataFrame(vals(0.0, 900), "id long, v double")
    src = f"{tmpdir_spark}/ks_new"
    for b in range(3):  # one file -> one micro-batch
        spark.createDataFrame(
            vals(9.0, 900)[b * 300 : (b + 1) * 300], "id long, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    state = f"{tmpdir_spark}/ks_state"

    def partial(df):
        return (
            df.filter(F.col("v").isNotNull())
            .select(psi_bin("v", lo, hi, bins).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_new"))
        )

    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_agg_sink(state, ["bin"], partial)
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_ks")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    old_counts = (
        old_df.filter(F.col("v").isNotNull())
        .select(psi_bin("v", lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    stored = spark.read.parquet(state).select("bin", "n_new")
    got = ks_from_bin_counts(old_counts, stored).collect()
    new_df = spark.read.parquet(src)
    want = ks_two_sample_binned(
        old_df, new_df, "v", lo, hi, bins
    ).collect()
    assert list(map(tuple, got)) == list(map(tuple, want))
    # the shifted snapshot genuinely drifts through the binned statistic
    assert got[0]["reject"] is True and got[0]["ks_d"] > 0
    # resolution bound: the binned D never exceeds the exact D
    exact = ks_two_sample(old_df, new_df, "v").first()
    assert got[0]["ks_d"] <= exact["ks_d"]


def test_streaming_cusum_equals_batch_alarm(spark, tmpdir_spark):
    """cusum_sink: three day-batches folded with two doubles of per-key
    state reproduce operators/timeseries.cusum_alarm over the full
    series BIT-FOR-BIT (the ghost-row fold keeps the batch-boundary
    additions associating exactly as the uninterrupted window sum) —
    including alarms that only fire in LATER batches as the shift
    accumulates, and a key that stops arriving mid-stream."""
    import datetime as _dt

    from dwh_with_dask_spark.operators.timeseries import cusum_alarm
    from dwh_with_dask_spark.streaming.warehouse import cusum_sink

    T = _dt.datetime
    # key 'a': level 10 for days 1-4, shifted to 13 for days 5-9
    # key 'b': flat at 10, stops after day 6
    def day_rows(d):
        rows = []
        lvl = 10.0 if d <= 4 else 13.0
        rows += [("a", T(2024, 1, d, h), lvl + (h % 3) * 0.25)
                 for h in range(4)]
        if d <= 6:
            rows += [("b", T(2024, 1, d, h), 10.0 + (h % 2) * 0.5)
                     for h in range(4)]
        return rows

    src = f"{tmpdir_spark}/cusum_src"
    days = list(range(1, 10))
    batches = [days[0:3], days[3:6], days[6:9]]
    for chunk in batches:  # one file -> one micro-batch of whole days
        rows = [r for d in chunk for r in day_rows(d)]
        spark.createDataFrame(
            rows, "key string, ts timestamp, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    state = f"{tmpdir_spark}/cusum_state"
    results = f"{tmpdir_spark}/cusum_results"
    stream = (
        spark.readStream.schema("key string, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            cusum_sink(
                state, results, "key", "ts", "v",
                threshold=5.0, drift=10.25, unit="day", value_decimals=2,
            )
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_cusum")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r.key, r.bucket, r.value, r.cusum, r.alarm)
        for r in spark.read.parquet(results).collect()
    )
    full = spark.createDataFrame(
        [r for d in days for r in day_rows(d)],
        "key string, ts timestamp, v double",
    )
    want = sorted(
        map(
            tuple,
            cusum_alarm(
                full, "key", "ts", "v",
                threshold=5.0, drift=10.25, unit="day", value_decimals=2,
            ).collect(),
        )
    )
    assert got == want
    # the shift genuinely alarms, and only after accumulation (not on
    # the shift day itself) — the sequential-detection point
    a_rows = {r[1].day: (r[3], r[4]) for r in got if r[0] == "a"}
    assert not a_rows[5][1] and a_rows[9][1]
    # key 'b' never alarms and carries through its absent batches
    assert all(not r[4] for r in got if r[0] == "b")
    assert sum(1 for r in got if r[0] == "b") == 6
    # the in-order contract is ENFORCED, not assumed: replaying an
    # already-folded day through a NEW batch id must raise loudly
    # instead of silently folding it into the wrong position
    import pytest

    sink = cusum_sink(
        state, f"{tmpdir_spark}/cusum_results2", "key", "ts", "v",
        threshold=5.0, drift=10.25, unit="day", value_decimals=2,
    )
    stale = spark.createDataFrame(
        day_rows(3), "key string, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="out-of-order bucket"):
        sink(stale, batch_id=99)


def test_streaming_msprt_counters_equal_batch_readout(
    spark, tmpdir_spark
):
    """The always-valid readout is DESIGNED for continuous monitoring —
    compose it with the exactly-once counter state exactly like the SRM
    leg: per-(arm) n/x counters folded by incremental_agg_sink over 3
    micro-batches equal the full-batch counts, and msprt_always_valid
    recomputed from the STORED counters equals the batch readout
    row-for-row (every statistic is a pure function of the four exact
    counters, so peeking after each batch costs nothing but this
    counters read)."""
    from dwh_with_dask_spark.operators.experiment import (
        ab_assign,
        msprt_always_valid,
    )
    from dwh_with_dask_spark.streaming.warehouse import incremental_agg_sink

    src = f"{tmpdir_spark}/msprt_units"
    for b in range(3):  # disjoint unit ranges, one file -> one batch
        spark.range(b * 800, (b + 1) * 800).select(
            F.col("id").alias("user_id"),
            # deterministic conversion flag, imbalanced by arm via the
            # id parity so the effect is nonzero
            ((F.col("id") % 7 < 2) | (F.col("id") % 2 == 0)).cast(
                "int"
            ).alias("converted"),
        ).coalesce(1).write.mode("append").parquet(src)

    state = f"{tmpdir_spark}/msprt_state"

    def partial(df):
        return (
            df.select(
                ab_assign("user_id", salt="mexp").alias("arm"), "converted"
            )
            .groupBy("arm")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("converted").alias("sum_x"),
            )
        )

    stream = (
        spark.readStream.schema("user_id long, converted int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_agg_sink(state, ["arm"], partial)
        )
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_msprt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # reconstruct a units-shaped frame FROM THE COUNTERS (n rows per
    # arm would defeat the point — feed the operator the counters by
    # expanding to the minimal per-arm (converted, weight) rows? No:
    # the operator's statistics are pure functions of the 4 counters,
    # so an exact reconstruction is (x ones + (n-x) zeros) per arm)
    counters = {r.arm: (r.n, r.sum_x) for r in spark.read.parquet(state).collect()}
    rows = []
    for arm, (n, x) in counters.items():
        rows += [(arm, 1)] * int(x) + [(arm, 0)] * int(n - x)
    from_state = msprt_always_valid(
        spark.createDataFrame(rows, "arm string, converted int"), tau=0.1
    ).first()
    full = spark.read.parquet(src).select(
        ab_assign("user_id", salt="mexp").alias("arm"), "converted"
    )
    want = msprt_always_valid(full, tau=0.1).first()
    assert from_state.asDict() == want.asDict()
    assert from_state.n_control == counters["control"][0]
    assert from_state.n_treatment == counters["treatment"][0]


def test_streaming_bloom_probe_equals_batch(spark, tmpdir_spark):
    """bloom_probe_rowlocal on a document stream == the batch
    bloom_probe fold: the row-local form is k stream-static broadcast
    joins + one boolean conjunction (no aggregation, append-legal),
    and its per-id answers must match the groupBy fold bit-for-bit —
    planted members, fresh keys, and any md5 false positives alike."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.dedup import normalize_text
    from dwh_with_dask_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        bloom_probe_rowlocal,
    )

    members = [(i, f"seen document number {i} body") for i in range(60)]
    arriving = [
        (100 + i, f"seen document number {i} body") for i in range(0, 30)
    ] + [(200 + i, f"fresh arrival {i} text") for i in range(40)]
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(members, schema)
    arr = spark.createDataFrame(arriving, schema)
    bloom = bloom_build(corpus, normalize_text("text"), m_bits=2048, k=4)
    bloom = bloom.persist()
    bloom.count()

    src = f"{tmpdir_spark}/bloom_stream"
    arr.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(arr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        bloom_probe_rowlocal(
            bloom, stream, normalize_text("text"),
            m_bits=2048, k=4, out_col="maybe",
        )
        .select("doc_id", "maybe")
        .writeStream.format("memory")
        .queryName(f"bloomprobe_{_uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_bloom")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.maybe
        for r in spark.sql(f"SELECT * FROM {q.name}").collect()
    }
    want = {
        r.doc_id: r.maybe
        for r in bloom_probe(
            bloom, arr, normalize_text("text"), id_col="doc_id",
            m_bits=2048, k=4, out_col="maybe",
        ).collect()
    }
    bloom.unpersist()
    assert got == want
    # contract spot-checks: replayed member texts read True, and the
    # fixture has both classes present
    assert all(got[100 + i] for i in range(0, 30))
    assert not all(got[200 + i] for i in range(40))


def test_versioned_merge_sink_streaming_upsert_idempotent(
    spark, tmpdir_spark
):
    """versioned_merge_sink: a keyed stream upserts into the versioned
    table (first batch plain commit, later batches dir-granular merge),
    and REPLAYING a batch leaves the table content bit-identical — the
    exactly-once-shaped property the append sink cannot give."""
    from dwh_with_dask_spark.versioned import (
        read_version,
        versioned_merge_sink,
    )

    src = f"{tmpdir_spark}/mrg_batches"
    # batch 1: keys 1..4; batch 2: update 2,3 + insert 9
    spark.createDataFrame(
        [(k, f"v{k}", 0) for k in (1, 2, 3, 4)], "k long, v string, rev int"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, "v2b", 1), (3, "v3b", 1), (9, "v9", 1)],
        "k long, v string, rev int",
    ).coalesce(1).write.mode("append").parquet(src)

    table = f"{tmpdir_spark}/mrg_vtable"
    sink = versioned_merge_sink(table, ["k"])
    stream = (
        spark.readStream.schema("k long, v string, rev int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir_spark}/ckpt_mrgsink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def content():
        return sorted(
            (r.k, r.v, r.rev) for r in read_version(spark, table).collect()
        )

    want = [(1, "v1", 0), (2, "v2b", 1), (3, "v3b", 1), (4, "v4", 0),
            (9, "v9", 1)]
    assert content() == want
    # crash-replay of the LAST batch: content is bit-identical after
    replay = spark.createDataFrame(
        [(2, "v2b", 1), (3, "v3b", 1), (9, "v9", 1)],
        "k long, v string, rev int",
    )
    sink(replay, 1)
    assert content() == want


def test_expire_versions_retention(spark, tmpdir_spark):
    """expire_versions drops old manifests and reclaims dirs only the
    expired versions referenced; kept-window time travel intact."""
    import pytest as _pytest

    from dwh_with_dask_spark.versioned import (
        expire_versions,
        read_version,
        versioned_commit,
    )

    t = f"{tmpdir_spark}/exp"
    for i in range(3):  # overwrites: each version references only its dir
        versioned_commit(
            spark.createDataFrame([(i,)], "k int"), t, mode="overwrite"
        )
    rep = expire_versions(t, keep_last=1)
    assert rep == {"manifests_removed": 2, "dirs_removed": 2}
    assert [r.k for r in read_version(spark, t).collect()] == [2]
    with _pytest.raises(FileNotFoundError):
        read_version(spark, t, version=1)
    # idempotent second run
    assert expire_versions(t, keep_last=1) == {
        "manifests_removed": 0, "dirs_removed": 0,
    }
    # vacuum and list_versions survive the retention gap (regression:
    # list_versions used to open every manifest 1..cur and crashed on
    # an expired table, taking vacuum down with it)
    from dwh_with_dask_spark.versioned import list_versions, vacuum

    assert [m["version"] for m in list_versions(t)] == [3]
    assert vacuum(t)["removed_dirs"] == 0
    assert [r.k for r in read_version(spark, t).collect()] == [2]


def test_token_budget_sink_stream_equals_batch_and_replay(
    spark, tmpdir_spark
):
    """Streaming leg of token_budget_sample (VERDICT r14 ask #6): a
    one-batch stream is BIT-IDENTICAL to the batch operator; a
    multi-batch stream fills remaining budgets in arrival order
    (composes exactly: batch-local running total <= remaining ⟺
    global total <= budget); a redelivered batch_id is a no-op."""
    import json
    import os as _os
    import random

    from dwh_with_dask_spark.operators.curation import token_budget_sample
    from dwh_with_dask_spark.streaming.docs import token_budget_sink

    rng = random.Random(31)
    rows = [
        (
            i,
            " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(3, 20))),
            "web" if i % 3 else "code",
        )
        for i in range(300)
    ]
    schema = "doc_id long, text string, source string"
    budget = {"web": 900, "code": 400}

    def rows_of(df):
        return sorted(
            (r.id, r.source, r.n_tokens, r.cum_tokens) for r in df.collect()
        )

    # --- leg 1: ONE batch == the batch operator, bit for bit
    src1 = f"{tmpdir_spark}/tb_in1"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src1)
    out1, st1 = f"{tmpdir_spark}/tb_out1", f"{tmpdir_spark}/tb_state1"
    q = (
        spark.readStream.schema(schema).parquet(src1)
        .writeStream.foreachBatch(token_budget_sink(out1, st1, budget))
        .option("checkpointLocation", f"{tmpdir_spark}/tb_ckpt1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = rows_of(spark.read.parquet(out1).drop("batch_id"))
    want = rows_of(token_budget_sample(spark.createDataFrame(rows, schema), budget))
    assert got == want and got, "single-batch stream == batch operator"

    # --- leg 2: multi-batch arrival-order fill + exact state
    src2 = f"{tmpdir_spark}/tb_in2"
    for i in range(3):
        spark.createDataFrame(rows[i * 100 : (i + 1) * 100], schema)\
            .coalesce(1).write.mode("append").parquet(src2)
    out2, st2 = f"{tmpdir_spark}/tb_out2", f"{tmpdir_spark}/tb_state2"
    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src2)
        .writeStream.foreachBatch(token_budget_sink(out2, st2, budget))
        .option("checkpointLocation", f"{tmpdir_spark}/tb_ckpt2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    with open(st2) as f:
        state = json.load(f)
    assert state["last_batch_id"] == 2
    # state cum = ALL tokens seen per source (dropped docs included)
    from dwh_with_dask_spark.operators.dedup import text_tokens

    from pyspark.sql import functions as F

    all_tok = {
        r.source: r.t
        for r in spark.createDataFrame(rows, schema)
        .groupBy("source")
        .agg(F.sum(F.size(text_tokens("text"))).alias("t"))
        .collect()
    }
    assert state["cum"] == {k: int(v) for k, v in all_tok.items()}
    # compositional reference: batch operator applied batch-by-batch
    # with remaining budgets, cum shifted — the documented semantics
    ref, cum = [], {s: 0 for s in budget}
    for i in range(3):
        chunk = spark.createDataFrame(rows[i * 100 : (i + 1) * 100], schema)
        rem = {s: max(budget[s] - cum[s], 0) for s in budget}
        for r in token_budget_sample(chunk, rem).collect():
            ref.append((r.id, r.source, r.n_tokens, r.cum_tokens + cum[r.source]))
        for r in chunk.groupBy("source").agg(
            F.sum(F.size(text_tokens("text"))).alias("t")
        ).collect():
            cum[r.source] += int(r.t)
    got2 = rows_of(spark.read.parquet(out2).drop("batch_id"))
    assert got2 == sorted(ref)
    # budgets respected globally
    for s in budget:
        kept_cum = [c for (_, src, _, c) in got2 if src == s]
        assert all(c <= budget[s] for c in kept_cum)

    # --- leg 3: replay idempotence — redeliver batch 0 by hand
    before = rows_of(spark.read.parquet(out2))
    sink = token_budget_sink(out2, st2, budget)
    sink(spark.createDataFrame(rows[:100], schema), 0)  # batch_id 0 replay
    with open(st2) as f:
        assert json.load(f) == state, "state untouched by replay"
    assert rows_of(spark.read.parquet(out2)) == before
