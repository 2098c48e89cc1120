"""Sinks: distributed writers (SURVEY.md §2A #26-28 Spark mappings).

The reference always collects to the driver before writing
(compute().to_sql). Every sink here writes from the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Parquet sink. ``partition_by`` produces hive-style directory
    partitioning — the thing that makes downstream partition pruning work
    at 100 TB (pick low-cardinality columns: date, source, lang)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: later equi-joins/aggs on ``bucket_by``
    read co-located buckets and skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def export_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Deterministic pseudorandom shuffle into exactly ``n_shards``
    hive-partitioned shards — the training-data export shape: shard
    membership AND within-shard order depend only on (id, seed), never
    on input partitioning, cluster size, or execution order, so a rerun
    (or a different cluster) reproduces byte-identical shards.

    shard = pmod(xxhash64(id, seed), n_shards); rows are repartitioned
    on the shard column, sorted by the same hash within partitions
    (files inherit the sort), and written with partitionBy(shard).
    Re-seeding gives an independent permutation — epochs without
    rereading in a new order. Shards are balanced in expectation
    (multinomial over a 64-bit hash).
    """
    from pyspark.sql import functions as F

    key = F.xxhash64(F.col(id_col), F.lit(seed))
    (
        df.withColumn("shard", F.pmod(key, F.lit(n_shards)).cast("int"))
        .withColumn("__shuffle_key", key)
        .repartition("shard")
        .sortWithinPartitions("shard", "__shuffle_key", id_col)
        .drop("__shuffle_key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def export_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = (),
    seed: int = 0,
    payload_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Training-data export in the webdataset convention: ``n_shards``
    tar files, each sample a ``{key}.txt`` (payload) + ``{key}.json``
    (metadata) member pair — the shard layout sequence-trainer loaders
    stream without an engine. Multimodal samples pass extra payload
    columns via ``payload_cols`` (column → member suffix, e.g.
    ``{"content": "png"}``): binary columns write raw bytes, string
    columns UTF-8 — the image/audio member next to the .txt/.json pair,
    exactly the webdataset layout vision-language loaders expect.

    Distribution shape: shard = pmod(xxhash64(id, seed), n_shards)
    (the export_shuffled_shards assignment), rows hash-repartition on
    the shard column — a shard never splits across partitions, so
    exactly one task owns each tar — and a ``mapInPandas`` pass on the
    executors streams its partition into one tar per shard it owns;
    the driver never sees a sample.
    Determinism: membership and order depend only on (id, seed); tar
    members are written with zeroed mtime/uid/gid, so re-runs are
    byte-identical (asserted by sha256 in tests). Returns the manifest
    as a DataFrame: (shard, tar_path, n_samples, sha256).

    Local paths here; at cluster scale the open() swaps for an object-
    store filesystem — the partitioning and tar framing are unchanged.
    """
    import hashlib
    import io
    import json
    import os
    import tarfile

    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    payload_cols = payload_cols or {}
    if len(set(payload_cols.values())) != len(payload_cols):
        # two members with one suffix would collide in the {key}.{suffix}
        # naming and on DataSource readback (bins is keyed by suffix)
        raise ValueError("payload_cols suffixes must be distinct")
    for reserved in ("txt", "json"):
        if reserved in payload_cols.values():
            raise ValueError(
                f"payload suffix '{reserved}' collides with the "
                "text/metadata members"
            )
    key = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    cols = [id_col, text_col, *meta_cols, *payload_cols]
    prepared = (
        df.select(*cols)
        .withColumn("__shard", F.pmod(key, F.lit(n_shards)).cast("int"))
        .withColumn("__pri", key)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__pri", id_col)
    )

    def write_partition(batches):
        import pandas as pd

        state: dict[int, tuple] = {}

        def close_shard(shard):
            tar, buf, n = state.pop(shard)
            tar.close()
            data = buf.getvalue()
            tar_path = os.path.join(path, f"shard-{shard:05d}.tar")
            with open(tar_path, "wb") as f:
                f.write(data)
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "tar_path": [tar_path],
                    "n_samples": [n],
                    "sha256": [hashlib.sha256(data).hexdigest()],
                }
            )

        meta_keys = (id_col, *meta_cols)
        for pdf in batches:
            # groupby(sort=True) preserves within-group row order, so
            # samples stay in (__pri, id) order inside each tar.
            for shard_key, grp in pdf.groupby("__shard", sort=True):
                shard = int(shard_key)
                if shard not in state:
                    buf = io.BytesIO()
                    state[shard] = (tarfile.open(fileobj=buf, mode="w"), buf, 0)
                tar, buf, n = state[shard]
                metas = [grp[c].tolist() for c in meta_keys]
                extras = [grp[c].tolist() for c in payload_cols]
                suffixes = list(payload_cols.values())
                for rid, text, *rest in zip(
                    grp[id_col], grp[text_col], *metas, *extras
                ):
                    mvals = rest[: len(meta_keys)]
                    evals = rest[len(meta_keys):]
                    payload = (text or "").encode("utf-8")
                    meta = json.dumps(
                        {
                            c: _json_safe(v)
                            for c, v in zip(meta_keys, mvals)
                        },
                        sort_keys=True,
                    ).encode("utf-8")
                    members = [(".txt", payload), (".json", meta)]
                    for sfx, ev in zip(suffixes, evals):
                        if ev is None:
                            continue
                        blob = ev if isinstance(ev, (bytes, bytearray)) else str(ev).encode("utf-8")
                        members.append((f".{sfx}", bytes(blob)))
                    for suffix, blob in members:
                        info = tarfile.TarInfo(name=f"{rid}{suffix}")
                        info.size = len(blob)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tar.addfile(info, io.BytesIO(blob))
                    n += 1
                state[shard] = (tar, buf, n)
        for shard in sorted(state):
            yield close_shard(shard)

    manifest_schema = (
        "shard int, tar_path string, n_samples long, sha256 string"
    )
    return prepared.mapInPandas(write_partition, schema=manifest_schema)


def _json_safe(v):
    """JSON-encodable scalar: numpy/pandas scalars → Python natives."""
    if hasattr(v, "item"):
        return v.item()
    return v


def compact_table(
    spark,
    path: str,
    target_file_mb: int = 128,
    order_by: list[str] | None = None,
) -> dict:
    """Small-files compaction — the table-maintenance pass every
    streaming/append warehouse needs: micro-batch sinks and per-batch
    appends leave thousands of KB-sized parquet files, and at 100 TB
    the resulting task-per-file scheduling + footer-read overhead
    dominates scans. Rewrite the table into files of
    ~``target_file_mb`` (computed from the CURRENT on-disk bytes, so
    the file count adapts to the data, not a guessed constant), then
    atomically-ish swap directories (write-new/rename). Crash contract
    (ADVICE r7): the two-rename swap has a window where NO table sits at
    ``path`` while the complete pre-compaction table sits at
    ``.__old__``; this function HEALS that window at entry
    (``_recover_dim_swap`` — restore ``.__old__``, discard ``.__tmp__``)
    so a re-run after any crash sees the intact table and compacts it
    again. An arbitrary reader hitting the window before the re-run
    still errors — readers needing a no-window publish should store the
    table via ``versioned.versioned_commit`` (atomic pointer) instead.

    ``order_by`` optionally sorts within the rewrite (repartitionByRange
    + sortWithinPartitions) so compaction doubles as clustering for
    min/max data skipping — pair with operators.zorder for
    multi-dimension skipping.

    Returns {"files_before", "files_after", "bytes", "target_files"}.
    """
    import math
    import os
    import shutil

    from dwh_with_dask_spark.streaming.warehouse import _recover_dim_swap

    _recover_dim_swap(path)

    def _stats(p: str) -> tuple[int, int]:
        n, b = 0, 0
        for dp, _dirs, fns in os.walk(p):
            for fn in fns:
                if fn.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(dp, fn))
        return n, b

    files_before, bytes_total = _stats(path)
    target_files = max(1, math.ceil(bytes_total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if order_by:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in order_by]
        df = df.repartitionByRange(target_files, *cols).sortWithinPartitions(*cols)
    else:
        df = df.coalesce(target_files)
    tmp, old = path + ".__tmp__", path + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    files_after, _ = _stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": bytes_total,
        "target_files": target_files,
    }
