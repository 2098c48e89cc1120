"""Per-corpus cached index artifacts for stored-index driver queries.

The driver/bench harness invokes each registered query as a fresh
callable ``(spark, sf_dir) -> DataFrame``, but the stored-index
operators (``build_bm25_index``, ``build_ivfpq_index``, ...) exist
precisely because the index is built ONCE and probed many times. This
module gives driver queries that amortization honestly: the first
invocation for a given corpus builds the index into a content-keyed
cache directory (gitignored ``.localdata/index_cache``), every later
invocation — including every timed bench run after the warmup — probes
the stored artifact only. The cache key hashes the source table's
path + file sizes + mtimes, so regenerated test data invalidates the
cache instead of silently serving a stale index.

This is cache management for the HARNESS, not an operator: at 100 TB
the build step is a scheduled pipeline writing to the warehouse and
the probe is the online query — exactly the split these driver rows
exist to measure.
"""

from __future__ import annotations

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_INDEX_CACHE",
    os.path.join(_REPO, ".localdata", "index_cache"),
)


def _fingerprint(src: str) -> str:
    """Stable digest of a parquet file/dir's identity: path + per-file
    (relpath, size, mtime_ns). Cheap (stat-only) and changes whenever
    the data is regenerated."""
    h = hashlib.sha256(os.path.realpath(src).encode())
    if os.path.isdir(src):
        for dp, _dirs, fns in sorted(os.walk(src)):
            for fn in sorted(fns):
                p = os.path.join(dp, fn)
                st = os.stat(p)
                h.update(
                    f"{os.path.relpath(p, src)}:{st.st_size}:{st.st_mtime_ns}".encode()
                )
    else:
        st = os.stat(src)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def artifact_path(
    name: str, sf_dir: str, source_table: str, params: dict | None = None
) -> str:
    """Cache location for artifact ``name`` derived from
    ``<sf_dir>/<source_table>.parquet``. Existence of the returned path
    means the artifact is current: the key embeds the source
    fingerprint AND the build ``params`` (round-9 review finding — a
    changed ``n_buckets``/``nlist`` must yield a NEW path, never
    silently serve the old-parameter index). A changed source or param
    set leaves stale siblings behind as dead cache — .localdata is
    scratch space."""
    src = os.path.join(sf_dir, f"{source_table}.parquet")
    h = hashlib.sha256(_fingerprint(src).encode())
    if params:
        h.update(repr(sorted(params.items())).encode())
    key = h.hexdigest()[:16]
    os.makedirs(CACHE_ROOT, exist_ok=True)
    return os.path.join(CACHE_ROOT, f"{name}_{key}")
