"""Shared staged-publish protocol for locally stored index artifacts.

One implementation of the write-to-staging + single-rename publish that
the stored-index builders (BM25 postings, IVF-PQ codes, the cached
versioned-orders table) all follow: the artifact either exists complete
at ``path`` or not at all — a crash mid-build leaves only a
``.inprogress`` staging directory that the next build clears. Single
writer, like every local-FS publish in this repo (versioned.py's
pointer swap is the multi-version variant of the same idea).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def staged_publish(
    path: str, build: Callable[[str], None], overwrite: bool = False
) -> str:
    """Build into ``<path>.inprogress`` via ``build(staging_dir)``,
    then publish with one ``os.rename``. Raises FileExistsError when
    ``path`` already exists unless ``overwrite`` (the existing artifact
    is then removed AFTER the new one is fully built, keeping the
    no-partial-artifact invariant even on a failed rebuild)."""
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(
            f"artifact already exists at {path} (overwrite=False)"
        )
    staging = path + ".inprogress"
    shutil.rmtree(staging, ignore_errors=True)
    build(staging)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(staging, path)
    return path
