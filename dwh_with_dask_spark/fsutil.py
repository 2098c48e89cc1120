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
    is replaced by renaming it ASIDE first, renaming the new build into
    place, then deleting the retired copy — an artifact exists at
    ``path`` at every instant except the gap between the two renames,
    and a crash in that gap leaves the old artifact recoverable at
    ``<path>.old`` rather than lost; ADVICE r9)."""
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(
            f"artifact already exists at {path} (overwrite=False)"
        )
    staging = path + ".inprogress"
    shutil.rmtree(staging, ignore_errors=True)
    build(staging)
    retired = path + ".old"
    shutil.rmtree(retired, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, retired)
    os.rename(staging, path)
    shutil.rmtree(retired, ignore_errors=True)
    return path
