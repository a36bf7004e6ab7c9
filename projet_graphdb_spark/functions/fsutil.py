"""Filesystem swap discipline shared by the persisted-index maintenance
ops (LSH band index, IVF cell sink) — single-sourced so a fix to the
swap applies everywhere (review finding: three hand-rolled copies had
three different levels of crash safety).
"""

from __future__ import annotations

import os
import shutil
import uuid


def atomic_swap(path: str, write_fn) -> None:
    """Replace the directory at ``path`` with whatever ``write_fn``
    writes to a staging path, via rename swap.

    Re-entrant: staging/old names carry a unique token, so a crashed or
    concurrent prior run's leftovers never collide (the bare
    ``.staging``/``.old`` suffixes raised ENOTEMPTY forever after one
    crash).  NEAR-atomic: there remains one rename-to-rename window in
    which ``path`` is absent — a crash there leaves the old data intact
    under ``<path>.old-<token>`` for manual recovery, never silently
    lost.  On object stores, swap this helper for a transactional table
    format's DELETE/replace and keep the callers' dataframe logic
    unchanged."""
    token = uuid.uuid4().hex[:8]
    staging = f"{path}.staging-{token}"
    write_fn(staging)
    old = f"{path}.old-{token}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
