"""Filesystem swap discipline shared by the persisted-index maintenance
ops (LSH band index, IVF cell sink) — single-sourced so a fix to the
swap applies everywhere (review finding: three hand-rolled copies had
three different levels of crash safety).
"""

from __future__ import annotations

import os
import shutil
import uuid

# orphaned staging/old dirs younger than this are presumed to belong to a
# live concurrent run and are left alone by the entry sweep
_SWEEP_AGE_S = 3600.0


def _tree_quiet_since(root: str, cutoff: float) -> bool:
    """True iff NOTHING under ``root`` (the dir itself, subdirs, files)
    has an mtime at or past ``cutoff``.  The sweep's liveness test must
    be recursive (review finding): a long Spark staging write only
    touches the TOP-LEVEL mtime at job start — task files land inside
    ``_temporary``/partition subdirs — so a top-level-mtime check would
    rmtree a live concurrent write after _SWEEP_AGE_S.  Early-exits on
    the first fresh entry, so live trees cost one short walk.

    ONLY safe for ``.staging-*`` trees, whose content mtimes track the
    write that created them.  It must never gate a ``.old-*`` tree
    (round-9 advice): rename(2) preserves content mtimes, so a
    ``.old-<token>`` created milliseconds ago by a concurrent swap's
    first rename looks hours-quiet — and sweeping it inside the
    sibling's rename window can destroy the only copy of the data if
    the sibling then crashes before its second rename."""
    try:
        if os.path.getmtime(root) >= cutoff:
            return False
    except OSError:
        return False  # vanished or unreadable: leave it alone
    for dirpath, dirnames, filenames in os.walk(root):
        for name in dirnames + filenames:
            try:
                if os.path.getmtime(os.path.join(dirpath, name)) >= cutoff:
                    return False
            except OSError:
                return False
    return True


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
    unchanged.

    Disk hygiene (round-8 review): a FAILED ``write_fn`` removes its own
    staging dir before the error propagates, and each entry sweeps
    orphaned ``.staging-*`` leftovers from runs that died before their
    cleanup — so repeated failures cannot accumulate unbounded index
    copies.  The sweep only touches dirs older than ``_SWEEP_AGE_S``
    (a CONCURRENT run's live staging dir must survive).  ``.old-*`` is
    NEVER swept (round-9 advice): rename preserves content mtimes, so a
    concurrent swap's just-created ``.old`` is indistinguishable from a
    stale one by mtime, and sweeping it inside the sibling's rename
    window can destroy the only copy of the data.  A ``.old-*`` orphan
    only exists after a crash inside the rename window — recovery
    material by definition, and bounded (one dir per such crash), so
    leaving it to the operator is the safe trade."""
    import time

    base_dir = os.path.dirname(os.path.abspath(path)) or "."
    base_name = os.path.basename(os.path.abspath(path))
    if os.path.isdir(base_dir):
        cutoff = time.time() - _SWEEP_AGE_S
        for entry in os.listdir(base_dir):
            stale = os.path.join(base_dir, entry)
            if not entry.startswith(f"{base_name}.staging-"):
                continue
            try:
                if os.path.isdir(stale) and _tree_quiet_since(stale, cutoff):
                    shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                pass
    token = uuid.uuid4().hex[:8]
    staging = f"{path}.staging-{token}"
    try:
        write_fn(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    old = f"{path}.old-{token}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
