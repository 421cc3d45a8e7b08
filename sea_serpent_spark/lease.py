"""Single-writer lease files for the store and artifact commit paths.

The mutation store (``mutation/store.py``) and the artifact manifests
(``operators/artifact.py``) are documented single-writer: their commit
protocols (append to ``_log.jsonl``; rename ``_versions.json``) are
atomic against READERS, but a second concurrent WRITER would silently
interleave versions/generations (r10 verdict "what's wrong" item 3).
This module converts that silent corruption into an error: writers take
an ``O_CREAT | O_EXCL`` lease file for the duration of a commit, and a
second writer raises :class:`LeaseHeldError` instead of proceeding.

Scope and recovery, deliberately modest (the Delta/Iceberg analogue at
cluster scale is the transactional catalog commit, which replaces this
file wholesale):

- **Crash recovery is automatic on the same host**: the lease records
  ``pid``/``host``/``ts``; a lease whose pid no longer exists locally,
  or whose timestamp is older than ``ttl`` seconds, is stale and is
  broken (unlinked + re-acquired) by the next writer.
- **Cross-host staleness is TTL-only** (a pid cannot be probed
  remotely), so ``ttl`` should exceed the longest plausible commit.
- **Re-entrant within a process**: a lease this process already holds
  is a no-op on re-acquire — builder flows hold one lease across
  stage + publish while ``publish_generation`` takes its own.
- **Manual recovery**: if a writer dies on another host, remove the
  lease file named in the error after confirming the owner is gone.
"""

from __future__ import annotations

import json
import os
import socket
import time
from contextlib import contextmanager

#: leases held by THIS process — re-entrancy (and the documented
#: limitation: two writers in one process are not mutually excluded;
#: the guard is per-process, matching the crash-recovery model).
_HELD: set[str] = set()

LEASE_NAME = "_writer.lock"


class LeaseHeldError(RuntimeError):
    """Another live writer holds the lease."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except (PermissionError, OSError):
        return True  # exists but not ours — alive
    return True


def _read_lease(path: str) -> dict | None:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return None


def _is_stale(info: dict | None, ttl: float) -> bool:
    if info is None:
        return True  # unreadable/torn lease file — treat as breakable
    ts = info.get("ts")
    if isinstance(ts, (int, float)) and time.time() - ts > ttl:
        return True
    pid, host = info.get("pid"), info.get("host")
    if (
        isinstance(pid, int)
        and host == socket.gethostname()
        and not _pid_alive(pid)
    ):
        return True
    return False


def _try_acquire(path: str, owner: str) -> bool:
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as fh:
        json.dump(
            {
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "ts": time.time(),
                "owner": owner,
            },
            fh,
        )
    return True


@contextmanager
def writer_lease(
    root: str, name: str = LEASE_NAME, ttl: float = 3600.0,
    owner: str = "",
):
    """Hold the single-writer lease for ``root`` during the block.

    Raises :class:`LeaseHeldError` if a live writer holds it. A stale
    lease (dead local pid, or older than ``ttl`` seconds) is broken
    once; losing the post-break re-acquire race to another breaker
    raises like a live lease (rare, and safe — exactly one of the
    breakers proceeds)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name)
    key = os.path.abspath(path)
    if key in _HELD:  # re-entrant no-op
        yield
        return
    if not _try_acquire(path, owner):
        if _is_stale(_read_lease(path), ttl):
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
        if not _try_acquire(path, owner):
            info = _read_lease(path) or {}
            raise LeaseHeldError(
                f"writer lease {path} is held by "
                f"pid={info.get('pid')} host={info.get('host')} "
                f"owner={info.get('owner') or '?'} — a second concurrent "
                "writer is not allowed. If that process is dead, remove "
                "the lease file (it also expires after "
                f"ttl={ttl:.0f}s)."
            )
    _HELD.add(key)
    try:
        yield
    finally:
        _HELD.discard(key)
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
