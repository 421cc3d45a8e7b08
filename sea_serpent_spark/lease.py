"""Single-writer lease for the store and artifact commit paths.

The mutation store (``mutation/store.py``) and the artifact manifests
(``operators/artifact.py``) are documented single-writer: their commit
protocols (append to ``_log.jsonl``; rename ``_versions.json``) are
atomic against READERS, but a second concurrent WRITER would silently
interleave versions/generations (r10 verdict "what's wrong" item 3).
This module converts that silent corruption into an error: writers hold
a kernel ``flock`` on a per-directory ``_writer.lock`` file for the
duration of a commit, and a second writer raises
:class:`LeaseHeldError` instead of proceeding.

Why ``flock`` and not a create-exclusively lease file: the lease-file
protocol needs a *stale-break* heuristic (dead pid / TTL), and breaking
is inherently racy — the round-11 multi-process race test caught BOTH
failure modes in the initial implementation: (a) a reader hitting the
just-created-but-not-yet-written lease judged it corrupt-stale and
broke a LIVE lease (fixed by link-based content-complete creation),
and then (b) two breakers racing — one unlinking the other's FRESH
re-acquired lease because its staleness judgment predated the break
(not fixable without an atomic compare-and-unlink, which POSIX does
not offer). ``flock`` has neither problem on the documented single-
host scope: the kernel releases the lock when the holder exits or
crashes (no staleness heuristic at all), acquisition is atomic, and
the lock file itself is NEVER unlinked (unlinking a flock'd file is
the classic two-holders-on-two-inodes pitfall).

Scope, deliberately modest (the Delta/Iceberg analogue at cluster
scale is the transactional catalog commit, which replaces this module
wholesale):

- **Same host**: full mutual exclusion + automatic crash recovery.
- **Cross-host / NFS**: advisory at best (flock propagation is mount-
  dependent) — same documented single-host scope the store has always
  had; the lease only adds protection, never correctness risk.
- **Re-entrant within a process**: a lease this process already holds
  is a no-op on re-acquire — builder flows hold one lease across
  stage + publish while ``publish_generation`` takes its own. Two
  concurrent writer THREADS in one process are not mutually excluded
  (the guard is per-process, matching the crash-recovery model).
- The lock file persists empty-of-meaning between holds; its JSON
  payload (pid/host/owner/ts) is diagnostics for the error message,
  not protocol state.
"""

from __future__ import annotations

import fcntl
import json
import os
import socket
import time
from contextlib import contextmanager

#: leases held by THIS process — re-entrancy (see module docstring).
_HELD: set[str] = set()

LEASE_NAME = "_writer.lock"


class LeaseHeldError(RuntimeError):
    """Another live writer holds the lease."""


def _read_payload(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return {}


@contextmanager
def writer_lease(
    root: str, name: str = LEASE_NAME, ttl: float = 3600.0,
    owner: str = "",
):
    """Hold the single-writer lease for ``root`` during the block.

    Raises :class:`LeaseHeldError` if another process holds it. A
    holder that exits or crashes releases the lock automatically (the
    kernel owns it — no TTL/stale-file heuristics; ``ttl`` is retained
    in the signature for API stability but unused)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name)
    key = os.path.abspath(path)
    if key in _HELD:  # re-entrant no-op
        yield
        return
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except (BlockingIOError, PermissionError, OSError):
        info = _read_payload(path)
        os.close(fd)
        raise LeaseHeldError(
            f"writer lease {path} is held by "
            f"pid={info.get('pid')} host={info.get('host')} "
            f"owner={info.get('owner') or '?'} — a second concurrent "
            "writer is not allowed. The lock releases automatically "
            "when the holder exits."
        ) from None
    # we hold the lock — record diagnostics for competitors' errors
    try:
        payload = json.dumps(
            {
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "ts": time.time(),
                "owner": owner,
            }
        ).encode()
        os.ftruncate(fd, 0)
        os.pwrite(fd, payload, 0)
    except OSError:
        pass  # diagnostics only
    _HELD.add(key)
    try:
        yield
    finally:
        _HELD.discard(key)
        try:
            os.ftruncate(fd, 0)  # stale diagnostics shouldn't linger
            fcntl.flock(fd, fcntl.LOCK_UN)
        except OSError:
            pass
        os.close(fd)
