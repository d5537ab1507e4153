"""Shared flock primitive for every on-disk mutual-exclusion need
(sink writer leases, watermark store mutations).

One implementation on purpose: the subtleties — open a sidecar with
O_CREAT, LOCK_EX blocks, closing the fd releases the lock even when
the holder crashes (the kernel owns it), per-open-file-description
semantics make two THREADS of one process contend correctly — are
easy to half-copy and hard to debug. POSIX scope (local FS /
NFS-with-flock); object stores need conditional-PUT instead.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator


@contextmanager
def exclusive_flock(lock_path: str) -> Iterator[int]:
    """Hold an exclusive flock on ``lock_path`` (created if missing);
    yields the open fd so callers can keep small state (e.g. a fencing
    token) IN the lock file, mutated only under the lock."""
    import fcntl

    parent = os.path.dirname(lock_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    fd = os.open(lock_path, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield fd
    finally:
        os.close(fd)  # kernel drops the flock, crash included
