"""Cross-process TPU lease lock.

The remote TPU lease is exclusive: two processes touching the chip at
once either poison each other's timings or fail with
FAILED_PRECONDITION ("Backend 'axon' is not in the list of known
backends").  Round 4's verdict observed the driver's ``bench.py`` and
the measurement queue running concurrently — every number from such a
window is suspect.  This module is the fix: ONE advisory ``flock(2)``
lock, honored by every TPU-measurement producer in the repo
(``bench.py``, ``examples/measure_*.py``, ``examples/trace_step.py``,
and the shell queue via ``flock -w <s> /tmp/tpu.lock cmd``).

Shell and Python interoperate because both use ``flock(2)`` on the
same file (``util-linux`` ``flock(1)`` wraps the same syscall).

Semantics: block up to ``timeout_s`` waiting for the lock; on timeout,
WARN on stderr and proceed anyway.  Proceeding (rather than failing)
keeps the driver's end-of-round ``bench.py`` from deadlocking behind a
wedged measurement process — the warning makes the contamination loud
instead of silent, which is the actual requirement.
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import sys
import time
from typing import Iterator

LOCK_PATH = os.environ.get("TPU_LOCK_FILE", "/tmp/tpu.lock")


@contextlib.contextmanager
def tpu_lock(timeout_s: float = 1800.0, poll_s: float = 5.0,
             path: str | None = None) -> Iterator[bool]:
    """Hold the exclusive TPU lock for the duration of the block.

    Yields True if the lock was acquired, False if the wait timed out
    (the block still runs — with a loud stderr warning — so a wedged
    peer cannot deadlock the driver's bench run).  Set
    ``TPU_LOCK_FILE=""`` to disable entirely (e.g. CPU-only tests).
    """
    path = LOCK_PATH if path is None else path
    if not path or os.environ.get("TPU_LOCK_HELD") == "1":
        # TPU_LOCK_HELD=1: an ancestor already holds the flock (e.g. a
        # queue runner wrapping legs in `flock /tmp/tpu.lock env
        # TPU_LOCK_HELD=1 ...`) — a second open() would create a new
        # file description and deadlock-wait against our own parent.
        yield True
        return
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
    acquired = False
    deadline = time.monotonic() + timeout_s
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                acquired = True
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    raise
            if time.monotonic() >= deadline:
                print(f"WARNING: tpu_lock: {path} still held after "
                      f"{timeout_s:.0f}s — proceeding UNLOCKED; timings "
                      f"in this window may be contaminated",
                      file=sys.stderr, flush=True)
                break
            time.sleep(poll_s)
        yield acquired
    finally:
        if acquired:
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
