"""Process mutex + status protocol for cron-driven runs.

≙ the lock/status blocks of `run_kafka_to_hive.py:31-72` and
`run_compact_tables.py:60-92`, with the reference's two defects fixed:

- the check-then-create race (`run_kafka_to_hive.py:41-43`) becomes an
  atomic ``os.open(..., O_CREAT | O_EXCL)``;
- the bare ``except`` that swallowed every error (`:60-66`) narrows to
  reporting the failure in the status file (0 ok / 1 failed, same
  protocol) and re-raising.

``timeout_s`` turns the fail-fast mutex into a bounded wait: maintenance
jobs (compaction, merge) racing a live ingest's PER-BATCH lock holds
(seconds each) should queue behind them, not die with AlreadyRunning —
while a lock held past the timeout still fails loudly (a wedged holder
must page an operator, not be silently waited on forever).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


class AlreadyRunning(RuntimeError):
    pass


def acquire_lock(lock_path: str, timeout_s: float = 0, poll_s: float = 0.5) -> None:
    """Atomically create the lock file, waiting up to ``timeout_s`` for a
    concurrent holder to release it (0 = fail fast, the cron default for
    a lock nothing short-lived should be holding)."""
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return
        except FileExistsError:
            if time.monotonic() >= deadline:
                raise AlreadyRunning(
                    f"lock file exists: {lock_path}"
                    + (f" (gave up after {timeout_s}s)" if timeout_s else "")
                )
            time.sleep(poll_s)


@contextmanager
def run_lock(
    lock_path: str,
    status_path: str | None = None,
    timeout_s: float = 0,
    poll_s: float = 0.5,
):
    """Lock-file mutex; writes 0/1 to status_path on exit."""
    acquire_lock(lock_path, timeout_s=timeout_s, poll_s=poll_s)
    ok = True
    try:
        yield
    except BaseException:
        ok = False
        raise
    finally:
        os.unlink(lock_path)
        if status_path:
            with open(status_path, "w") as f:
                f.write("0" if ok else "1")
