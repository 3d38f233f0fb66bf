"""Process mutex + status protocol for cron-driven runs.

≙ the lock/status blocks of `run_kafka_to_hive.py:31-72` and
`run_compact_tables.py:60-92`, with the reference's two defects fixed:

- the check-then-create race (`run_kafka_to_hive.py:41-43`) becomes an
  atomic ``os.open(..., O_CREAT | O_EXCL)``;
- the bare ``except`` that swallowed every error (`:60-66`) narrows to
  reporting the failure in the status file (0 ok / 1 failed, same
  protocol) and re-raising.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


class AlreadyRunning(RuntimeError):
    pass


@contextmanager
def run_lock(lock_path: str, status_path: str | None = None):
    """Atomic lock-file mutex; writes 0/1 to status_path on exit."""
    try:
        fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise AlreadyRunning(f"lock file exists: {lock_path}")
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
