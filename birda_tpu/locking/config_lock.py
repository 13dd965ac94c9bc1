"""Exclusive lock serialising config read-modify-write.

Port of reference ``src/locking/config_lock.rs`` (closes the reference's
issue #313 pattern): each atomic save alone is not enough — two concurrent
writers both load the old file and the later save discards the earlier
edit, so the whole load-mutate-save is wrapped in a sibling
``config.toml.birda.lock`` held for the duration, acquired with retries
(50 ms interval, 5 s timeout).
"""

from __future__ import annotations

import os
import time
from pathlib import Path

from ..constants import config_lock as cl
from ..errors import ConfigLocked


class ConfigLock:
    def __init__(self, config_path: Path | str):
        self.lock_path = Path(str(config_path) + cl.LOCK_SUFFIX)
        self._held = False

    def acquire(self,
                timeout: float = cl.ACQUIRE_TIMEOUT_SECS,
                retry_interval: float = cl.RETRY_INTERVAL_SECS) -> "ConfigLock":
        deadline = time.monotonic() + timeout
        self.lock_path.parent.mkdir(parents=True, exist_ok=True)
        while True:
            try:
                fd = os.open(
                    self.lock_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644
                )
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                self._held = True
                return self
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise ConfigLocked(timeout) from None
                time.sleep(retry_interval)

    def release(self) -> None:
        if not self._held:
            return
        self._held = False
        try:
            self.lock_path.unlink()
        except OSError:
            pass

    def __enter__(self):
        return self.acquire()

    def __exit__(self, *exc):
        self.release()
