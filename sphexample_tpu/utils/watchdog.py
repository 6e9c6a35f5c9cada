"""Device-call watchdog: turn a silently hung device program into a loud,
recoverable failure.

Motivation (observed on the tunneled TPU, see PERFORMANCE.md): the transport
under a remote device can stall mid-run - the client blocks forever inside a
device fetch with no exception, and a multi-hour simulation dies silently.
The reference runs on a local CPU and cannot hit this class; a TPU-native
production runtime must (failure-detection subsystem, SURVEY.md 5.3).

``DeviceWatchdog`` monitors a heartbeat that the host loop beats after every
device chunk.  If an armed period exceeds ``timeout`` seconds the watchdog
fires: it prints a diagnostic (what was running, for how long, how to resume
from the last checkpoint) and either keeps warning (soft, default) or
terminates the process with exit code 86 (``hard=True``) so a supervising
loop can restart with ``--resume``.  Termination uses ``os._exit``: the
stuck thread is blocked in native code and cannot be interrupted.
"""

from __future__ import annotations

import os
import sys
import threading
import time


EXIT_CODE = 86  # distinct code for "device call hung" - supervisors match it


class DeviceWatchdog:
    """Fires when an armed section exceeds ``timeout`` seconds.

    Usage::

        wd = DeviceWatchdog(timeout=300.0, hard=False, context="interval 12")
        wd.arm("chunk 3")
        ...blocking device call...
        wd.disarm()
        ...
        wd.stop()
    """

    def __init__(self, timeout: float, hard: bool = False,
                 context: str = "device call", poll: float = 1.0):
        self.timeout = float(timeout)
        self.hard = hard
        self.context = context
        self.fired = False
        self._label = ""
        self._armed_at = None
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._poll = poll
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def arm(self, label: str = "") -> None:
        with self._lock:
            self._label = label
            self._armed_at = time.monotonic()

    def disarm(self) -> None:
        with self._lock:
            self._armed_at = None

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)

    def _run(self) -> None:
        warned_at = 0.0
        while not self._stop.wait(self._poll):
            with self._lock:
                armed_at = self._armed_at
                label = self._label
            if armed_at is None:
                warned_at = 0.0
                continue
            elapsed = time.monotonic() - armed_at
            if elapsed < self.timeout:
                continue
            self.fired = True
            if time.monotonic() - warned_at >= self.timeout:
                warned_at = time.monotonic()
                print(
                    f"[sphexample_tpu] WATCHDOG: {self.context} ({label}) has "
                    f"been blocked for {elapsed:.0f} s (> {self.timeout:.0f} s "
                    f"timeout). The device transport has likely stalled. "
                    f"Restart the run and resume from the last checkpoint "
                    f"(--resume).",
                    file=sys.stderr,
                    flush=True,
                )
            if self.hard:
                print(
                    f"[sphexample_tpu] WATCHDOG: terminating (exit "
                    f"{EXIT_CODE}) so a supervisor can restart with --resume.",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(EXIT_CODE)
