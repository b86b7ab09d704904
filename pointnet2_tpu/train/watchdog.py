"""Stall watchdog: failure detection for remote-device training.

The reference has no failure detection at all (SURVEY §5.3: crash =
restart by hand from the last epoch-10 checkpoint, train.py:181-183).
On a remote TPU transport the practical failure mode is worse than a
crash: the device session can wedge server-side and the client blocks
FOREVER in a futex inside a dispatch — no exception, no exit, a silently
dead run (observed in this environment; CLAUDE.md gotchas).

:class:`Watchdog` converts that hang into a detectable failure: a daemon
thread checks a heartbeat the train/eval loops beat between dispatches;
if no beat lands within ``timeout_s`` the process logs the stall and
exits with :data:`EXIT_STALLED` (75, EX_TEMPFAIL). Because the trainer
checkpoints every N epochs and resumes exactly (epoch in checkpoint
meta), the supervising shell can simply loop:

    until python -m pointnet2_tpu.cli.train ... --watchdog_secs 600; do
        [ $? -eq 75 ] || break   # 75 = stalled: wait and resume
        sleep 60
    done

``os._exit`` (not ``sys.exit``) is deliberate: the main thread is stuck
in an uninterruptible native call, so raising in the watchdog thread
would be swallowed; only a hard exit reliably frees the process (and
with it, eventually, the server-side session).

The first dispatch of a fresh process includes remote compilation
(20-120 s/kernel here), so ``timeout_s`` must comfortably exceed worst-
case compile; the default is conservative. ``beat()`` costs one
``time.monotonic`` store — call it as often as you like.
"""

from __future__ import annotations

import os
import threading
import time

EXIT_STALLED = 75  # EX_TEMPFAIL: retryable — resume from checkpoint

DEFAULT_TIMEOUT_S = 900.0


class Watchdog:
    def __init__(self, timeout_s: float = DEFAULT_TIMEOUT_S,
                 log_fn=print, label: str = "train",
                 _exit_fn=None):
        self.timeout_s = float(timeout_s)
        self._log = log_fn
        self._label = label
        self._exit = _exit_fn if _exit_fn is not None else os._exit
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name=f"watchdog-{label}", daemon=True)
        self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def close(self) -> None:
        self._stop.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _run(self) -> None:
        poll = max(1.0, min(10.0, self.timeout_s / 10.0))
        while not self._stop.wait(poll):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                try:
                    self._log(
                        f"WATCHDOG: no {self._label} progress for "
                        f"{idle:.0f}s (> {self.timeout_s:.0f}s) — device "
                        f"transport presumed wedged; exiting "
                        f"{EXIT_STALLED} for a checkpoint resume")
                except Exception:
                    pass
                self._exit(EXIT_STALLED)
                return  # test stubs don't exit
