"""Supervised training: restart-on-stall around the training CLI.

Pairs with the stall watchdog (train/watchdog.py): the trainer exits
EXIT_STALLED (75) when the remote-device session wedges; this supervisor
restarts the SAME command after a backoff, and the trainer resumes
exactly from its periodic checkpoint (epoch stored in checkpoint meta).
Together they close the failure-detection/recovery loop the reference
lacks entirely (SURVEY §5.3: crash = manual restart from the last
epoch-10 checkpoint, train.py:181-183).

Only stall exits are retried — a real error (traceback, bad flag, OOM)
propagates immediately with its own exit code.

Usage (everything after the supervisor's own flags goes to cli.train;
a watchdog is enabled by default so stalls actually convert to exits):

  python -m pointnet2_tpu.cli.supervise --max_restarts 10 -- \
      --model pointnet2_cls_ssg --data ... --log_dir runs/x
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

from pointnet2_tpu.train.watchdog import DEFAULT_TIMEOUT_S, EXIT_STALLED


def supervise(cmd: list[str], max_restarts: int = 10,
              backoff_secs: float = 60.0, log_fn=print,
              _sleep=time.sleep) -> int:
    """Run cmd, restarting on EXIT_STALLED up to max_restarts times.
    Returns the final exit code (0 on success)."""
    attempt = 0
    while True:
        rc = subprocess.run(cmd).returncode
        if rc != EXIT_STALLED:
            if attempt:
                log_fn(f"supervise: finished with rc={rc} after "
                       f"{attempt} restart(s)")
            return rc
        attempt += 1
        if attempt > max_restarts:
            log_fn(f"supervise: stalled {attempt} times, giving up")
            return rc
        log_fn(f"supervise: stall #{attempt} — restarting in "
               f"{backoff_secs:.0f}s (resumes from checkpoint)")
        _sleep(backoff_secs)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max_restarts", type=int, default=10)
    ap.add_argument("--backoff_secs", type=float, default=60.0)
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="arguments for pointnet2_tpu.cli.train "
                         "(prefix with --)")
    args = ap.parse_args(argv)
    train_args = args.train_args
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    has_watchdog = any(a == "--watchdog_secs"
                       or a.startswith("--watchdog_secs=")
                       for a in train_args)
    if not has_watchdog:
        train_args = [*train_args, "--watchdog_secs",
                      str(DEFAULT_TIMEOUT_S)]
    cmd = [sys.executable, "-m", "pointnet2_tpu.cli.train", *train_args]
    sys.exit(supervise(cmd, args.max_restarts, args.backoff_secs))


if __name__ == "__main__":
    main()
