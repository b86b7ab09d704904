"""Tests for the stall watchdog (train/watchdog.py).

SURVEY §5.3: the reference has no failure detection; here a wedged
remote-device dispatch turns into exit EXIT_STALLED + checkpoint resume.
"""

import subprocess
import sys
import time

import pytest

from pointnet2_tpu.train.watchdog import EXIT_STALLED, Watchdog


def test_watchdog_fires_on_stall():
    fired = []
    logs = []
    wd = Watchdog(timeout_s=1.0, log_fn=logs.append, label="t",
                  _exit_fn=fired.append)
    try:
        time.sleep(2.5)
        assert fired == [EXIT_STALLED]
        assert any("WATCHDOG" in m for m in logs)
    finally:
        wd.close()


def test_watchdog_quiet_while_beating():
    fired = []
    wd = Watchdog(timeout_s=1.5, log_fn=lambda m: None, _exit_fn=fired.append)
    try:
        for _ in range(6):
            time.sleep(0.5)
            wd.beat()
        assert fired == []
    finally:
        wd.close()


def test_watchdog_hard_exits_wedged_process():
    """The real exit path: a main thread stuck in a native-style infinite
    wait cannot be interrupted — os._exit from the watchdog thread must
    still terminate the process with EXIT_STALLED."""
    code = (
        "import threading, time\n"
        "from pointnet2_tpu.train.watchdog import Watchdog\n"
        "wd = Watchdog(timeout_s=1.0, log_fn=lambda m: None)\n"
        "threading.Event().wait(60)\n"  # simulated wedged dispatch
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], timeout=30)
    assert proc.returncode == EXIT_STALLED
    assert time.time() - t0 < 25


def test_trainer_wires_watchdog(tmp_path):
    from pointnet2_tpu.data import SyntheticClassification
    from pointnet2_tpu.train import TrainConfig, Trainer

    ds = SyntheticClassification(num_classes=2, samples_per_class=4,
                                 npoints=32, batch_size=8)
    cfg = TrainConfig(model="pointnet_cls_basic", batch_size=8,
                      max_epoch=1, log_dir=str(tmp_path), augment="none",
                      watchdog_secs=120.0)
    tr = Trainer(cfg)
    tr.fit(ds, eval_dataset=ds)
    # watchdog was created during fit and closed after
    assert tr._watchdog is None


def test_supervise_restarts_on_stall_only(tmp_path):
    """Exit 75 retries with backoff; other codes propagate immediately."""
    from pointnet2_tpu.train.watchdog import EXIT_STALLED
    from pointnet2_tpu.cli.supervise import supervise

    counter = tmp_path / "n"
    counter.write_text("0")
    # stalls twice, then succeeds
    script = (
        "import sys, pathlib\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()); p.write_text(str(n + 1))\n"
        f"sys.exit({EXIT_STALLED} if n < 2 else 0)\n"
    )
    logs = []
    rc = supervise([sys.executable, "-c", script], max_restarts=5,
                   backoff_secs=0.0, log_fn=logs.append, _sleep=lambda s: None)
    assert rc == 0
    assert counter.read_text() == "3"
    assert sum("restarting" in m for m in logs) == 2

    # non-stall failure: no retry
    counter.write_text("0")
    script_fail = (
        "import sys, pathlib\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()); p.write_text(str(n + 1))\n"
        "sys.exit(3)\n"
    )
    rc = supervise([sys.executable, "-c", script_fail], max_restarts=5,
                   backoff_secs=0.0, log_fn=logs.append, _sleep=lambda s: None)
    assert rc == 3
    assert counter.read_text() == "1"


def test_supervise_gives_up_after_max_restarts():
    from pointnet2_tpu.train.watchdog import EXIT_STALLED
    from pointnet2_tpu.cli.supervise import supervise

    rc = supervise([sys.executable, "-c",
                    f"import sys; sys.exit({EXIT_STALLED})"],
                   max_restarts=2, backoff_secs=0.0,
                   log_fn=lambda m: None, _sleep=lambda s: None)
    assert rc == EXIT_STALLED


def test_trainer_closes_watchdog_on_exception(tmp_path):
    """fit() must not leave an armed watchdog behind when it raises —
    a caller that catches the error would be os._exit'd later."""
    from pointnet2_tpu.data import SyntheticClassification
    from pointnet2_tpu.train import TrainConfig, Trainer

    ds = SyntheticClassification(num_classes=2, samples_per_class=4,
                                 npoints=32, batch_size=8)
    cfg = TrainConfig(model="pointnet_cls_basic", batch_size=8,
                      max_epoch=1, log_dir=str(tmp_path), augment="none",
                      watchdog_secs=120.0)
    tr = Trainer(cfg)

    def boom(trainer, state, epoch):
        raise RuntimeError("protocol eval failed")

    with pytest.raises(RuntimeError):
        tr.fit(ds, eval_dataset=ds, eval_protocol=boom)
    assert tr._watchdog is None
