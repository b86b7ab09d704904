"""Real multi-process distributed training test.

The suite's 8-virtual-device mesh runs in ONE process; this test launches
TWO OS processes (4 virtual CPU devices each) joined through
jax.distributed into one 8-device data mesh, runs one deterministic train
step with host-sharded input (parallel/multihost.py + mesh.shard_batch's
make_array_from_process_local_data path), and checks both processes report
the same loss as the single-process 8-device run — end-to-end validation
of the multi-host code path the reference never had.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    # same computation on one process with 8 virtual devices
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    code = (
        "import sys; sys.argv = ['w', '0', '1', '0'];"
        "import tests._multiprocess_worker as w;"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "w.main()")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600, cwd=os.path.dirname(os.path.dirname(_WORKER)))
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"MULTIPROC_RESULT pid=0 loss=([0-9.]+)", out.stdout)
    assert m, out.stdout
    return float(m.group(1))


@pytest.mark.slow
def test_two_process_full_fit_eval_ckpt_resume(tmp_path):
    """The whole training loop — train epochs over UNEVEN host shards, eval,
    best/periodic checkpointing, and resume — survives two real processes.
    Replaces the reference's train_multi_gpu.py end-to-end, not per-step
    (multi-GPU there was validated only by running it)."""
    port = _free_port()
    log_dir = str(tmp_path / "fitlog")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port), log_dir, "fit"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(_WORKER))) for pid in range(2)]
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-3000:]
        m = re.search(r"FIT_RESULT pid=\d acc=([0-9.]+) acc2=([0-9.]+) "
                      r"step=(\d+) epoch=(\d+)", stdout)
        assert m, stdout + stderr[-1000:]
        v = re.search(r"VOTE_RESULT pid=\d acc=([0-9.]+) seen=(\d+)",
                      stdout)
        assert v, stdout + stderr[-1000:]
        # voting counters are allreduced: every host reports the GLOBAL
        # 25 shapes despite holding only 12 or 13 locally
        assert int(v.group(2)) == 25, stdout
        results.append(tuple(float(g) for g in m.groups())
                       + (float(v.group(1)),))

    # both processes report identical replicated metrics and bookkeeping
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    acc, acc2, step, epoch, _vote_acc = results[0]
    # 25 items over 2 hosts -> min 3 lockstep batches/epoch, 3 total epochs
    # (2 in the first fit + 1 after resume); meta records completed epochs
    assert step == 9 and epoch == 3
    # exactly one process wrote the checkpoint + sidecar meta + provenance
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))
    assert os.path.isdir(os.path.join(log_dir, "best"))
    assert os.path.isfile(os.path.join(log_dir, "ckpt.meta.json"))
    assert os.path.isfile(os.path.join(log_dir, "config.json"))


@pytest.mark.slow
def test_two_process_distributed_step_matches_single_process():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=os.path.dirname(os.path.dirname(_WORKER))))
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-2000:]
        m = re.search(r"MULTIPROC_RESULT pid=\d loss=([0-9.]+)", stdout)
        assert m, stdout
        outs.append(float(m.group(1)))

    assert len(outs) == 2
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    ref = _single_process_loss()
    # the sharded step is device-count invariant; process layout must not
    # change the numbers either
    np.testing.assert_allclose(outs[0], ref, rtol=1e-5)


@pytest.mark.slow
def test_four_process_fit_uneven_shards(tmp_path):
    """The lockstep machinery at n=4 processes (2 virtual devices each):
    25 items shard 7/6/6/6, so train epochs sync to the min batch count
    (3), protocol eval pads the three short hosts with a zero batch to the
    max (4), and the voting counters still allreduce to all 25 shapes.
    n=2 (above) cannot catch deadlocks where several hosts wait on one
    remainder host — this layout has three."""
    port = _free_port()
    log_dir = str(tmp_path / "fitlog4")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "4", str(port), log_dir, "fit"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(_WORKER))) for pid in range(4)]
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-3000:]
        m = re.search(r"FIT_RESULT pid=\d acc=([0-9.]+) acc2=([0-9.]+) "
                      r"step=(\d+) epoch=(\d+)", stdout)
        assert m, stdout + stderr[-1000:]
        v = re.search(r"VOTE_RESULT pid=\d acc=([0-9.]+) seen=(\d+)", stdout)
        assert v, stdout + stderr[-1000:]
        assert int(v.group(2)) == 25, stdout
        # EMPTY-SHARD lockstep (3 eval items over 4 hosts -> 0/0/0/3):
        # ranks with zero local batches feed metadata-built zero batches;
        # eval + voting complete and the counters see all 3 items
        t = re.search(r"TINY_RESULT pid=\d acc=([0-9.]+|nan) seen=(\d+)",
                      stdout)
        assert t, stdout + stderr[-1000:]
        assert int(t.group(2)) == 3, stdout
        results.append(tuple(float(g) for g in m.groups())
                       + (float(v.group(1)), float(t.group(1))))

    for r in results[1:]:
        np.testing.assert_allclose(results[0], r, rtol=1e-6)
    acc, acc2, step, epoch, _vote_acc, _tiny_acc = results[0]
    # 25 items over 4 hosts -> 7/6/6/6 items -> 4/3/3/3 local batches ->
    # min 3 lockstep steps/epoch, 3 total epochs (2 + 1 after resume)
    assert step == 9 and epoch == 3
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))
    assert os.path.isfile(os.path.join(log_dir, "ckpt.meta.json"))
