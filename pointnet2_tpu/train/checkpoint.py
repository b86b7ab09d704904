"""Orbax checkpointing with full resume, coordinated across hosts.

Improves on the reference's tf.train.Saver usage (train.py:144,181-183),
which never restores the epoch/step counters — training always restarted
from epoch 0. Here (params, batch_stats, opt_state, step) round-trip and a
sidecar meta record stores the epoch explicitly, so resume is exact even
if the batch size or dataset size changed between runs.

Multi-host: the train state is fully replicated, so process 0 alone writes
the checkpoint (every process holds the whole state locally); a barrier
keeps other processes from racing ahead and restoring a half-written file.
All processes restore independently from the shared path.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp

from pointnet2_tpu.parallel import multihost
from pointnet2_tpu.train.state import TrainState


def _meta_path(directory: str, name: str) -> str:
    return os.path.join(os.path.abspath(directory), f"{name}.meta.json")


def save_checkpoint(directory: str, state: TrainState, name: str = "ckpt",
                    epoch: int | None = None,
                    score: float | None = None) -> str:
    """Write the checkpoint (process 0 only) and barrier all hosts.

    `epoch` is the number of COMPLETED epochs at save time; it round-trips
    through the sidecar meta file so resume does not have to derive it
    from step // num_batches (which silently mis-resumes if the batch size
    changed). `score` (best-checkpoint selection metric) rides along so a
    resumed run never lets its first eval overwrite a better best-ckpt
    from before the interruption.
    """
    path = os.path.join(os.path.abspath(directory), name)
    new, old = path + ".new", path + ".old"
    # Crash-safe overwrite: orbax's save(force=True) rmtree's the target
    # BEFORE writing its replacement, so a kill mid-save (watchdog
    # os._exit, platform kill — the failure modes this module exists to
    # survive) would destroy the only resume point. Instead: save to a
    # fresh side directory (orbax commits a fresh path atomically via
    # tmp+rename), then swap with two renames; load_meta/restore recover
    # from a crash between the renames via the `.old` generation.
    if multihost.is_primary():
        import shutil

        # If a previous process died between the two renames (path missing,
        # only `.old` alive), promote the survivor back BEFORE treating
        # `.old` as stale — otherwise the rmtree below would delete the sole
        # resume point before its replacement exists. Trainer always calls
        # load_meta first (which also recovers), but direct API users may
        # save without restoring.
        _recover_interrupted_swap(path)
        for stale in (new, old):  # leftovers from an earlier crash
            shutil.rmtree(stale, ignore_errors=True)
    multihost.barrier(f"ckpt_prep:{name}")
    # Every process participates: orbax's save is itself multihost-
    # coordinated (internal sync_global_devices + primary-host writes for
    # replicated/numpy values), so gating it on one process would deadlock.
    # state is replicated, so device_get is fully local on every host.
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(new, jax.device_get(state))
    if multihost.is_primary():
        import shutil

        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(new, path)  # <- the only window; .old recovers it
        shutil.rmtree(old, ignore_errors=True)
        meta = {"step": int(state.step), "epoch": epoch}
        if score is not None:
            meta["score"] = float(score)
        tmp = _meta_path(directory, name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, _meta_path(directory, name))
    # keep non-primary processes from restoring before the meta lands
    multihost.barrier(f"ckpt_save:{name}")
    return path


def _recover_interrupted_swap(path: str) -> None:
    """A crash between save_checkpoint's two renames leaves `<name>.old`
    but no `<name>`: promote the previous generation back."""
    old = path + ".old"
    if not os.path.isdir(path) and os.path.isdir(old):
        try:
            os.rename(old, path)
        except OSError:  # another process won the recovery race
            pass


def restore_checkpoint(directory: str, template: TrainState,
                       name: str = "ckpt") -> TrainState:
    path = os.path.join(os.path.abspath(directory), name)
    _recover_interrupted_swap(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          jax.device_get(template))
        return ckptr.restore(path, abstract)


def load_meta(directory: str, name: str = "ckpt") -> dict | None:
    """Sidecar meta ({"step", "epoch"}) if a checkpoint exists, else None.
    Checkpoints written before meta existed report step/epoch as None."""
    path = os.path.join(os.path.abspath(directory), name)
    _recover_interrupted_swap(path)
    if not os.path.isdir(path):
        return None
    try:
        with open(_meta_path(directory, name)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"step": None, "epoch": None}


def latest_step(directory: str, name: str = "ckpt") -> int | None:
    meta = load_meta(directory, name)
    if meta is None:
        return None
    return meta.get("step") or 0
