"""jit + shard_map data-parallel train/eval steps.

One step program for every task (classification, part seg, sem seg): the
model/loss pair comes from the registry and the batch layout from the task.
This single function replaces the reference's train.py and the whole of
train_multi_gpu.py — towers, tf.slice batch splitting, and CPU gradient
averaging (train_multi_gpu.py:91-203) collapse into a shard_map over a
1-D ``data`` mesh with `lax.pmean` on grads riding ICI/DCN.

Design choices (documented deltas from the reference):
- BN batch statistics are pmean'd across replicas each step, so state stays
  replicated and deterministic. (The reference keeps per-tower stats and
  implicitly ships tower 0's, utils/tf_util.py:512-531.)
- Optional on-device augmentation runs inside the step, keyed by the step
  RNG (replaces the host-side provider.py loops).
- Dropout RNG is folded with the data-axis index so replicas draw
  independent masks.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet2_tpu.data import augment_jax
from pointnet2_tpu.nn.layers import cross_replica_bn
from pointnet2_tpu.parallel.mesh import DATA_AXIS
from pointnet2_tpu.train.state import TrainState

AUGMENTATIONS: dict[str, Callable] = {
    "none": None,
    "cls": augment_jax.augment_cls,
    "cls_normals": augment_jax.augment_cls_normals,
    "scannet": augment_jax.augment_scannet,
}


def _model_inputs(batch: dict, task: str):
    """Positional model inputs for each task family."""
    if task == "part_seg_one_hot":
        return (batch["points"], batch["cls_label"])
    return (batch["points"],)


def _loss_args(batch: dict, task: str):
    if task == "cls":
        return (batch["label"],)
    if task in ("part_seg", "part_seg_one_hot"):
        return (batch["seg"],)
    if task == "sem_seg":
        return (batch["seg"], batch["smpw"])
    raise ValueError(f"unknown task {task!r}")


def _accuracy(logits, batch, task):
    if task == "cls":
        return jnp.mean(jnp.argmax(logits, -1) == batch["label"])
    return jnp.mean(jnp.argmax(logits, -1) == batch["seg"])


def make_train_step(model, loss_fn, tx, bn_momentum_fn, task: str = "cls",
                    mesh: Mesh | None = None, augment: str = "none"):
    """Build the jitted data-parallel train step.

    Returns step(state, batch, rng) -> (state, metrics). With a mesh, the
    batch is consumed sharded over DATA_AXIS and the state stays replicated;
    without one, the same math runs single-device.
    """
    augment_fn = AUGMENTATIONS[augment]

    def local_step(state: TrainState, batch: dict, rng: jax.Array):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        aug_rng, dropout_rng = jax.random.split(rng)
        if augment_fn is not None:
            batch = dict(batch, points=augment_fn(aug_rng, batch["points"]))
        bn_momentum = bn_momentum_fn(state.step)

        bn_axis = DATA_AXIS if mesh is not None else None

        def loss_of(params):
            with cross_replica_bn(bn_axis):
                (logits, _), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    *_model_inputs(batch, task), train=True,
                    bn_momentum=bn_momentum,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            loss = loss_fn(logits, *_loss_args(batch, task))
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        acc = _accuracy(logits, batch, task)
        if mesh is not None:
            # new_stats needs no reduction: BN statistics are already synced
            # cross-replica inside the forward (see cross_replica_bn).
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            acc = jax.lax.pmean(acc, DATA_AXIS)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats,
                               opt_state=new_opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    if mesh is None:
        return jax.jit(local_step, donate_argnums=0)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        sharded, donate_argnums=0,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )


def make_eval_step(model, task: str = "cls", mesh: Mesh | None = None):
    """Build the jitted eval step: (state, batch) -> logits (replicated math,
    batch sharded over the mesh)."""

    def local_eval(state: TrainState, batch: dict):
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *_model_inputs(batch, task), train=False)
        return logits

    if mesh is None:
        return jax.jit(local_eval)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(sharded, in_shardings=(repl, data), out_shardings=data)
