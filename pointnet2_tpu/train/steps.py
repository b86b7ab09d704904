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
- make_train_multi_step scans K host-prefetched batches per dispatch so the
  chip never idles on host round trips (the reference pays one sess.run
  feed_dict round trip per step, train.py:210-211).
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet2_tpu.data import augment_jax
from pointnet2_tpu.parallel.mesh import DATA_AXIS
from pointnet2_tpu.train.state import TrainState
from pointnet2_tpu.train.steps_body import (  # noqa: F401 (re-exported)
    _accuracy,
    _loss_args,
    _model_inputs,
    run_one_step,
)

AUGMENTATIONS: dict[str, Callable] = {
    "none": None,
    "cls": augment_jax.augment_cls,
    "cls_normals": augment_jax.augment_cls_normals,
    "scannet": augment_jax.augment_scannet,
}


def _finalize(local_fn, mesh: Mesh | None, batch_spec):
    """jit (and shard_map, with a mesh) a local step function with the
    standard replicated-state / data-sharded-batch layout."""
    if mesh is None:
        return jax.jit(local_fn, donate_argnums=0)
    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, batch_spec)
    return jax.jit(
        sharded, donate_argnums=0,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )


def make_train_step(model, loss_fn, tx, bn_momentum_fn, task: str = "cls",
                    mesh: Mesh | None = None, augment: str = "none",
                    remat: str = "none"):
    """Build the jitted data-parallel train step.

    Returns step(state, batch, rng) -> (state, metrics). With a mesh, the
    batch is consumed sharded over DATA_AXIS and the state stays replicated;
    without one, the same math runs single-device. `remat` selects a
    backward-pass rematerialization policy (steps_body.REMAT_POLICIES).
    """
    augment_fn = AUGMENTATIONS[augment]

    def local_step(state: TrainState, batch: dict, rng: jax.Array):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        return run_one_step(model, loss_fn, tx, bn_momentum_fn, task,
                            augment_fn, mesh is not None, state, batch, rng,
                            remat=remat)

    return _finalize(local_step, mesh, P(DATA_AXIS))


def make_train_multi_step(model, loss_fn, tx, bn_momentum_fn,
                          task: str = "cls", mesh: Mesh | None = None,
                          augment: str = "none", remat: str = "none",
                          unroll: int = 1):
    """Build a jitted K-steps-per-dispatch train step (lax.scan inside one
    executable).

    Returns step(state, batches, rng) -> (state, metrics) where every array
    in `batches` is stacked along a leading axis K and each metric comes
    back with that leading K axis. Per-step semantics are identical to
    :func:`make_train_step` (per-step augmentation/dropout RNG, BN momentum
    from the live step counter, grads pmean'd over the mesh); K is read
    from the batch stack, so one compiled executable per distinct K.
    `unroll` is forwarded to lax.scan; on the headline step it measured
    slightly SLOWER (9.79/9.96/10.09 ms/step at unroll 1/5/25) with 3-10x
    the compile time (benchmarks/probe_scan_unroll.py) — keep the default.
    """
    augment_fn = AUGMENTATIONS[augment]

    def local_multi(state: TrainState, batches: dict, rng: jax.Array):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        nsteps = jax.tree_util.tree_leaves(batches)[0].shape[0]

        def body(state, xs):
            i, batch = xs
            return run_one_step(model, loss_fn, tx, bn_momentum_fn, task,
                                augment_fn, mesh is not None, state, batch,
                                jax.random.fold_in(rng, i), remat=remat)

        steps = jnp.arange(nsteps, dtype=jnp.int32)
        return jax.lax.scan(body, state, (steps, batches), unroll=unroll)

    return _finalize(local_multi, mesh, P(None, DATA_AXIS))


def make_eval_count_step(model, task: str = "cls", mesh: Mesh | None = None):
    """Build a jitted eval step returning REPLICATED counts:
    (correct, total, per_class_correct, per_class_total) — the per-class
    vectors feed avg-class accuracy (reference train.py:262-275).

    Unlike :func:`make_eval_step` (which returns data-sharded logits — not
    fully addressable under multi-process JAX, so a host-side np.asarray
    would throw), the counts are psum'd over the mesh inside shard_map and
    come back replicated: every host can read them locally. `batch["mask"]`
    is a per-example {0,1} validity row (padding rows of the final partial
    batch carry 0, reproducing the nvalid-slicing semantics on device).
    """

    def local_count(state: TrainState, batch: dict):
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *_model_inputs(batch, task), train=False)
        pred = jnp.argmax(logits, -1)
        mask = batch["mask"].astype(jnp.float32)
        C = logits.shape[-1]
        if task == "cls":
            label = batch["label"]
            hit = (pred == label).astype(jnp.float32) * mask
            onehot = jax.nn.one_hot(label, C, dtype=jnp.float32) * mask[:, None]
            correct = jnp.sum(hit)
            total = jnp.sum(mask)
            # per-class counts for avg-class accuracy (train.py:262-275)
            cls_correct = hit @ onehot  # (B,) @ (B, C)
            cls_total = jnp.sum(onehot, 0)
        else:
            label = batch["seg"]
            hit = (pred == label).astype(jnp.float32) * mask[:, None]
            onehot = (jax.nn.one_hot(label, C, dtype=jnp.float32)
                      * mask[:, None, None])
            correct = jnp.sum(hit)
            total = jnp.sum(mask) * logits.shape[1]
            cls_correct = jnp.einsum("bn,bnc->c", hit, onehot)
            cls_total = jnp.sum(onehot, (0, 1))
        if mesh is not None:
            correct = jax.lax.psum(correct, DATA_AXIS)
            total = jax.lax.psum(total, DATA_AXIS)
            cls_correct = jax.lax.psum(cls_correct, DATA_AXIS)
            cls_total = jax.lax.psum(cls_total, DATA_AXIS)
        return correct, total, cls_correct, cls_total

    if mesh is None:
        return jax.jit(local_count)

    sharded = jax.shard_map(
        local_count, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(sharded, in_shardings=(repl, data),
                   out_shardings=(repl, repl, repl, repl))


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
