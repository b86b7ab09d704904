"""Shared single-optimizer-step body used by both step factories.

Kept in its own module so make_train_step (one dispatch per step) and
make_train_multi_step (K steps scanned per dispatch) stay thin wrappers
around identical math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from pointnet2_tpu.nn.layers import cross_replica_bn
from pointnet2_tpu.parallel.mesh import DATA_AXIS
from pointnet2_tpu.train.state import TrainState


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


def _accuracy(logits, batch, task, pmean_axis=None):
    target = batch["label"] if task == "cls" else batch["seg"]
    hit = (jnp.argmax(logits, -1) == target).astype(jnp.float32)
    mask = batch.get("mask")
    if mask is None:
        return jnp.mean(hit)
    while mask.ndim < hit.ndim:
        mask = mask[..., None]
    num = jnp.sum(hit * mask)
    den = jnp.sum(jnp.broadcast_to(mask, hit.shape))
    if pmean_axis is not None:
        # normalize by the MEAN per-replica valid count so the caller's
        # pmean over replicas yields the global masked mean (a replica
        # holding only padding must dilute nothing)
        den = jax.lax.pmean(den, pmean_axis)
    # epsilon, not 1.0: the mean per-replica count is legitimately < 1
    # when valid rows are rarer than replicas; num is 0 whenever den is
    return num / jnp.maximum(den, 1e-8)


# Rematerialization policies for the backward pass. The train step is
# HBM-bandwidth bound (docs/PERF.md) and its residuals are dominated by the
# wide grouped (B, npoint, nsample, C) activations, so recomputing cheap
# elementwise chains instead of saving them can eliminate whole memory
# passes. "dots" saves matmul outputs only (BN/ReLU chains recompute);
# "full" saves nothing inside the model.
REMAT_POLICIES: dict[str, object] = {
    "none": None,
    "full": "full",  # jax.checkpoint default: nothing saveable
    "dots": jax.checkpoint_policies.dots_saveable,
    "dots_nobatch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def run_one_step(model, loss_fn, tx, bn_momentum_fn, task, augment_fn,
                 mesh_present: bool, state: TrainState, batch: dict,
                 step_rng: jax.Array, remat: str = "none"):
    """One forward/backward/optimizer step on already-per-replica data.

    `step_rng` must already be folded with the replica index (and, for
    scanned multi-step execution, the step index). Returns
    (new_state, {"loss", "accuracy"}) with scalars pmean'd over the data
    axis when running under shard_map. `remat` selects a REMAT_POLICIES
    entry applied around the model forward.
    """
    aug_rng, dropout_rng = jax.random.split(step_rng)
    if augment_fn is not None:
        batch = dict(batch, points=augment_fn(aug_rng, batch["points"]))
    bn_momentum = bn_momentum_fn(state.step)
    bn_axis = DATA_AXIS if mesh_present else None

    def loss_of(params):
        with cross_replica_bn(bn_axis):
            (logits, _), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *_model_inputs(batch, task), train=True,
                bn_momentum=bn_momentum,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
        # `mask` (from nvalid) zeroes the duplicated rows of a padded
        # final batch out of the loss/grads; the reference instead trains
        # on its feed buffer's stale tail rows (train.py:203-210). BN
        # batch statistics still see the padded rows (as they do there).
        mask = batch.get("mask")
        if mask is None:
            loss = loss_fn(logits, *_loss_args(batch, task))
        else:
            # Normalize by the global valid count: with per-replica means
            # a replica holding only padding would contribute loss 0 and
            # the caller's pmean would dilute the gradient by the padded
            # fraction of replicas. Dividing each replica's weighted SUM
            # by the MEAN per-replica count makes pmean(loss) and
            # pmean(grads) the exact global masked mean.
            num, den = loss_fn(logits, *_loss_args(batch, task),
                               sample_weight=mask, sum_count=True)
            if mesh_present:
                den = jax.lax.pmean(den, DATA_AXIS)
            # epsilon, not 1.0: den (mean per-replica valid count) drops
            # below 1 when valid rows are rarer than replicas; num is 0
            # whenever den is, so the quotient stays finite
            loss = num / jnp.maximum(den, 1e-8)
        return loss, (logits, mutated["batch_stats"])

    policy = REMAT_POLICIES[remat]
    if policy is not None:
        loss_of = (jax.checkpoint(loss_of) if policy == "full"
                   else jax.checkpoint(loss_of, policy=policy))
    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_of, has_aux=True)(state.params)
    acc = _accuracy(logits, batch, task,
                    pmean_axis=DATA_AXIS if mesh_present else None)
    if mesh_present:
        # new_stats needs no reduction: BN statistics are already synced
        # cross-replica inside the forward (see cross_replica_bn).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        acc = jax.lax.pmean(acc, DATA_AXIS)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=new_params,
                           batch_stats=new_stats, opt_state=new_opt_state)
    return new_state, {"loss": loss, "accuracy": acc}
