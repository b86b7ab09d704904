"""Unified trainer: one host loop for every task and any mesh size.

Replaces the reference's five near-identical training drivers (train.py,
train_multi_gpu.py, part_seg/train.py, part_seg/train_one_hot.py,
scannet/train.py) with a single loop around the jit(shard_map(step))
program. Single chip and N-host pod slices run the same code — only the
mesh differs.
"""

from __future__ import annotations

import dataclasses
import inspect
import json
import os
import shutil
import sys
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.parallel import multihost
from pointnet2_tpu.parallel.mesh import make_mesh, shard_batch
from pointnet2_tpu.train import checkpoint as ckpt
from pointnet2_tpu.train.schedules import (
    bn_momentum_schedule,
    exponential_decay_clipped,
)
from pointnet2_tpu.train.state import TrainState, make_optimizer
from pointnet2_tpu.train.steps import (
    make_eval_count_step,
    make_eval_step,
    make_train_multi_step,
    make_train_step,
)
from pointnet2_tpu.utils.prefetch import Prefetcher


@dataclass
class TrainConfig:
    model: str = "pointnet2_cls_ssg"
    num_point: int = 1024
    batch_size: int = 16  # global batch, split across the data mesh
    max_epoch: int = 251
    learning_rate: float = 1e-3
    momentum: float = 0.9
    optimizer: str = "adam"
    decay_step: int = 200000
    decay_rate: float = 0.7
    bn_init_decay: float = 0.5
    bn_decay_rate: float = 0.5
    bn_decay_clip: float = 0.99
    augment: str = "none"  # none | cls | cls_normals | scannet (on-device)
    host_augment: bool = False  # use the dataset's numpy augmentation instead
    steps_per_call: int = 1  # scan K prefetched batches per device dispatch
    num_devices: int | None = None
    log_dir: str = "log"
    ckpt_every_epochs: int = 10
    eval_every: int = 1  # epochs between evals (scannet/train.py:167 uses 5)
    prefetch: int = 2  # host batches loaded ahead of device dispatch
    seed: int = 0
    compute_dtype: str = "float32"  # float32 | bfloat16 (params stay f32)
    model_kwargs: dict = field(default_factory=dict)
    # stall watchdog (train/watchdog.py): exit EXIT_STALLED if no dispatch
    # completes for this many seconds (None = off). Must exceed worst-case
    # remote compile of the first dispatch.
    watchdog_secs: float | None = None
    # backward-pass rematerialization policy (steps_body.REMAT_POLICIES):
    # none | full | dots | dots_nobatch. Measured 30-58% SLOWER on this
    # chip (docs/PERF.md negative results) — an option for memory-limited
    # configs, not a speed knob here.
    remat: str = "none"


class Trainer:
    def __init__(self, config: TrainConfig, mesh=None):
        self.config = config
        spec = MODEL_REGISTRY[config.model]
        self.task = spec.task
        model_kwargs = dict(config.model_kwargs)
        if config.compute_dtype == "bfloat16":
            model_kwargs.setdefault("dtype", jnp.bfloat16)
        self.model = spec.cls(**model_kwargs)
        self.loss_fn = spec.loss
        self.mesh = mesh if mesh is not None else make_mesh(config.num_devices)
        n_dev = self.mesh.devices.size
        if config.batch_size % n_dev:
            raise ValueError(
                f"global batch {config.batch_size} not divisible by "
                f"{n_dev} devices")

        self.lr_schedule = exponential_decay_clipped(
            config.learning_rate, config.batch_size, config.decay_step,
            config.decay_rate)
        self.bn_schedule = bn_momentum_schedule(
            config.batch_size, config.decay_step, config.bn_init_decay,
            config.bn_decay_rate, config.bn_decay_clip)
        self.tx = make_optimizer(config.optimizer, self.lr_schedule,
                                 config.momentum)
        self.train_step = make_train_step(
            self.model, self.loss_fn, self.tx, self.bn_schedule,
            task=self.task, mesh=self.mesh, augment=config.augment,
            remat=config.remat)
        self.train_multi_step = None
        if config.steps_per_call > 1:
            self.train_multi_step = make_train_multi_step(
                self.model, self.loss_fn, self.tx, self.bn_schedule,
                task=self.task, mesh=self.mesh, augment=config.augment,
                remat=config.remat)
        self.eval_step = make_eval_step(self.model, task=self.task,
                                        mesh=self.mesh)
        self.eval_count_step = make_eval_count_step(self.model, task=self.task,
                                                    mesh=self.mesh)
        self._local_eval_step = None  # built lazily for multihost protocols
        self._watchdog = None  # created by fit() when config.watchdog_secs
        self._rng = jax.random.PRNGKey(config.seed)
        os.makedirs(config.log_dir, exist_ok=True)
        self._snapshot_sources()
        # only the primary process touches the shared log dir (N hosts
        # appending to one file interleave/tear writes)
        sink = (os.path.join(config.log_dir, "log_train.txt")
                if multihost.is_primary() else os.devnull)
        self._log_file = open(sink, "a")
        sink = (os.path.join(config.log_dir, "metrics.jsonl")
                if multihost.is_primary() else os.devnull)
        self._metrics_file = open(sink, "a")

    def _snapshot_sources(self) -> None:
        """Snapshot the run's provenance into the log dir: the model source
        file and driver script (the reference copies both, train.py:56-57)
        plus the fully-resolved config as JSON (the reference has no config
        record beyond argv in the log). Primary process only; config.json
        is never overwritten, so the original run's record survives resume
        (log_train.txt/metrics.jsonl append for the same reason)."""
        if not multihost.is_primary():
            return
        cfg = self.config
        main_file = getattr(sys.modules.get("__main__"), "__file__", None)
        if main_file and os.path.basename(main_file) == "__main__.py":
            # `python -m tool` launchers: __main__.py is the launcher's,
            # not a driver script worth snapshotting
            main_file = None
        for src in (inspect.getsourcefile(type(self.model)), main_file):
            if src and os.path.isfile(src):
                dst = os.path.join(cfg.log_dir, os.path.basename(src))
                if os.path.abspath(src) != os.path.abspath(dst):
                    shutil.copyfile(src, dst)
        cfg_path = os.path.join(cfg.log_dir, "config.json")
        if not os.path.exists(cfg_path):
            with open(cfg_path, "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    # ------------------------------------------------------------------
    def log(self, msg: str) -> None:
        if multihost.is_primary():
            print(msg, flush=True)
            self._log_file.write(msg + "\n")
            self._log_file.flush()

    def _beat(self) -> None:
        if self._watchdog is not None:
            self._watchdog.beat()

    def log_metrics(self, **kv: Any) -> None:
        self._metrics_file.write(json.dumps(kv) + "\n")
        self._metrics_file.flush()

    # ------------------------------------------------------------------
    def init_state(self, example_batch: dict) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(self.config.seed),
                "dropout": jax.random.PRNGKey(self.config.seed + 1)}
        from pointnet2_tpu.train.steps import _model_inputs

        inputs = _model_inputs(
            jax.tree_util.tree_map(jnp.asarray, example_batch), self.task)
        # jit the init: run eagerly it dispatches hundreds of small ops
        # (very slow over a remote-device transport)
        init_fn = jax.jit(lambda r, *a: self.model.init(r, *a, train=False))
        variables = init_fn(rngs, *inputs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        from pointnet2_tpu.parallel.mesh import replicated_sharding

        return jax.device_put(state, replicated_sharding(self.mesh))

    def maybe_restore(self, state: TrainState):
        """Returns (state, meta) — meta is the checkpoint's sidecar record
        ({"step", "epoch"}) or None when starting fresh."""
        meta = ckpt.load_meta(self.config.log_dir)
        if meta is not None:
            state = ckpt.restore_checkpoint(self.config.log_dir, state)
            self.log(f"restored checkpoint at step {int(state.step)} "
                     f"(epoch {meta.get('epoch')})")
            from pointnet2_tpu.parallel.mesh import replicated_sharding

            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state, meta

    # ------------------------------------------------------------------
    def train_epoch(self, state: TrainState, dataset, epoch: int):
        losses, accs, n = [], [], 0
        K = max(1, self.config.steps_per_call)
        buf: list[dict] = []

        def flush(state):
            nonlocal buf
            if not buf:
                return state
            self._rng, step_rng = jax.random.split(self._rng)
            if len(buf) < K or self.train_multi_step is None:
                # epoch remainder: single steps, avoids a second compile
                for b in buf:
                    device_batch = shard_batch(self.mesh,
                                               self._train_view(b))
                    state, metrics = self.train_step(state, device_batch,
                                                     step_rng)
                    losses.append(metrics["loss"])
                    accs.append(metrics["accuracy"])
                    self._rng, step_rng = jax.random.split(self._rng)
            else:
                stacked = {
                    k: np.stack([self._train_view(b)[k] for b in buf])
                    for k in self._train_view(buf[0])
                }
                device_batches = shard_batch(self.mesh, stacked, stacked=True)
                state, metrics = self.train_multi_step(state, device_batches,
                                                       step_rng)
                losses.extend(metrics["loss"])
                accs.extend(metrics["accuracy"])
            buf = []
            return state

        # Hosts must dispatch the same number of lockstep steps; with
        # host-sharded data the remainder host may own extra batches —
        # agree on the min and skip its surplus tail (see sync_num_batches).
        num_steps = multihost.sync_num_batches(dataset.num_batches(), "min")
        loader = Prefetcher(dataset.epoch(augment=self.config.host_augment),
                            depth=self.config.prefetch)
        t0 = time.time()
        for _, batch in zip(range(num_steps), loader):
            buf.append(batch)
            n += batch["nvalid"]
            if len(buf) == K:
                state = flush(state)
                self._beat()
        state = flush(state)
        self._beat()
        loader.close()
        dt = time.time() - t0
        loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        acc = float(jnp.mean(jnp.stack(accs))) if accs else float("nan")
        self.log(f"epoch {epoch}: train loss {loss:.4f} acc {acc:.4f} "
                 f"({n / max(dt, 1e-9):.1f} ex/s)")
        # schedule scalars, as the reference's TB summaries record
        # (train.py:125-131: learning_rate, bn_decay)
        step = int(state.step)
        self.log_metrics(epoch=epoch, split="train", loss=loss, accuracy=acc,
                         examples_per_sec=n / max(dt, 1e-9), step=step,
                         learning_rate=float(self.lr_schedule(step)),
                         bn_momentum=float(self.bn_schedule(step)))
        return state

    def _device_view(self, batch: dict) -> dict:
        """Strip host-only fields; everything else goes to the device."""
        return {k: v for k, v in batch.items() if k != "nvalid"}

    def _train_view(self, batch: dict) -> dict:
        """Device view + a validity mask so a padded final batch's
        duplicated rows drop out of the loss/grads (steps_body)."""
        db = self._device_view(batch)
        nv = batch.get("nvalid")
        if nv is not None:
            bsz = db["points"].shape[0]
            db["mask"] = (np.arange(bsz) < nv).astype(np.float32)
        return db

    def eval_epoch(self, state: TrainState, dataset, epoch: int) -> float:
        """Padded-batch-aware accuracy (the reference re-feeds stale rows in
        the final partial batch and reports them, train.py:255-271; here
        padding rows carry mask=0 and are excluded on device).

        Multi-host safe: the counts come back replicated from a psum (no
        host-side slicing of a cross-host sharded array), and hosts with
        fewer eval batches feed zero-masked padding batches so every host
        dispatches the same lockstep step count.
        """
        from pointnet2_tpu.evaluation.lockstep import lockstep_batches

        counts = []
        loader = Prefetcher(lockstep_batches(dataset, multihost),
                            depth=self.config.prefetch)
        for batch in loader:
            nv = batch["nvalid"]
            device_batch = self._device_view(batch)
            bsz = device_batch["points"].shape[0]
            device_batch["mask"] = (np.arange(bsz) < nv).astype(np.float32)
            device_batch = shard_batch(self.mesh, device_batch)
            # async dispatch: keep the per-batch count futures on device and
            # fetch once after the loop — a float() here would force a full
            # host<->device round trip (~40 ms on this transport) per batch,
            # which dominated eval wall time (155 batches -> ~7 s/epoch).
            counts.append(self.eval_count_step(state, device_batch))
            self._beat()
        loader.close()
        if counts:  # reduce on device, fetch once (not 4*N round trips)
            correct = float(jnp.sum(jnp.stack([c for c, _, _, _ in counts])))
            total = float(jnp.sum(jnp.stack([t for _, t, _, _ in counts])))
            cls_c = np.asarray(sum(c for _, _, c, _ in counts))
            cls_t = np.asarray(sum(t for _, _, _, t in counts))
        else:
            correct = total = 0.0
            cls_c = cls_t = np.zeros(1)
        acc = correct / max(total, 1.0)
        # avg-class accuracy over classes present in the eval set
        # (train.py:273-275 divides per-class; absent classes excluded)
        present = cls_t > 0
        avg_cls = float(np.mean(cls_c[present] / cls_t[present])) \
            if present.any() else 0.0
        self.log(f"epoch {epoch}: eval accuracy {acc:.4f}")
        self.log(f"epoch {epoch}: eval avg class acc {avg_cls:.4f}")
        self.log_metrics(epoch=epoch, split="eval", accuracy=acc,
                         avg_class_accuracy=avg_cls)
        return acc

    # ------------------------------------------------------------------
    def eval_logits_fn(self, state: TrainState):
        """Host-batch -> numpy logits closure for protocol evaluations
        (vote ensembling, ScanNet whole-scene) that need raw logits.

        Single-process: the sharded eval step. Multi-process: protocol
        evals iterate host-local data with host-dependent batch counts, so
        lockstep global dispatch would deadlock — instead each host runs a
        local jit (eval has no collectives) on its own default device and
        the caller allreduces its metric counters across hosts.
        """
        model_keys = ("points", "cls_label")
        if jax.process_count() == 1:
            def fn(batch: dict) -> np.ndarray:
                db = {k: v for k, v in batch.items() if k in model_keys}
                out = np.asarray(
                    self.eval_step(state, shard_batch(self.mesh, db)))
                self._beat()  # protocol evals can outlast the watchdog
                return out
            return fn
        if self._local_eval_step is None:
            self._local_eval_step = make_eval_step(self.model, task=self.task,
                                                   mesh=None)
        # Replicated global -> one local device-resident copy, put ONCE:
        # passing numpy trees to a jit re-uploads every leaf per dispatch
        # (params + opt state, hundreds of dispatches per protocol eval).
        host_state = jax.device_put(jax.device_get(state),
                                    jax.local_devices()[0])

        def fn(batch: dict) -> np.ndarray:
            db = {k: np.asarray(v) for k, v in batch.items()
                  if k in model_keys}
            out = np.asarray(self._local_eval_step(host_state, db))
            self._beat()  # protocol evals can outlast the watchdog
            return out
        return fn

    # ------------------------------------------------------------------
    def fit(self, train_dataset, eval_dataset=None,
            max_epoch: int | None = None, eval_protocol=None) -> TrainState:
        """Train with periodic eval and best-checkpoint tracking.

        `eval_protocol(trainer, state, epoch) -> float`, when given,
        replaces the plain eval accuracy as the best-model score (the
        reference's scannet driver selects on calibrated whole-scene voxel
        accuracy, scannet/train.py:167-174).
        """
        max_epoch = max_epoch or self.config.max_epoch
        if self.config.watchdog_secs:
            from pointnet2_tpu.train.watchdog import Watchdog

            self._watchdog = Watchdog(self.config.watchdog_secs,
                                      log_fn=self.log)
        try:
            return self._fit(train_dataset, eval_dataset, max_epoch,
                             eval_protocol)
        finally:
            # an exception must not leave an armed watchdog behind to
            # os._exit a caller that caught the error and moved on
            if self._watchdog is not None:
                self._watchdog.close()
                self._watchdog = None

    def _fit(self, train_dataset, eval_dataset, max_epoch,
             eval_protocol) -> TrainState:
        example = next(iter(train_dataset.epoch()))
        state = self.init_state(self._device_view(example))
        state, meta = self.maybe_restore(state)
        if meta is None:
            start_epoch = 0
        elif meta.get("epoch") is not None:
            start_epoch = int(meta["epoch"])
        else:  # meta-less legacy checkpoint: fall back to deriving
            start_epoch = int(state.step) // max(train_dataset.num_batches(), 1)
        # A resumed run must not let its first eval clobber a better
        # best-checkpoint from before the interruption: the selection
        # score rides in the best ckpt's sidecar meta.
        # Only a resumed run inherits the sidecar score: a fresh fit in a
        # reused log_dir must remain free to overwrite a stale best ckpt,
        # and a legitimate score of 0.0 must not read as missing.
        best_score = -float("inf")
        if meta is not None:
            best_meta = ckpt.load_meta(self.config.log_dir, name="best")
            if best_meta is not None and best_meta.get("score") is not None:
                best_score = float(best_meta["score"])
        every = max(1, self.config.eval_every)
        for epoch in range(start_epoch, max_epoch):
            state = self.train_epoch(state, train_dataset, epoch)
            want_eval = eval_dataset is not None or eval_protocol is not None
            if want_eval and (epoch % every == 0 or epoch == max_epoch - 1):
                if eval_protocol is not None:
                    score = eval_protocol(self, state, epoch)
                else:
                    score = self.eval_epoch(state, eval_dataset, epoch)
                if score > best_score:
                    best_score = score
                    ckpt.save_checkpoint(self.config.log_dir, state,
                                         name="best", epoch=epoch + 1,
                                         score=score)
                    self.log(f"epoch {epoch}: new best score {score:.4f}")
            if (epoch + 1) % self.config.ckpt_every_epochs == 0:
                path = ckpt.save_checkpoint(self.config.log_dir, state,
                                            epoch=epoch + 1)
                self.log(f"saved checkpoint to {path}")
        if start_epoch < max_epoch:
            path = ckpt.save_checkpoint(self.config.log_dir, state,
                                        epoch=max_epoch)
            self.log(f"saved final checkpoint to {path}")
        return state
