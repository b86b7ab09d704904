"""Worker for the real multi-process distributed test (test_multiprocess.py).

Each process owns 4 virtual CPU devices; two processes form one 8-device
data mesh via jax.distributed. Runs one deterministic train step with the
per-process input shard and prints the loss — the parent asserts both
processes agree with the single-process 8-device result.
"""

import os
import sys

# launched as `python tests/_multiprocess_worker.py`, so sys.path[0] is
# tests/ — make the repo root importable regardless of install state
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_fit(pid: int, nproc: int, log_dir: str) -> None:
    """Full Trainer.fit loop across processes: train epochs with host-sharded
    data (UNEVEN shards: the remainder host owns an extra batch, exercising
    sync_num_batches), multi-host-safe eval (psum'd counts), process-0-gated
    checkpointing, then resume from the checkpoint for one more epoch."""
    import jax
    import numpy as np

    from pointnet2_tpu.data import SyntheticClassification
    from pointnet2_tpu.data.modelnet import _host_slice
    from pointnet2_tpu.train import TrainConfig, Trainer
    from pointnet2_tpu.train import checkpoint as ckpt

    local_batch = 8 // max(jax.process_count(), 1)

    def make_ds(seed: int, n_total: int):
        ds = SyntheticClassification(
            num_classes=5, samples_per_class=n_total // 5, npoints=32,
            batch_size=local_batch, seed=seed)
        sl = _host_slice(len(ds), (pid, nproc) if nproc > 1 else None)
        ds.data, ds.label = ds.data[sl], ds.label[sl]
        return ds

    # 25 items over 2 hosts -> 12 vs 13 items -> 3 vs 4 local batches
    train_ds, eval_ds = make_ds(3, 25), make_ds(4, 25)

    config = TrainConfig(model="pointnet_cls_basic", batch_size=8,
                         max_epoch=2, ckpt_every_epochs=1, eval_every=1,
                         log_dir=log_dir, augment="none", num_point=32)
    trainer = Trainer(config)
    state = trainer.fit(train_ds, eval_dataset=eval_ds)
    acc = trainer.eval_epoch(state, eval_ds, epoch=98)

    # resume: a fresh Trainer picks up the checkpoint (+ its epoch) and
    # trains exactly one more epoch
    trainer2 = Trainer(TrainConfig(**{**config.__dict__, "max_epoch": 3}))
    state2 = trainer2.fit(train_ds, eval_dataset=eval_ds)
    acc2 = trainer2.eval_epoch(state2, eval_ds, epoch=99)
    meta = ckpt.load_meta(log_dir)

    # Host-sharded VOTING protocol (cli.evaluate --multihost): uneven
    # shards (3 vs 4 local batches) force the lockstep dummy-batch path,
    # and the allreduced counters must see all 25 global shapes.
    from pointnet2_tpu.evaluation import evaluate_cls_voting
    from pointnet2_tpu.parallel.mesh import shard_batch

    from jax.sharding import PartitionSpec as P

    from pointnet2_tpu.parallel.mesh import DATA_AXIS
    from pointnet2_tpu.parallel.multihost import to_local_numpy

    def logits_fn(points):
        batch = {"points": np.asarray(points, np.float32),
                 "label": np.zeros(points.shape[0], np.int32)}
        db = shard_batch(trainer2.mesh, trainer2._device_view(batch))
        return to_local_numpy(trainer2.eval_step(state2, db),
                              trainer2.mesh, P(DATA_AXIS))

    res = evaluate_cls_voting(logits_fn, eval_ds, num_votes=2,
                              num_classes=5, rng=0, log_fn=lambda m: None)

    # EMPTY-SHARD lockstep: a tiny eval split (3 items < nproc hosts) gives
    # every non-final rank a 0-batch shard (shard_bounds: per=0); those
    # hosts must feed zero batches built from dataset.zero_batch() metadata
    # — there is no local batch to template from — and the allreduced
    # counters still see all 3 global items.
    tiny_seen = -1
    tiny_acc = float("nan")
    if nproc >= 2:
        tiny = SyntheticClassification(num_classes=5, samples_per_class=1,
                                       npoints=32, batch_size=local_batch,
                                       seed=5)
        tiny.data, tiny.label = tiny.data[:3], tiny.label[:3]
        sl = _host_slice(3, (pid, nproc))
        tiny.data, tiny.label = tiny.data[sl], tiny.label[sl]
        acc_tiny = trainer2.eval_epoch(state2, tiny, epoch=100)
        res_tiny = evaluate_cls_voting(logits_fn, tiny, num_votes=2,
                                       num_classes=5, rng=0,
                                       log_fn=lambda m: None)
        tiny_seen = int(res_tiny["per_class_seen"].sum())
        tiny_acc = float(acc_tiny)

    print(f"FIT_RESULT pid={pid} acc={acc:.6f} acc2={acc2:.6f} "
          f"step={int(state2.step)} epoch={meta['epoch']}", flush=True)
    print(f"VOTE_RESULT pid={pid} acc={res['accuracy']:.6f} "
          f"seen={int(res['per_class_seen'].sum())}", flush=True)
    print(f"TINY_RESULT pid={pid} acc={tiny_acc:.6f} seen={tiny_seen}",
          flush=True)


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    fit_log_dir = sys.argv[4] if len(sys.argv) > 4 else ""
    # 8 global devices regardless of layout: 2 processes x 4, or 1 x 8 —
    # the dropout fold over axis_index makes the loss depend on the GLOBAL
    # device count, so the single-process reference must also use 8
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    from pointnet2_tpu.parallel import multihost

    if nproc > 1:
        multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    if mode == "fit":
        run_fit(pid, nproc, fit_log_dir)
        return

    import jax.numpy as jnp
    import numpy as np

    from pointnet2_tpu.models import MODEL_REGISTRY
    from pointnet2_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from pointnet2_tpu.train.schedules import (
        bn_momentum_schedule,
        exponential_decay_clipped,
    )
    from pointnet2_tpu.train.state import TrainState, make_optimizer
    from pointnet2_tpu.train.steps import make_train_step

    mesh = make_mesh(jax.device_count())
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls()
    B_global, N = 8, 64

    rng = np.random.RandomState(0)
    points = rng.rand(B_global, N, 3).astype(np.float32)
    label = rng.randint(0, 40, (B_global,)).astype(np.int32)
    start, stop = multihost.process_shard(B_global)
    local = {"points": points[start:stop], "label": label[start:stop]}

    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(points))
    lr = exponential_decay_clipped(1e-3, B_global, 200000, 0.7)
    tx = make_optimizer("adam", lr)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    state = jax.device_put(state, replicated_sharding(mesh))

    step = make_train_step(model, spec.loss, tx,
                           bn_momentum_schedule(B_global, 200000),
                           task="cls", mesh=mesh, augment="none")
    state, metrics = step(state, shard_batch(mesh, local),
                          jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    print(f"MULTIPROC_RESULT pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
