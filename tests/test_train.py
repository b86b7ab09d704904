"""Training-loop integration tests on the 8-device virtual CPU mesh."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.data import SyntheticClassification, SyntheticSegmentation
from pointnet2_tpu.parallel import make_mesh
from pointnet2_tpu.train import TrainConfig, Trainer
from pointnet2_tpu.train.schedules import (
    bn_momentum_schedule,
    exponential_decay_clipped,
)


def test_mesh_has_8_virtual_devices():
    if jax.default_backend() == "tpu":
        pytest.skip("virtual-device mesh is a CPU-only test fixture")
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_lr_schedule_parity():
    # train.py defaults: base 1e-3, decay 0.7 per 200k examples, clip 1e-5
    sched = exponential_decay_clipped(1e-3, 16, 200000, 0.7)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(200000 // 16)) == pytest.approx(7e-4)
    assert float(sched(10_000_000)) == pytest.approx(1e-5)  # clipped


def test_bn_momentum_schedule_parity():
    sched = bn_momentum_schedule(16, 200000)
    assert float(sched(0)) == pytest.approx(0.5)
    assert float(sched(200000 // 16)) == pytest.approx(0.75)
    assert float(sched(10_000_000)) == pytest.approx(0.99)  # clipped


def _make_trainer(tmp_path, **kw):
    defaults = dict(model="pointnet2_cls_ssg", batch_size=8, max_epoch=1,
                    log_dir=str(tmp_path), augment="none",
                    learning_rate=3e-3)
    defaults.update(kw)
    return Trainer(TrainConfig(**defaults))


def test_train_step_runs_and_loss_decreases(tmp_path):
    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8)
    tr = _make_trainer(tmp_path)
    example = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(example))
    losses = []
    import jax as _jax

    for epoch in range(4):
        for batch in ds.epoch():
            tr._rng, rng = _jax.random.split(tr._rng)
            from pointnet2_tpu.parallel.mesh import shard_batch

            db = shard_batch(tr.mesh, tr._device_view(batch))
            state, metrics = tr.train_step(state, db, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 4 * ds.num_batches()


def test_trainer_fit_and_eval(tmp_path):
    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8)
    tr = _make_trainer(tmp_path, max_epoch=2, ckpt_every_epochs=1)
    state = tr.fit(ds, eval_dataset=ds)
    acc = tr.eval_epoch(state, ds, epoch=99)
    assert 0.0 <= acc <= 1.0
    # Source/config snapshot into the log dir (reference train.py:56-57).
    assert (tmp_path / "cls_ssg.py").is_file()
    cfg = json.loads((tmp_path / "config.json").read_text())
    assert cfg["model"] == "pointnet2_cls_ssg" and cfg["batch_size"] == 8


def test_resume_does_not_clobber_better_best_ckpt(tmp_path):
    """A resumed fit must seed its best-score tracker from the best
    checkpoint's sidecar meta, not -inf — otherwise the first post-resume
    eval silently overwrites the true best model (hit in anger by the
    procmn40 run, resumed through TPU wedges at epochs past its peak)."""
    from pointnet2_tpu.train import checkpoint as ckpt

    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8)
    tr = _make_trainer(tmp_path, max_epoch=1, ckpt_every_epochs=1)
    tr.fit(ds, eval_dataset=ds)
    meta = ckpt.load_meta(str(tmp_path), name="best")
    assert meta is not None and meta.get("score") is not None
    # pretend the pre-interruption best was (unbeatably) high
    meta["score"] = 0.999999
    with open(tmp_path / "best.meta.json", "w") as f:
        json.dump(meta, f)
    tr2 = _make_trainer(tmp_path, max_epoch=2, ckpt_every_epochs=1)
    tr2.fit(ds, eval_dataset=ds)  # resumes at epoch 1
    meta2 = ckpt.load_meta(str(tmp_path), name="best")
    assert meta2["score"] == pytest.approx(0.999999), \
        "resume overwrote a better best checkpoint"


def test_checkpoint_roundtrip_resume(tmp_path):
    from pointnet2_tpu.train import checkpoint as ckpt

    ds = SyntheticClassification(num_classes=2, samples_per_class=8,
                                 npoints=64, batch_size=8)
    tr = _make_trainer(tmp_path)
    example = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(example))
    batch = next(iter(ds.epoch()))
    from pointnet2_tpu.parallel.mesh import shard_batch

    db = shard_batch(tr.mesh, tr._device_view(batch))
    state, _ = tr.train_step(state, db, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), state)
    template = tr.init_state(tr._device_view(example))
    restored = ckpt.restore_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_sharded_matches_single_device(tmp_path):
    """The 8-way data-parallel step must compute the same update as one
    device (same global batch, no augmentation/dropout divergence)."""
    from pointnet2_tpu.models import MODEL_REGISTRY
    from pointnet2_tpu.train.schedules import bn_momentum_schedule
    from pointnet2_tpu.train.state import TrainState, make_optimizer
    from pointnet2_tpu.train.steps import make_train_step
    from pointnet2_tpu.parallel.mesh import make_mesh, shard_batch

    spec = MODEL_REGISTRY["pointnet_cls_basic"]
    model = spec.cls()
    rng = np.random.RandomState(7)
    batch = {"points": jnp.asarray(rng.rand(8, 64, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 4, (8,)).astype(np.int32))}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch["points"], train=False)
    tx = make_optimizer("adam", lambda s: 1e-3)
    bn_fn = bn_momentum_schedule(8, 200000)
    init = TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))

    mesh = make_mesh()
    step8 = make_train_step(model, spec.loss, tx, bn_fn, task="cls", mesh=mesh)
    step1 = make_train_step(model, spec.loss, tx, bn_fn, task="cls", mesh=None)

    # the train step donates its state argument; give each call its own copy
    init8 = jax.tree_util.tree_map(jnp.copy, init)
    init1 = jax.tree_util.tree_map(jnp.copy, init)
    s8, m8 = step8(init8, shard_batch(mesh, batch), jax.random.PRNGKey(5))
    s1, m1 = step1(init1, batch, jax.random.PRNGKey(5))
    # dropout masks intentionally differ per replica (rng is folded with the
    # data-axis index), so the loss only matches approximately; the BN batch
    # statistics sit upstream of dropout and must match exactly across
    # sharding — that is the real all-reduce correctness check.
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=0.05)
    for a, b in zip(jax.tree_util.tree_leaves(s8.batch_stats),
                    jax.tree_util.tree_leaves(s1.batch_stats)):
        # identical up to all-reduce float reassociation
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_segmentation_task_train_step(tmp_path):
    ds = SyntheticSegmentation(num_classes=5, num_samples=8, npoints=1024,
                               batch_size=8)
    tr = Trainer(TrainConfig(model="pointnet2_sem_seg", batch_size=8,
                             log_dir=str(tmp_path),
                             model_kwargs={"num_classes": 5}))
    batch = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(batch))
    from pointnet2_tpu.parallel.mesh import shard_batch

    db = shard_batch(tr.mesh, tr._device_view(batch))
    state, metrics = tr.train_step(state, db, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(state.step) == 1


def test_eval_count_step_per_class_counts(tmp_path):
    """Per-class counts: correct/total decompose exactly by label, and
    avg-class accuracy lands in metrics.jsonl (reference train.py:262-275)."""
    import numpy as np
    from pointnet2_tpu.parallel.mesh import shard_batch

    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8)
    tr = _make_trainer(tmp_path, max_epoch=1)
    example = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(example))

    batch = next(iter(ds.epoch()))
    db = tr._device_view(batch)
    db["mask"] = np.ones(db["points"].shape[0], np.float32)
    db = shard_batch(tr.mesh, db)
    c, t, cls_c, cls_t = tr.eval_count_step(state, db)
    assert cls_c.shape == cls_t.shape == (40,)  # model's class count
    np.testing.assert_allclose(float(c), float(np.sum(np.asarray(cls_c))))
    np.testing.assert_allclose(float(t), float(np.sum(np.asarray(cls_t))))
    # label histogram matches per-class totals
    hist = np.bincount(np.asarray(batch["label"]), minlength=40)
    np.testing.assert_array_equal(np.asarray(cls_t), hist.astype(np.float32))

    tr.eval_epoch(state, ds, epoch=0)
    rec = [json.loads(line)
           for line in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    evals = [r for r in rec if r.get("split") == "eval"]
    assert "avg_class_accuracy" in evals[-1]
    assert 0.0 <= evals[-1]["avg_class_accuracy"] <= 1.0


def test_trainer_remat_config_smoke():
    """TrainConfig.remat plumbs through to the step factories: a remat
    Trainer runs and the underlying step matches the default step to
    float tolerance (bitwise parity is asserted at the steps level in
    benchmarks/probe_remat.py's CPU check; through a full Adam epoch the
    1/sqrt(v) normalization amplifies reassociation noise)."""
    import numpy as np

    from pointnet2_tpu.data import SyntheticClassification
    from pointnet2_tpu.train import TrainConfig, Trainer

    def run(remat, tmp):
        ds = SyntheticClassification(num_classes=4, samples_per_class=4,
                                     npoints=32, batch_size=8, seed=0)
        t = Trainer(TrainConfig(model="pointnet_cls_basic", batch_size=8,
                                max_epoch=1, num_point=32, augment="none",
                                log_dir=tmp, remat=remat, eval_every=10))
        state = t.fit(ds)
        assert int(state.step) == 2
        leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(state.params)]
        assert all(np.isfinite(x).all() for x in leaves)
        return np.concatenate([x.ravel() for x in leaves])

    import tempfile

    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        a = run("none", d1)
        b = run("dots", d2)
    # identical training up to Adam-amplified reassociation noise
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_train_step_masks_padded_rows(tmp_path):
    """With a `mask` in the batch (built by Trainer._train_view from
    nvalid), the padded tail rows must not influence loss or gradients:
    two batches that differ only in masked-row LABELS produce identical
    new params. (The reference instead trains on its feed buffer's stale
    tail rows, train.py:203-210 — a documented improvement. Tail point
    VALUES still reach BN batch statistics, as they do in the reference,
    so the test varies labels, which only the loss sees.)"""
    import numpy as _np

    from pointnet2_tpu.parallel.mesh import shard_batch

    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8)
    from pointnet2_tpu.parallel.mesh import replicated_sharding

    tr = _make_trainer(tmp_path)
    example = next(iter(ds.epoch()))
    host_state = jax.device_get(tr.init_state(tr._device_view(example)))

    batch = dict(example)
    batch["nvalid"] = 5
    rng = jax.random.PRNGKey(7)

    def step_with_tail(tail_label):
        b = {k: (v.copy() if isinstance(v, _np.ndarray) else v)
             for k, v in batch.items()}
        b["points"][5:] = 0.25
        b["label"][5:] = tail_label
        db = shard_batch(tr.mesh, tr._train_view(b))
        assert "mask" in db and db["mask"].sum() == 5
        # fresh device copy per call: train_step donates its state arg
        state = jax.device_put(host_state, replicated_sharding(tr.mesh))
        new_state, metrics = tr.train_step(state, db, rng)
        return new_state, metrics

    s_a, m_a = step_with_tail(3)
    s_b, m_b = step_with_tail(0)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]))
    assert float(m_a["accuracy"]) == pytest.approx(float(m_b["accuracy"]))
    pa = jax.tree_util.tree_leaves(s_a.params)
    pb = jax.tree_util.tree_leaves(s_b.params)
    for a, b in zip(pa, pb):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    rtol=0, atol=0)


def test_checkpoint_overwrite_is_crash_safe(tmp_path):
    """Overwriting the resume checkpoint must never pass through a state
    where no restorable checkpoint exists: a kill between the two swap
    renames leaves `<name>.old`, which load/restore recover."""
    import os
    import shutil

    from pointnet2_tpu.data import SyntheticClassification
    from pointnet2_tpu.train import checkpoint as ckpt

    ds = SyntheticClassification(num_classes=2, samples_per_class=4,
                                 npoints=32, batch_size=8)
    tr = _make_trainer(tmp_path)
    example = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(example))

    ckpt.save_checkpoint(str(tmp_path), state, epoch=1)
    # second save over the first must leave a loadable checkpoint
    ckpt.save_checkpoint(str(tmp_path), state, epoch=2)
    assert ckpt.load_meta(str(tmp_path))["epoch"] == 2
    path = os.path.join(str(tmp_path), "ckpt")
    assert not os.path.isdir(path + ".old")
    assert not os.path.isdir(path + ".new")

    # simulate a crash between the two renames: name gone, .old present
    shutil.move(path, path + ".old")
    meta = ckpt.load_meta(str(tmp_path))
    assert meta is not None and meta["epoch"] == 2, "recovery failed"
    restored = ckpt.restore_checkpoint(str(tmp_path), state)
    assert int(restored.step) == int(state.step)


def test_save_into_crashed_swap_state_keeps_resume_point(tmp_path, monkeypatch):
    """Direct-API hazard (ADVICE r4): save_checkpoint called on a directory
    left in the crashed-between-renames state (only `.old` alive) must
    recover the survivor BEFORE clearing stale side dirs — if the new save
    then dies mid-write, the previous generation must still restore."""
    import os
    import shutil

    import orbax.checkpoint as ocp

    from pointnet2_tpu.data import SyntheticClassification
    from pointnet2_tpu.train import checkpoint as ckpt

    ds = SyntheticClassification(num_classes=2, samples_per_class=4,
                                 npoints=32, batch_size=8)
    tr = _make_trainer(tmp_path)
    example = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(example))
    ckpt.save_checkpoint(str(tmp_path), state, epoch=1)
    path = os.path.join(str(tmp_path), "ckpt")
    # crashed-between-renames state: name gone, only .old survives
    shutil.move(path, path + ".old")

    # the very next save dies inside orbax, before any rename
    def boom(self, *a, **k):
        raise RuntimeError("simulated mid-save crash")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        ckpt.save_checkpoint(str(tmp_path), state, epoch=2)
    # the epoch-1 generation must still be restorable
    meta = ckpt.load_meta(str(tmp_path))
    assert meta is not None and meta["epoch"] == 1
    restored = ckpt.restore_checkpoint(str(tmp_path), state)
    assert int(restored.step) == int(state.step)


def test_multi_step_unroll_matches_default():
    """make_train_multi_step(unroll=U) must be semantics-preserving: same
    per-step losses and final state as the default scan (the knob only
    changes loop structure; measured slower on the headline step —
    benchmarks/probe_scan_unroll.py — but kept for other shapes)."""
    from pointnet2_tpu.models import MODEL_REGISTRY
    from pointnet2_tpu.train.state import TrainState, make_optimizer
    from pointnet2_tpu.train.steps import make_train_multi_step

    rng = np.random.RandomState(0)
    K, B, N = 4, 4, 64
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls()
    batches = {
        "points": jnp.asarray(rng.rand(K, B, N, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 4, (K, B)).astype(np.int32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches["points"][0], train=False)
    tx = make_optimizer("adam", exponential_decay_clipped(1e-3, B, 200000,
                                                          0.7))
    bn_fn = bn_momentum_schedule(B, 200000)
    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    outs = {}
    for unroll in (1, 2, K):
        step = make_train_multi_step(model, spec.loss, tx, bn_fn,
                                     task="cls", augment="cls",
                                     unroll=unroll)
        st = jax.tree_util.tree_map(jnp.copy, state0)
        st, metrics = step(st, batches, jax.random.PRNGKey(7))
        outs[unroll] = (np.asarray(metrics["loss"]), st)
    for unroll in (2, K):
        # unrolled bodies fuse/reassociate reductions differently, so
        # agreement is numerical, not bitwise; Adam further amplifies
        # tiny grad diffs into O(lr) update flips, so params get a drift
        # bound, not elementwise closeness
        np.testing.assert_allclose(outs[unroll][0], outs[1][0],
                                   rtol=1e-3, atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_less(
                np.max(np.abs(np.asarray(a) - np.asarray(b))), 5e-3),
            outs[unroll][1].params, outs[1][1].params)
        assert int(outs[unroll][1].step) == K
