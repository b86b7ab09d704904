"""Tests for the serving Predictor (pointnet2_tpu/serving.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.models import MODEL_REGISTRY
from pointnet2_tpu.serving import Predictor


def _init_variables(model_name, num_point=128, in_channels=3, **kw):
    spec = MODEL_REGISTRY[model_name]
    model = spec.cls(**kw)
    dummy = jnp.zeros((2, num_point, in_channels), jnp.float32)
    inputs = (dummy,)
    if spec.task == "part_seg_one_hot":
        inputs = (dummy, jnp.zeros((2,), jnp.int32))
    return jax.jit(lambda r, *a: model.init(r, *a, train=False))(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, *inputs)


def test_bucketed_batches_match_direct(rng):
    variables = _init_variables("pointnet2_cls_ssg")
    pred = Predictor("pointnet2_cls_ssg", variables, dtype=None,
                     buckets=(4, 8))
    pts = rng.rand(11, 128, 3).astype(np.float32)  # 8-chunk + pad-to-4
    out = pred(pts)
    assert out.shape == (11, 40) and out.dtype == np.float32

    # bucket padding must not change a row's logits
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    model = spec.cls()
    apply = jax.jit(lambda v, p: model.apply(v, p, train=False))
    direct, _ = apply(variables, jnp.asarray(pts[:8]))
    np.testing.assert_allclose(out[:8], np.asarray(direct, np.float32),
                               atol=1e-5, rtol=1e-5)
    # rows served in the padded tail chunk match a fresh direct call too
    direct2, _ = apply(variables, jnp.asarray(pts[8:]))
    np.testing.assert_allclose(out[8:], np.asarray(direct2, np.float32),
                               atol=1e-5, rtol=1e-5)


def test_predict_proba_and_votes(rng):
    variables = _init_variables("pointnet2_cls_ssg")
    pred = Predictor("pointnet2_cls_ssg", variables, dtype=None,
                     buckets=(4,))
    pts = rng.rand(3, 128, 3).astype(np.float32)
    proba = pred.predict_proba(pts)
    np.testing.assert_allclose(proba.sum(axis=-1), 1.0, atol=1e-5)

    v1 = pred.predict_votes(pts, num_votes=3, rng=0)
    v2 = pred.predict_votes(pts, num_votes=3, rng=0)
    np.testing.assert_allclose(v1, v2)  # seeded protocol is deterministic
    assert v1.shape == (3, 40)


def test_part_seg_one_hot_requires_cls_label(rng):
    variables = _init_variables("pointnet2_part_seg_msg_one_hot",
                                in_channels=6)
    pred = Predictor("pointnet2_part_seg_msg_one_hot", variables,
                     dtype=None, buckets=(2,))
    pts = rng.rand(2, 128, 6).astype(np.float32)
    with pytest.raises(ValueError):
        pred(pts)
    out = pred(pts, cls_label=np.array([1, 3]))
    assert out.shape == (2, 128, 50)


def test_sharded_predictor_matches_single_device(rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    variables = _init_variables("pointnet2_cls_ssg")
    pts = rng.rand(8, 128, 3).astype(np.float32)
    single = Predictor("pointnet2_cls_ssg", variables, dtype=None,
                       buckets=(8,))
    multi = Predictor("pointnet2_cls_ssg", variables, dtype=None,
                      buckets=(8,), num_devices=min(4, len(jax.devices())))
    np.testing.assert_allclose(single(pts), multi(pts), atol=1e-5, rtol=1e-5)


def test_from_checkpoint_roundtrip(tmp_path, rng):
    from pointnet2_tpu.train.checkpoint import save_checkpoint
    from pointnet2_tpu.train.state import TrainState, make_optimizer

    variables = _init_variables("pointnet2_cls_ssg")
    # scheduled lr, exactly as the Trainer builds it (the opt-state pytree
    # structure differs between constant and scheduled learning rates)
    tx = make_optimizer("adam", lambda step: 1e-3)
    state = TrainState(step=jnp.asarray(7, jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    save_checkpoint(str(tmp_path), state)

    pred = Predictor.from_checkpoint(
        "pointnet2_cls_ssg", str(tmp_path), num_point=128, buckets=(4,),
        dtype=None)
    pts = rng.rand(2, 128, 3).astype(np.float32)
    spec = MODEL_REGISTRY["pointnet2_cls_ssg"]
    direct, _ = spec.cls().apply(variables, jnp.asarray(pts), train=False)
    np.testing.assert_allclose(pred(pts), np.asarray(direct, np.float32),
                               atol=1e-5, rtol=1e-5)


def test_buckets_round_up_to_device_count():
    variables = _init_variables("pointnet2_cls_ssg")
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    pred = Predictor("pointnet2_cls_ssg", variables, dtype=None,
                     buckets=(1, 3, 8), num_devices=2)
    assert pred._buckets == (2, 4, 8)


def test_empty_batch(rng):
    variables = _init_variables("pointnet2_cls_ssg")
    pred = Predictor("pointnet2_cls_ssg", variables, dtype=None, buckets=(4,))
    out = pred(np.zeros((0, 128, 3), np.float32))
    assert out.shape == (0, 40) and out.dtype == np.float32


def test_predict_scene_full_coverage(rng):
    """Whole-scene serving: every point of an arbitrary-size scene gets a
    label; overlap points collect multiple block votes; non-sem_seg
    models refuse. Contract-level (random weights)."""
    variables = _init_variables("pointnet2_sem_seg", num_point=128)
    pred = Predictor("pointnet2_sem_seg", variables, dtype=None,
                     buckets=(2, 4))
    # a 3.2 x 1.1 m scene -> 3 x 1 blocks with 0.2 m overlap columns
    pts = rng.rand(5000, 3).astype(np.float32) * [3.2, 1.1, 2.5]
    out = pred.predict_scene(pts, npoints=128, seed=0)
    assert out["labels"].shape == (5000,)
    assert out["logits"].shape == (5000, 21)
    assert (out["votes"] >= 1).all(), "every point must be scored"
    assert (out["votes"] <= 4).all()
    # points in the overlap band between blocks 0 and 1 get >= 2 votes
    band = (pts[:, 0] > 1.35) & (pts[:, 0] < 1.65)
    assert (out["votes"][band] >= 2).all()
    # labels are the argmax of the summed logits
    np.testing.assert_array_equal(out["labels"],
                                  out["logits"].argmax(-1))
    # deterministic for a fixed seed
    out2 = pred.predict_scene(pts, npoints=128, seed=0)
    np.testing.assert_array_equal(out["labels"], out2["labels"])

    cls_vars = _init_variables("pointnet2_cls_ssg")
    cls_pred = Predictor("pointnet2_cls_ssg", cls_vars, dtype=None,
                         buckets=(2,))
    with pytest.raises(ValueError, match="sem_seg"):
        cls_pred.predict_scene(pts)


def test_predict_scene_empty_scene():
    """An empty scene returns empty results instead of crashing on
    pts.min() of a zero-size array."""
    variables = _init_variables("pointnet2_sem_seg", num_point=128)
    pred = Predictor("pointnet2_sem_seg", variables, dtype=None,
                     buckets=(2,))
    out = pred.predict_scene(np.zeros((0, 3), np.float32), npoints=128)
    assert out["labels"].shape == (0,)
    assert out["votes"].shape == (0,)


def test_predict_votes_on_device_matches_host_path(rng):
    """The one-dispatch device-side vote program (views built on device
    from uploaded permutations) must match the host-stacked protocol
    path given the same rng stream (same perms, same 2*pi*v/V angles)."""
    variables = _init_variables("pointnet2_cls_ssg")
    pred = Predictor("pointnet2_cls_ssg", variables, dtype=None,
                     buckets=(4,))
    pts = rng.rand(3, 128, 3).astype(np.float32)
    dev = pred.predict_votes(pts, num_votes=3, rng=0, on_device=True)
    host = pred.predict_votes(pts, num_votes=3, rng=0, on_device=False)
    assert dev.shape == host.shape == (3, 40)
    # identical protocol; only rotation round-off differs (numpy f32 on
    # host vs f32-HIGHEST MXU on device — last-ulp coordinate deltas
    # reach ~3e-4 on logits through the network on the real chip)
    np.testing.assert_allclose(dev, host, rtol=2e-3, atol=1e-3)
