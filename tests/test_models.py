"""Model forward-shape and train/eval-mode tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_tpu.models import (
    MODEL_REGISTRY,
    PointNet2ClsSSG,
    PointNet2PartSegMSGOneHot,
    classification_loss,
    get_model,
    segmentation_loss,
    weighted_segmentation_loss,
)

B, N = 2, 128


def _init_and_apply(model, *args, train=False):
    # jit both phases: eager flax dispatch pays per-op overhead (hundreds of
    # ops), and the persistent compilation cache amortizes across runs
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda r, *a: model.init(r, *a, train=train))(rngs, *args)
    out, mutated = jax.jit(
        lambda v, *a: model.apply(
            v, *a, train=train, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"] if train else []))(variables, *args)
    return variables, out


@pytest.mark.parametrize("name", ["pointnet_cls_basic", "pointnet2_cls_ssg",
                                  "pointnet2_cls_msg"])
def test_cls_models_forward_shapes(rng, name):
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    model = get_model(name)
    _, (logits, ep) = _init_and_apply(model, pc, train=True)
    assert logits.shape == (B, 40)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())
    loss = classification_loss(logits, jnp.zeros((B,), jnp.int32))
    assert loss.shape == () and bool(jnp.isfinite(loss))


def test_cls_ssg_with_normals(rng):
    pc = jnp.asarray(rng.rand(B, N, 6).astype(np.float32))
    model = PointNet2ClsSSG()
    _, (logits, _) = _init_and_apply(model, pc, train=False)
    assert logits.shape == (B, 40)


def test_part_seg_forward(rng):
    pc = jnp.asarray(rng.rand(B, N, 6).astype(np.float32))
    model = get_model("pointnet2_part_seg")
    _, (logits, ep) = _init_and_apply(model, pc, train=True)
    assert logits.shape == (B, N, 50)
    assert ep["feats"].shape == (B, N, 128)
    loss = segmentation_loss(logits, jnp.zeros((B, N), jnp.int32))
    assert bool(jnp.isfinite(loss))


def test_part_seg_msg_one_hot_forward(rng):
    pc = jnp.asarray(rng.rand(B, N, 6).astype(np.float32))
    cls_label = jnp.asarray(rng.randint(0, 16, (B,)).astype(np.int32))
    model = PointNet2PartSegMSGOneHot()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda r, p, c: model.init(r, p, c, train=False))(rngs, pc, cls_label)
    (logits, _), = [jax.jit(
        lambda v, p, c: model.apply(v, p, c, train=False))(
        variables, pc, cls_label)]
    assert logits[0].shape == (B, N, 50) if isinstance(logits, tuple) else True


def test_sem_seg_forward_and_weighted_loss(rng):
    # sem_seg SA1 expects >=1024 input points in the real config; use a tiny
    # custom instance to keep CPU tests fast
    from pointnet2_tpu.models.sem_seg import PointNet2SemSeg

    pc = jnp.asarray(rng.rand(B, 1024, 3).astype(np.float32))
    model = PointNet2SemSeg(num_classes=21)
    _, (logits, _) = _init_and_apply(model, pc, train=True)
    assert logits.shape == (B, 1024, 21)
    labels = jnp.zeros((B, 1024), jnp.int32)
    smpw = jnp.ones((B, 1024), jnp.float32)
    loss = weighted_segmentation_loss(logits, labels, smpw)
    assert bool(jnp.isfinite(loss))
    # zero weights on half the points changes the loss normalization
    smpw2 = smpw.at[:, ::2].set(0.0)
    loss2 = weighted_segmentation_loss(logits, labels, smpw2)
    assert bool(jnp.isfinite(loss2))


def test_registry_covers_all_reference_models():
    want = {"pointnet_cls_basic", "pointnet2_cls_ssg", "pointnet2_cls_msg",
            "pointnet2_part_seg", "pointnet2_part_seg_msg_one_hot",
            "pointnet2_sem_seg"}
    assert want == set(MODEL_REGISTRY)


def test_batch_stats_update_in_train_mode(rng):
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    model = get_model("pointnet2_cls_ssg")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, pc)
    (logits, _), mutated = jax.jit(lambda v, p: model.apply(
        v, p, train=True, bn_momentum=0.5,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"]))(variables, pc)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))
    assert changed, "train mode must update running BN statistics"


def test_dropout_is_stochastic_in_train_mode(rng):
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    model = get_model("pointnet2_cls_ssg")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, pc)
    train_fwd = jax.jit(lambda v, p, s: model.apply(
        v, p, train=True, rngs={"dropout": jax.random.PRNGKey(s)},
        mutable=["batch_stats"]))

    def fwd(seed):
        (logits, _), _ = train_fwd(variables, pc, seed)
        return np.asarray(logits)

    assert not np.allclose(fwd(1), fwd(2))
    # eval mode is deterministic
    eval_fwd = jax.jit(lambda v, p: model.apply(v, p, train=False))
    l1, _ = eval_fwd(variables, pc)
    l2, _ = eval_fwd(variables, pc)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_layer_zoo_extras(rng):
    import flax.linen as fnn
    from pointnet2_tpu.nn import extras

    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    conv = extras.Conv2D(features=8, kernel_size=(3, 3), bn=True)
    v = conv.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y, _ = conv.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 16, 16, 8)
    tconv = extras.Conv2DTranspose(features=4, kernel_size=(2, 2),
                                   strides=(2, 2))
    v = tconv.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = tconv.apply(v, x)
    assert y.shape == (2, 32, 32, 4)
    assert extras.max_pool2d(x, (2, 2)).shape == (2, 8, 8, 3)
    x3 = jnp.asarray(rng.rand(1, 8, 8, 8, 2).astype(np.float32))
    c3 = extras.Conv3D(features=4, kernel_size=(3, 3, 3))
    v = c3.init({"params": jax.random.PRNGKey(0)}, x3, train=False)
    assert c3.apply(v, x3).shape == (1, 8, 8, 8, 4)
    assert extras.avg_pool3d(x3, (2, 2, 2)).shape == (1, 4, 4, 4, 2)


def test_bf16_model_forward(rng):
    pc = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    model = PointNet2ClsSSG(dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, pc)
    (logits, _) = jax.jit(lambda v, p: model.apply(v, p, train=False))(
        variables, pc)
    assert logits.dtype == jnp.float32  # logits promoted for the loss
    assert bool(jnp.isfinite(logits).all())
    # params stay f32
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("use_points,use_xyz", [(False, True), (True, True),
                                                (True, False)])
def test_sa_fused_first_layer_matches_unfused(rng, use_points, use_xyz):
    """The lifted-dense SA layout (gather commutes with the first matmul)
    must match the reference layout up to float reassociation."""
    from pointnet2_tpu.nn.pointnet import SetAbstraction

    xyz = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    pts = (jnp.asarray(rng.rand(2, 128, 16).astype(np.float32))
           if use_points else None)
    fused = SetAbstraction(32, 0.3, 8, (16, 32), use_xyz=use_xyz,
                           fuse_first=True)
    plain = SetAbstraction(32, 0.3, 8, (16, 32), use_xyz=use_xyz,
                           fuse_first=False)
    v = fused.init(jax.random.PRNGKey(0), xyz, pts, train=False)
    _, got, gidx = fused.apply(v, xyz, pts, train=False)
    _, want, widx = plain.apply(v, xyz, pts, train=False)
    np.testing.assert_array_equal(np.asarray(gidx), np.asarray(widx))
    # on TPU the plain path's f32 denses run at default matmul precision
    # (bf16 passes) while lift_first runs HIGHEST — ~1e-2-class noise that
    # can also flip the max-pool argmax between near-tied slots, so the
    # atol must cover small absolute discrepancies on near-zero outputs
    tol = 2e-2 if jax.default_backend() == "tpu" else 1e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol * 0.3)


def test_sa_msg_fused_first_layer_matches_unfused(rng):
    from pointnet2_tpu.nn.pointnet import SetAbstractionMSG

    xyz = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 128, 16).astype(np.float32))
    fused = SetAbstractionMSG(32, (0.2, 0.4), (8, 16), ((16, 32), (16, 32)),
                              fuse_first=True)
    plain = SetAbstractionMSG(32, (0.2, 0.4), (8, 16), ((16, 32), (16, 32)),
                              fuse_first=False)
    v = fused.init(jax.random.PRNGKey(0), xyz, pts, train=False)
    _, got = fused.apply(v, xyz, pts, train=False)
    _, want = plain.apply(v, xyz, pts, train=False)
    # TPU default-precision matmuls add ~1e-2-class noise and can flip the
    # max-pool argmax between near-tied slots, so the atol must cover a
    # small absolute discrepancy on near-zero outputs as well
    tol = 2e-2 if jax.default_backend() == "tpu" else 1e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol * 0.3)


def _randomized_sa_variables(model, xyz, pts, seed=3):
    """init, then randomize every param and running stat so the golden
    comparison discriminates BN scale/bias/mean/var handling (fresh init
    stats are mean=0/var=1, which would make BN nearly a no-op)."""
    v = model.init(jax.random.PRNGKey(0), xyz, pts, train=False)
    flat, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(flat))
    flat = [jax.random.normal(k, leaf.shape, leaf.dtype) * 0.5
            for k, leaf in zip(keys, flat)]
    v = jax.tree_util.tree_unflatten(treedef, flat)
    # variances must be positive
    bs = jax.tree_util.tree_map(lambda x: jnp.abs(x) + 0.3, v["batch_stats"])
    return {"params": v["params"], "batch_stats": bs}


@pytest.mark.parametrize("pooling", ["max", "avg", "weighted_avg",
                                     "max_and_avg"])
@pytest.mark.parametrize("fuse", [True, False])
def test_sa_pooling_modes_match_numpy_golden(rng, pooling, fuse):
    """Every pooling mode of pointnet_sa_module (utils/pointnet_util.py:
    126-140) against an eval-mode numpy golden with randomized params."""
    from pointnet2_tpu.nn.pointnet import SetAbstraction
    from tests import golden

    xyz = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 96, 7).astype(np.float32))
    sa = SetAbstraction(24, 0.3, 8, (16, 32), pooling=pooling,
                        fuse_first=fuse)
    v = _randomized_sa_variables(sa, xyz, pts)
    with jax.default_matmul_precision("highest"):  # numpy-golden compare
        nxyz, out, _ = jax.jit(
            lambda v, x, p: sa.apply(v, x, p, train=False))(v, xyz, pts)
    want_xyz, want = golden.sa_module_np(
        jax.tree_util.tree_map(np.asarray, v), np.asarray(xyz),
        np.asarray(pts), 24, 0.3, 8, pooling=pooling)
    np.testing.assert_allclose(np.asarray(nxyz), want_xyz, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("fuse", [True, False])
def test_sa_knn_matches_numpy_golden(rng, fuse):
    """knn=True grouping (tf_grouping.py:48-73 selection-sort semantics)
    through the SA module, fused and unfused."""
    from pointnet2_tpu.nn.pointnet import SetAbstraction
    from tests import golden

    xyz = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 96, 7).astype(np.float32))
    sa = SetAbstraction(24, None, 8, (16, 32), knn=True, fuse_first=fuse)
    v = _randomized_sa_variables(sa, xyz, pts)
    with jax.default_matmul_precision("highest"):  # numpy-golden compare
        nxyz, out, idx = jax.jit(
            lambda v, x, p: sa.apply(v, x, p, train=False))(v, xyz, pts)
    want_xyz, want = golden.sa_module_np(
        jax.tree_util.tree_map(np.asarray, v), np.asarray(xyz),
        np.asarray(pts), 24, None, 8, knn=True)
    np.testing.assert_allclose(np.asarray(nxyz), want_xyz, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("group_all", [False, True])
def test_sa_mlp2_matches_numpy_golden(rng, group_all):
    """The optional post-pooling mlp2 stack (utils/pointnet_util.py:143-151)."""
    from pointnet2_tpu.nn.pointnet import SetAbstraction
    from tests import golden

    xyz = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 96, 7).astype(np.float32))
    sa = SetAbstraction(None if group_all else 24, 0.3,
                        None if group_all else 8, (16, 32), mlp2=(24, 12),
                        group_all=group_all)
    v = _randomized_sa_variables(sa, xyz, pts)
    with jax.default_matmul_precision("highest"):  # numpy-golden compare
        _, out, _ = jax.jit(
            lambda v, x, p: sa.apply(v, x, p, train=False))(v, xyz, pts)
    _, want = golden.sa_module_np(
        jax.tree_util.tree_map(np.asarray, v), np.asarray(xyz),
        np.asarray(pts), 24, 0.3, 8, group_all=group_all, has_mlp2=True)
    assert out.shape == want.shape == (2, 1 if group_all else 24, 12)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("pooling", ["avg", "weighted_avg", "max_and_avg"])
def test_sa_pooling_modes_train_step(rng, pooling):
    """Non-default pooling modes must also be trainable (finite grads)."""
    from pointnet2_tpu.nn.pointnet import SetAbstraction

    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 64, 4).astype(np.float32))
    sa = SetAbstraction(16, 0.3, 8, (8, 16), pooling=pooling)
    v = sa.init(jax.random.PRNGKey(0), xyz, pts, train=True)

    def loss_fn(params):
        (_, out, _), _ = sa.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, xyz, pts,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.jit(jax.grad(loss_fn))(v["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.parametrize("use_skip", [True, False])
def test_fp_fused_first_layer_matches_unfused(rng, use_skip):
    """The lifted-dense FP layout (dense commutes with the affine
    interpolation because the 3 weights sum to 1) must match the reference
    layout up to float reassociation."""
    from pointnet2_tpu.nn.pointnet import FeaturePropagation

    xyz1 = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
    p1 = (jnp.asarray(rng.rand(2, 128, 9).astype(np.float32))
          if use_skip else None)
    p2 = jnp.asarray(rng.rand(2, 32, 16).astype(np.float32))
    fused = FeaturePropagation((16, 8), fuse_first=True)
    plain = FeaturePropagation((16, 8), fuse_first=False)
    v = fused.init(jax.random.PRNGKey(0), xyz1, xyz2, p1, p2, train=False)
    # HIGHEST matmul precision: at the TPU default the MXU truncates f32
    # operands to bf16, and the two layouts reassociate differently
    with jax.default_matmul_precision("highest"):
        got = fused.apply(v, xyz1, xyz2, p1, p2, train=False)
        want = plain.apply(v, xyz1, xyz2, p1, p2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=3e-4)
    # gradients flow through both layouts identically (scatter-add vjp)
    def loss(v, fp):
        out, _ = fp.apply(v, xyz1, xyz2, p1, p2, train=True,
                          mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(lambda v: loss(v, fused))(
            {"params": v["params"], "batch_stats": v["batch_stats"]})
        g2 = jax.grad(lambda v: loss(v, plain))(
            {"params": v["params"], "batch_stats": v["batch_stats"]})
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_fp_fused_few_known_points(rng):
    """M < 3 known points: missing 3-NN slots carry zero weight; the
    weights still sum to 1 so the lifted bias stays exact."""
    from pointnet2_tpu.nn.pointnet import FeaturePropagation

    xyz1 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(2, 2, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(2, 2, 8).astype(np.float32))
    fused = FeaturePropagation((8,), fuse_first=True)
    plain = FeaturePropagation((8,), fuse_first=False)
    v = fused.init(jax.random.PRNGKey(0), xyz1, xyz2, None, p2, train=False)
    with jax.default_matmul_precision("highest"):
        got = fused.apply(v, xyz1, xyz2, None, p2, train=False)
        want = plain.apply(v, xyz1, xyz2, None, p2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
