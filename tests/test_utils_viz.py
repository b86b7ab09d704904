"""Tests for pc_util conversions, the native renderer, and profiling."""

import numpy as np

from pointnet2_tpu.utils import pc_util


def test_point_cloud_volume_roundtrip(rng):
    pts = rng.uniform(-0.9, 0.9, (100, 3)).astype(np.float32)
    vol = pc_util.point_cloud_to_volume(pts, vsize=8, radius=1.0)
    assert vol.shape == (8, 8, 8)
    back = pc_util.volume_to_point_cloud(vol)
    assert back.shape[1] == 3
    assert len(back) == int(vol.sum())


def test_point_cloud_to_volume_v2_shapes(rng):
    pts = rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32)
    vol = pc_util.point_cloud_to_volume_v2(pts, vsize=4, num_sample=16)
    assert vol.shape == (4, 4, 4, 16, 3)


def test_point_cloud_to_image_shapes(rng):
    pts = rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32)
    img = pc_util.point_cloud_to_image(pts, imgsize=4, num_sample=8)
    assert img.shape == (4, 4, 8, 3)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.rand(50, 3).astype(np.float32)
    path = str(tmp_path / "t.ply")
    pc_util.write_ply(pts, path)
    back = pc_util.read_ply(path)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_write_ply_color(tmp_path, rng):
    pts = rng.rand(20, 3).astype(np.float32)
    labels = rng.randint(0, 4, 20)
    path = str(tmp_path / "c.ply")
    pc_util.write_ply_color(pts, labels, path)
    assert "red" in open(path).read()


def test_three_views_renderer(rng):
    pts = rng.randn(200, 3).astype(np.float32)
    img = pc_util.point_cloud_three_views(pts)
    assert img.shape == (500, 1500)
    assert img.max() <= 1.0 and img.min() >= 0.0
    assert img.max() > 0


def test_native_ball_renderer(rng):
    from pointnet2_tpu.viz import render

    pts = rng.randn(300, 3).astype(np.float32)
    img = render(pts, canvas=128, ballradius=3)
    assert img.shape == (128, 128, 3)
    assert (img.sum(-1) > 0).any()


def test_renderer_numpy_fallback_matches_shape(rng):
    from pointnet2_tpu.viz import viewer

    pts = rng.randn(50, 3).astype(np.float32)
    proj = pts.copy()
    proj[:, :2] = proj[:, :2] * 20 + 64
    img = viewer._render_numpy(128, 128, proj,
                               np.full((50, 3), 200, np.uint8),
                               np.full(50, 3.0, np.float32))
    assert img.shape == (128, 128, 3)
    assert (img.sum(-1) > 0).any()


def test_step_timer():
    from pointnet2_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        t.tick()
    assert t.steps_per_sec() > 0


def test_write_ply_rgb_and_read_xyz(tmp_path, rng):
    from pointnet2_tpu.utils.pc_util import (read_ply_xyz, write_ply,
                                             write_ply_rgb)

    pts = rng.rand(20, 3).astype(np.float32)
    colors = (rng.rand(20, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "rgb.ply")
    write_ply_rgb(pts, colors, path)
    txt = open(path).read()
    assert "property uchar red" in txt and txt.count("\n") >= 20

    path2 = str(tmp_path / "xyz.ply")
    write_ply(pts, path2)
    back = read_ply_xyz(path2)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_scannet_preprocessing_demo_and_labels(tmp_path, rng):
    import json

    from pointnet2_tpu.data.scannet_preprocessing import (
        collect_label_names, export_demo_scene)

    # fake one preprocessed scene: (N, 8) [xyz rgb instance semantic]
    n = 30
    data = np.concatenate([
        rng.rand(n, 3), rng.rand(n, 3) * 255,
        rng.randint(0, 4, (n, 1)), rng.randint(0, 21, (n, 1))], axis=1)
    npy = str(tmp_path / "scene0000_00.npy")
    np.save(npy, data)
    out = str(tmp_path / "demo")
    export_demo_scene(npy, out)
    import os
    assert sorted(os.listdir(out)) == [
        "scene.ply", "scene_instance.ply", "scene_semantic.ply"]

    # fake aggregation jsons for the label-name sweep
    scenes = []
    for i, labels in enumerate([["chair", "table"], ["table", "sofa"]]):
        name = f"scene{i:04d}_00"
        d = tmp_path / name
        d.mkdir()
        (d / f"{name}.aggregation.json").write_text(json.dumps(
            {"segGroups": [{"label": lb} for lb in labels]}))
        scenes.append(name)
    assert collect_label_names(str(tmp_path), scenes) == [
        "chair", "sofa", "table"]


def test_compiled_cost_matmul():
    """compiled_cost reports XLA's flop count for a known-FLOPs matmul."""
    import jax
    import jax.numpy as jnp

    from pointnet2_tpu.utils.profiling import compiled_cost

    n = 128
    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((n, n), jnp.float32)
    cost = compiled_cost(f, x, x)
    if cost is None:  # backend without cost analysis: helper must degrade
        return
    assert cost["flops"] >= 2 * n * n * n * 0.5  # allow backend accounting
    assert cost["bytes_accessed"] > 0
