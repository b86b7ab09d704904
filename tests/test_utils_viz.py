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
