"""Tests for the procedural ModelNet40 stand-in (data/procedural_modelnet.py).

The generator is the accuracy-parity proxy (no network egress -> no real
ModelNet40), so its contracts matter: exact modelnet40_ply_hdf5_2048
layout, frozen-seed determinism, unit-sphere normalization, and enough
class signal that a nearest-centroid-of-features baseline beats chance by
a wide margin.
"""

import numpy as np
import pytest

from pointnet2_tpu.data.procedural_modelnet import (
    CLASS_NAMES,
    generate,
    make_shape,
)


def test_class_list():
    assert len(CLASS_NAMES) == 40
    assert len(set(CLASS_NAMES)) == 40


def test_make_shape_contract():
    rng = np.random.default_rng(3)
    for ci in (0, 7, 19, 39):
        pts = make_shape(ci, rng, npoints=512)
        assert pts.shape == (512, 3)
        assert pts.dtype == np.float32
        r = np.linalg.norm(pts, axis=1)
        assert r.max() <= 1.0 + 1e-5
        assert r.max() > 0.98  # touches the unit sphere
        np.testing.assert_allclose(pts.mean(0), 0, atol=1e-5)


def test_frozen_seed_determinism():
    a = make_shape(5, np.random.default_rng(11), npoints=256)
    b = make_shape(5, np.random.default_rng(11), npoints=256)
    np.testing.assert_array_equal(a, b)
    c = make_shape(5, np.random.default_rng(12), npoints=256)
    assert not np.array_equal(a, c)  # instance variation


def test_generate_layout_and_loader(tmp_path):
    out = str(tmp_path / "mn40")
    generate(out, train_per_class=2, test_per_class=1, npoints=256, seed=0)
    import h5py
    import os

    for split, n in (("train", 80), ("test", 40)):
        with open(os.path.join(out, f"{split}_files.txt")) as f:
            files = [line.strip() for line in f if line.strip()]
        assert files
        total = 0
        for fn in files:
            with h5py.File(os.path.join(out, fn), "r") as h5:
                data, label = h5["data"][:], h5["label"][:]
                assert data.dtype == np.float32
                assert data.shape[1:] == (256, 3)
                assert label.dtype == np.uint8 and label.shape[1] == 1
                total += len(label)
        assert total == n

    from pointnet2_tpu.data import ModelNetH5Dataset

    ds = ModelNetH5Dataset(os.path.join(out, "train_files.txt"),
                           batch_size=16, npoints=128)
    assert len(ds) == 80
    batch = next(ds.epoch(augment=True))
    assert batch["points"].shape == (16, 128, 3)
    assert batch["label"].min() >= 0 and batch["label"].max() < 40
    # all 40 labels present across the split
    assert set(ds.label.tolist()) == set(range(40))


@pytest.mark.slow
def test_classes_geometrically_separable():
    """Cheap global-shape features separate the 40 classes far above
    chance (sanity that the proxy task carries signal; the full on-chip
    training run is the real evidence, docs/ACCURACY.md)."""
    rng = np.random.default_rng(0)
    feats, labels = [], []
    for ci in range(40):
        for _ in range(8):
            p = make_shape(ci, rng, npoints=512)
            ext = p.max(0) - p.min(0)
            r = np.linalg.norm(p, axis=1)
            feats.append(np.concatenate([
                ext, [r.mean(), r.std()], np.abs(p).mean(0),
                np.percentile(p[:, 1], [10, 50, 90])]))
            labels.append(ci)
    feats = np.asarray(feats)
    labels = np.asarray(labels)
    # leave-one-out nearest neighbor in feature space
    d = np.linalg.norm(feats[:, None] - feats[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    acc = float(np.mean(labels[d.argmin(1)] == labels))
    assert acc > 0.4, acc  # chance is 0.025


def test_normals_unit_everywhere():
    """with_normals=True appends unit normals for every class."""
    rng = np.random.default_rng(7)
    for ci in range(40):
        c = make_shape(ci, rng, 128, with_normals=True)
        assert c.shape == (128, 6)
        np.testing.assert_allclose(
            np.linalg.norm(c[:, 3:], axis=1), 1.0, atol=1e-5)


def test_generate_txt_layout_and_normal_loader(tmp_path):
    from pointnet2_tpu.data.procedural_modelnet import generate_txt

    out = str(tmp_path / "mn40txt")
    generate_txt(out, train_per_class=1, test_per_class=1, npoints=128,
                 seed=0)
    from pointnet2_tpu.data import ModelNetDataset

    ds = ModelNetDataset(out, batch_size=8, npoints=64, split="train",
                         normal_channel=True)
    batch = next(ds.epoch(augment=True))
    assert batch["points"].shape == (8, 64, 6)
    assert batch["label"].max() < 40
    # normals survive the loader's unit-sphere normalization as units
    n = batch["points"][:, :, 3:]
    # augmentation rotates normals; they stay approximately unit
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-2)
