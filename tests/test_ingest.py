"""data.ingest: validate/install the real-dataset layouts.

The procedural generators emit the exact real on-disk formats, so they
double as fixtures: a generated tree must validate, a broken one must be
rejected with a actionable message, and installation must land at the
canonical destination the ACCURACY.md command lines use.
"""

import os

import numpy as np
import pytest

from pointnet2_tpu.data import ingest as ing


@pytest.fixture(scope="module")
def h5_root(tmp_path_factory):
    from pointnet2_tpu.data.procedural_modelnet import generate

    d = tmp_path_factory.mktemp("h5")
    generate(str(d), train_per_class=2, test_per_class=1, npoints=64,
             seed=0)
    return str(d)


@pytest.fixture(scope="module")
def part_root(tmp_path_factory):
    from pointnet2_tpu.data.procedural_shapenet_part import generate

    d = tmp_path_factory.mktemp("part")
    generate(str(d), train_per_class=1, val_per_class=1, test_per_class=1,
             npoints=96, seed=0)
    return str(d)


def test_validate_modelnet40_h5(h5_root):
    stats = ing.validate_modelnet40_h5(h5_root, log=lambda m: None)
    assert stats == {"train": 80, "test": 40}


def test_validate_shapenet_part(part_root):
    stats = ing.validate_shapenet_part(part_root, log=lambda m: None)
    assert stats == {"train": 16, "val": 16, "test": 16}


def test_validate_modelnet40_normal(tmp_path):
    from pointnet2_tpu.data.procedural_modelnet import generate_txt

    generate_txt(str(tmp_path), train_per_class=1, test_per_class=1,
                 npoints=64, seed=0)
    stats = ing.validate_modelnet40_normal(str(tmp_path),
                                           log=lambda m: None)
    assert stats == {"train": 40, "test": 40}


def test_validate_scannet(tmp_path):
    import pickle

    from pointnet2_tpu.data.scannet import make_synthetic_scenes

    for split in ("train", "test"):
        scenes = make_synthetic_scenes(2, points_per_scene=500, seed=1)
        with open(tmp_path / f"scannet_{split}.pickle", "wb") as fp:
            pickle.dump([p for p, _ in scenes], fp)
            pickle.dump([l for _, l in scenes], fp)
    stats = ing.validate_scannet(str(tmp_path), log=lambda m: None)
    assert stats == {"train": 2, "test": 2}


def test_invalid_layout_rejected(tmp_path):
    (tmp_path / "train_files.txt").write_text("ply_data_train0.h5\n")
    with pytest.raises(ing.IngestError, match="listed file missing"):
        ing.validate_modelnet40_h5(str(tmp_path), log=lambda m: None)
    with pytest.raises(ing.IngestError, match="synsetoffset2category"):
        ing.validate_shapenet_part(str(tmp_path), log=lambda m: None)


def test_ingest_installs_and_loader_reads(h5_root, tmp_path):
    dest = tmp_path / "installed" / "modelnet40_ply_hdf5_2048"
    out = ing.ingest("modelnet40_h5", h5_root, dest=str(dest),
                     log=lambda m: None)
    assert out == str(dest)
    from pointnet2_tpu.data import ModelNetH5Dataset

    ds = ModelNetH5Dataset(os.path.join(out, "train_files.txt"),
                           batch_size=8, npoints=32)
    batch = next(iter(ds.epoch()))
    assert batch["points"].shape == (8, 32, 3)
    # refuses to clobber an existing install
    with pytest.raises(ing.IngestError, match="destination exists"):
        ing.ingest("modelnet40_h5", h5_root, dest=str(dest),
                   log=lambda m: None)


def test_ingest_zip_source(h5_root, tmp_path):
    import shutil

    zp = shutil.make_archive(str(tmp_path / "mn40"), "zip",
                             root_dir=os.path.dirname(h5_root),
                             base_dir=os.path.basename(h5_root))
    msgs = []
    root = ing.ingest("modelnet40_h5", zp, check_only=True,
                      log=msgs.append)
    assert root == zp
    assert any("ok (check only)" in m for m in msgs)
    assert any("train: 80 clouds" in m or "80 clouds" in m for m in msgs)


def test_ingest_link(h5_root, tmp_path):
    dest = tmp_path / "ln"
    out = ing.ingest("modelnet40_h5", h5_root, dest=str(dest), link=True,
                     log=lambda m: None)
    assert os.path.islink(out)
