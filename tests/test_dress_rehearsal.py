"""Real-data dress rehearsal: ingest -> train -> evaluate, zero code changes.

Parity day (BASELINE.md: real ModelNet40 / ShapeNetPart / ScanNet) must be
one command per task. Each test here builds a MINIATURE dataset in the real
dataset's exact on-disk layout (zip, as downloaded), runs the actual
`data.ingest` CLI to validate+install it, then the actual `cli.train` and
`cli.evaluate` CLIs against the installed root — the byte-level path the
real data will take (reference layouts: modelnet_h5_dataset.py:21-33,
part_dataset_all_normal.py:19-43, scannet_dataset.py:13-16).

Slow-marked; the fast suite covers the pieces individually
(tests/test_ingest.py, tests/test_cli_journey.py).
"""

import json
import os
import shutil

import pytest

from pointnet2_tpu.cli import evaluate as cli_evaluate
from pointnet2_tpu.cli import train as cli_train
from pointnet2_tpu.data import ingest


def _zip_of(src_dir: str, tmp_path, name: str) -> str:
    return shutil.make_archive(str(tmp_path / name), "zip",
                               root_dir=os.path.dirname(src_dir),
                               base_dir=os.path.basename(src_dir))


def _assert_metrics(path: str, *keys):
    rec = json.loads(open(path).read())
    m = rec["metrics"]
    for k in keys:
        node = m
        for part in k.split("."):
            assert part in node, f"{k} missing from {path}: {m.keys()}"
            node = node[part]
    return m


@pytest.mark.slow
def test_dress_rehearsal_modelnet40_h5(tmp_path):
    from pointnet2_tpu.data.procedural_modelnet import generate

    raw = str(tmp_path / "modelnet40_ply_hdf5_2048")
    generate(raw, train_per_class=2, test_per_class=1, npoints=256, seed=0)
    zip_path = _zip_of(raw, tmp_path, "modelnet40_h5_download")
    shutil.rmtree(raw)

    dest = str(tmp_path / "data" / "modelnet40_ply_hdf5_2048")
    ingest.main(["--dataset", "modelnet40_h5", "--src", zip_path,
                 "--dest", dest])

    log_dir = str(tmp_path / "log_cls")
    cli_train.main([
        "--model", "pointnet2_cls_ssg", "--data", dest,
        "--num_point", "128", "--batch_size", "8", "--max_epoch", "1",
        "--log_dir", log_dir])
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))

    out = str(tmp_path / "cls_eval.json")
    cli_evaluate.main([
        "--model", "pointnet2_cls_ssg", "--data", dest,
        "--num_point", "128", "--batch_size", "8", "--num_votes", "2",
        "--log_dir", log_dir, "--out", out])
    _assert_metrics(out, "accuracy", "avg_class_accuracy")


@pytest.mark.slow
def test_dress_rehearsal_shapenet_part(tmp_path):
    from pointnet2_tpu.data.procedural_shapenet_part import generate

    raw = str(tmp_path /
              "shapenetcore_partanno_segmentation_benchmark_v0_normal")
    generate(raw, train_per_class=2, val_per_class=1, test_per_class=1,
             npoints=384, seed=0)
    zip_path = _zip_of(raw, tmp_path, "shapenet_part_download")
    shutil.rmtree(raw)

    dest = str(tmp_path / "data" / "snp_v0_normal")
    ingest.main(["--dataset", "shapenet_part", "--src", zip_path,
                 "--dest", dest])

    log_dir = str(tmp_path / "log_part")
    cli_train.main([
        "--model", "pointnet2_part_seg_msg_one_hot", "--data", dest,
        "--num_point", "128", "--batch_size", "8", "--max_epoch", "1",
        "--log_dir", log_dir])
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))

    out = str(tmp_path / "part_eval.json")
    cli_evaluate.main([
        "--model", "pointnet2_part_seg_msg_one_hot", "--data", dest,
        "--num_point", "128", "--batch_size", "8", "--num_votes", "2",
        "--log_dir", log_dir, "--out", out])
    _assert_metrics(out, "accuracy", "instance_miou", "category_miou")


@pytest.mark.slow
def test_dress_rehearsal_scannet(tmp_path):
    from pointnet2_tpu.data.procedural_scannet import generate

    raw = str(tmp_path / "scannet_data_pointnet2")
    generate(raw, train=4, test=2, seed=0, min_points=6000,
             max_points=9000)
    zip_path = _zip_of(raw, tmp_path, "scannet_download")
    shutil.rmtree(raw)

    dest = str(tmp_path / "data" / "scannet_pickles")
    ingest.main(["--dataset", "scannet", "--src", zip_path,
                 "--dest", dest])

    log_dir = str(tmp_path / "log_sem")
    cli_train.main([
        "--model", "pointnet2_sem_seg", "--data", dest,
        "--num_point", "512", "--batch_size", "8", "--max_epoch", "1",
        "--log_dir", log_dir])
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))

    out = str(tmp_path / "sem_eval.json")
    cli_evaluate.main([
        "--model", "pointnet2_sem_seg", "--data", dest,
        "--num_point", "512", "--batch_size", "8",
        "--log_dir", log_dir, "--out", out])
    _assert_metrics(out, "chopped.point_accuracy",
                    "whole_scene.calibrated_accuracy_vox")
