"""Evaluation-protocol tests against hand-checkable oracles."""

import numpy as np
import pytest

from pointnet2_tpu.data import (
    ScannetDataset,
    ScannetDatasetWholeScene,
    SyntheticClassification,
    SyntheticShapeNetPart,
    make_synthetic_scenes,
)
from pointnet2_tpu.data.shapenet_part import (CATEGORY_ORDER, NUM_PARTS,
                                               SEG_CLASSES)
from pointnet2_tpu.evaluation import (
    PartSegMetrics,
    evaluate_cls_voting,
    evaluate_scannet_whole_scene,
)
from pointnet2_tpu.evaluation.cls_vote import evaluate_cls_voting
from pointnet2_tpu.evaluation.part_miou import (
    constrained_part_prediction,
    evaluate_part_seg_voting,
)
from pointnet2_tpu.evaluation.scannet_eval import (
    ScanNetMetrics,
    evaluate_scannet_chopped,
)


# ---------------------------------------------------------------- cls voting

def test_cls_voting_perfect_oracle():
    ds = SyntheticClassification(num_classes=4, samples_per_class=4,
                                 npoints=32, batch_size=8)
    labels_by_cloud = {}
    for b in ds.epoch(augment=False):
        pass

    # oracle: classify by matching the cloud against the dataset (rotation
    # applied by the protocol must not break it -> key on point count sum is
    # not rotation invariant; use pairwise-distance histogram instead)
    def eval_fn(points):
        logits = np.zeros((points.shape[0], 4))
        for i, pc in enumerate(points):
            d = np.linalg.norm(pc[:, None, :3] - pc[None, :, :3], axis=-1)
            sig = d.sum()  # rotation & permutation invariant
            best, bestc = None, 0
            for j in range(len(ds)):
                ref = ds.data[j]
                dr = np.linalg.norm(ref[:, None, :3] - ref[None, :, :3],
                                    axis=-1).sum()
                if best is None or abs(dr - sig) < best:
                    best, bestc = abs(dr - sig), ds.label[j]
            logits[i, bestc] = 1.0
        return logits

    res = evaluate_cls_voting(eval_fn, ds, num_votes=2, num_classes=4,
                              rng=0, log_fn=lambda s: None)
    assert res["accuracy"] == pytest.approx(1.0)
    assert res["avg_class_accuracy"] == pytest.approx(1.0)


def test_cls_voting_votes_rotate_and_sum():
    """Vote protocol must score num_votes distinct rotated views per batch
    — stacked along the batch axis into ONE model call per eval batch
    (the r4 per-vote dispatch loop paid a ~13x transport penalty)."""
    ds = SyntheticClassification(num_classes=2, samples_per_class=4,
                                 npoints=16, batch_size=8)
    calls = []

    def eval_fn(points):
        calls.append(points.copy())
        return np.zeros((points.shape[0], 2))

    evaluate_cls_voting(eval_fn, ds, num_votes=3, num_classes=2, rng=0,
                        log_fn=lambda s: None)
    # one dispatch per batch, votes stacked along batch
    assert len(calls) == ds.num_batches()
    assert calls[0].shape == (3 * 8, 16, 3)
    # vote 0 is rotation by angle 0 but point-shuffled; votes differ
    v0, v1 = calls[0][:8], calls[0][8:16]
    assert not np.allclose(v0, v1)


def test_cls_voting_batched_matches_sequential_loop():
    """The batch-stacked vote must equal the reference's per-vote loop
    (evaluate.py:126-141) given the same rng stream."""
    from pointnet2_tpu.data import augment as A
    from pointnet2_tpu.evaluation.cls_vote import vote_logits

    gen = np.random.default_rng(7)
    pts = gen.standard_normal((5, 24, 3)).astype(np.float32)
    W = gen.standard_normal((24 * 3, 4)).astype(np.float32)

    def eval_fn(points):  # deterministic per-row "model"
        return np.tanh(points.reshape(points.shape[0], -1) @ W)

    got = vote_logits(eval_fn, pts, num_votes=4, rng=3)

    # reference-style sequential loop, same rng consumption order
    rng = np.random.default_rng(3)
    want = None
    for v in range(4):
        perm = rng.permutation(24)
        rot = A.rotate_point_cloud_by_angle(pts[:, perm, :],
                                            v / 4.0 * np.pi * 2)
        lg = np.asarray(eval_fn(rot), np.float64)
        want = lg if want is None else want + lg
    np.testing.assert_allclose(got, want, rtol=1e-12)


# ---------------------------------------------------------------- part mIoU

def test_constrained_argmax_restricts_to_category_parts():
    # shape of category Airplane (parts 0-3): logits favor label 30
    # (Motorbike) everywhere, but prediction must stay in 0..3
    seg = np.zeros((1, 8), np.int32)  # label 0 => Airplane
    logits = np.full((1, 8, NUM_PARTS), -10.0)
    logits[:, :, 30] = 10.0
    logits[:, :, 2] = 1.0
    pred = constrained_part_prediction(logits, seg)
    assert set(pred.ravel()) == {2}


def test_part_iou_absent_part_rule():
    # Laptop has parts [28, 29]; ground truth + prediction all 28 =>
    # part 29 absent & unpredicted => IoU 1.0 for it; mean IoU = 1.0
    seg = np.full((1, 16), 28, np.int32)
    logits = np.full((1, 16, NUM_PARTS), -10.0)
    logits[:, :, 28] = 10.0
    m = PartSegMetrics()
    m.update(logits, seg)
    res = m.result(log_fn=lambda s: None)
    assert res["instance_miou"] == pytest.approx(1.0)
    assert res["category_miou"]["Laptop"] == pytest.approx(1.0)


def test_part_iou_half_wrong():
    # Laptop: half points predicted 29 instead of 28
    seg = np.full((1, 16), 28, np.int32)
    logits = np.full((1, 16, NUM_PARTS), -10.0)
    logits[0, :8, 28] = 10.0
    logits[0, 8:, 29] = 10.0
    m = PartSegMetrics()
    m.update(logits, seg)
    res = m.result(log_fn=lambda s: None)
    # IoU(28) = 8/16 = 0.5; IoU(29) = 0/8 = 0; mean = 0.25
    assert res["instance_miou"] == pytest.approx(0.25)


def test_part_seg_voting_perfect_oracle():
    ds = SyntheticShapeNetPart(num_samples=8, npoints=64, batch_size=4)
    cats = CATEGORY_ORDER

    def eval_fn(batch):
        # a true model's logits follow the (permuted) input geometry, so
        # recompute labels from coordinates, not from batch["seg"]
        pts, cls = batch["points"], batch["cls_label"]
        seg = np.zeros(pts.shape[:2], np.int32)
        for i in range(pts.shape[0]):
            labels = SEG_CLASSES[cats[int(cls[i])]]
            ang = np.arctan2(pts[i, :, 1], pts[i, :, 0]) + np.pi
            part = np.minimum((ang / (2 * np.pi) * len(labels)).astype(int),
                              len(labels) - 1)
            seg[i] = np.asarray(labels, np.int32)[part]
        logits = np.full(seg.shape + (NUM_PARTS,), -10.0, np.float32)
        np.put_along_axis(logits, seg[..., None], 10.0, axis=-1)
        return logits

    res = evaluate_part_seg_voting(eval_fn, ds, num_votes=2, rng=0,
                                   log_fn=lambda s: None)
    assert res["instance_miou"] == pytest.approx(1.0)
    assert res["accuracy"] == pytest.approx(1.0)


# ---------------------------------------------------------------- scannet

def test_scannet_dataset_crop_shapes():
    scenes = make_synthetic_scenes(num_scenes=2, points_per_scene=5000)
    ds = ScannetDataset(scenes=scenes, npoints=512, split="train",
                        batch_size=4)
    batch = next(iter(ds.epoch()))
    assert batch["points"].shape == (4, 512, 3)
    assert batch["seg"].shape == (4, 512)
    assert batch["smpw"].shape == (4, 512)
    assert (batch["smpw"] >= 0).all()
    # class-balancing weights: rarer classes get larger weights
    assert ds.labelweights.shape == (21,)


def test_scannet_whole_scene_tiling():
    scenes = make_synthetic_scenes(num_scenes=1, points_per_scene=8000,
                                   extent=4.5)
    ds = ScannetDatasetWholeScene(scenes=scenes, npoints=256, split="test")
    ps, seg, w = ds.get_item(0)
    assert ps.ndim == 3 and ps.shape[1:] == (256, 3)
    assert ps.shape[0] >= 4  # 4.5m extent -> 3x3 grid of 1.5m blocks
    # every block's masked points lie inside its 1.5m column
    blocks = list(ds.blocks())
    assert len(blocks) == ps.shape[0]


def test_scannet_metrics_perfect_prediction():
    scenes = make_synthetic_scenes(num_scenes=1, points_per_scene=4000)
    ds = ScannetDatasetWholeScene(scenes=scenes, npoints=128, split="test")

    def eval_fn(batch):
        seg = batch["seg"]
        logits = np.full(seg.shape + (21,), -10.0, np.float32)
        np.put_along_axis(logits, seg[..., None], 10.0, axis=-1)
        return logits

    res = evaluate_scannet_whole_scene(eval_fn, ds, batch_size=4,
                                       log_fn=lambda s: None)
    assert res["point_accuracy"] == pytest.approx(1.0)
    assert res["point_accuracy_vox"] == pytest.approx(1.0)
    assert res["calibrated_accuracy_vox"] == pytest.approx(1.0)


def test_scannet_chopped_eval_runs():
    scenes = make_synthetic_scenes(num_scenes=2, points_per_scene=4000)
    ds = ScannetDataset(scenes=scenes, npoints=256, split="test",
                        batch_size=4)

    def eval_fn(batch):
        seg = batch["seg"]
        logits = np.full(seg.shape + (21,), -10.0, np.float32)
        np.put_along_axis(logits, seg[..., None], 10.0, axis=-1)
        return logits

    res = evaluate_scannet_chopped(eval_fn, ds, rng=0, log_fn=lambda s: None)
    assert res["point_accuracy"] == pytest.approx(1.0)


def test_virtual_scan_visibility():
    from pointnet2_tpu.utils.scene_util import virtual_scan

    gen = np.random.default_rng(0)
    xyz = gen.uniform(0, 4, (5000, 3)).astype(np.float32)
    xyz[:, 2] *= 0.75  # room height 3m
    idx = virtual_scan(xyz, mode=2)
    assert idx.ndim == 1
    # a dense room MUST be visible (this caught a searchsorted-on-
    # descending-azimuth bug that returned 0 points for every mode)
    assert len(idx) > 100
    assert idx.max() < len(xyz)
    assert len(np.unique(idx)) == len(idx)


def test_voxel_label_fast_groups_by_voxel():
    from pointnet2_tpu.utils.pc_util import (
        point_cloud_label_to_surface_voxel_label_fast,
    )

    # ceil-binning is min-anchored, so co-located points share a voxel
    pts = np.array([[0.001, 0, 0], [0.001, 0, 0], [1.0, 1, 1]])
    labels = np.array([3, 4, 5])
    uvidx, uvlabel, nvox = point_cloud_label_to_surface_voxel_label_fast(
        pts, labels, res=0.05)
    assert len(uvidx) == 2  # first two points share a voxel
    assert uvlabel[0] == 3  # first-point label wins
    assert uvlabel[1] == 5


# ---------------------------------------------------------------- lockstep


def test_lockstep_zero_local_batches_feeds_metadata_zero_batches():
    """A host whose shard holds ZERO batches (legal at many hosts / small
    splits) must still feed `num_global` zero batches built from dataset
    shape metadata — there is no local batch to template from."""
    from pointnet2_tpu.evaluation.lockstep import lockstep_batches

    ds = SyntheticClassification(num_classes=5, samples_per_class=1,
                                 npoints=32, batch_size=4, seed=0)
    ds.data, ds.label = ds.data[:0], ds.label[:0]  # empty host shard
    assert ds.num_batches() == 0

    class FakeMultihost:
        @staticmethod
        def sync_num_batches(n, reduce="max"):
            return 3  # another host owns 3 batches

    batches = list(lockstep_batches(ds, FakeMultihost))
    assert len(batches) == 3
    for b in batches:
        assert b["nvalid"] == 0
        assert b["points"].shape == (4, 32, 3)
        assert b["points"].dtype == np.float32
        assert b["label"].shape == (4,) and b["label"].dtype == np.int32
        assert not b["points"].any()
    # fresh arrays each yield: consumers may write into a batch
    batches[0]["points"][:] = 1.0
    assert not batches[1]["points"].any()


@pytest.mark.parametrize("maker", [
    lambda: SyntheticClassification(num_classes=3, samples_per_class=2,
                                    npoints=16, batch_size=4, seed=0),
    lambda: SyntheticShapeNetPart(num_samples=4, npoints=32, batch_size=4,
                                  seed=0),
    lambda: ScannetDataset(scenes=make_synthetic_scenes(2, 4000),
                           npoints=128, split="test", batch_size=2, seed=0),
])
def test_zero_batch_matches_epoch_structure(maker):
    """zero_batch() must agree with real batches on keys/shapes/dtypes so
    the lockstep padding batches are drop-in for the jitted eval step."""
    ds = maker()
    real = next(iter(ds.epoch(augment=False)))
    zero = ds.zero_batch()
    assert set(zero) == set(real)
    for k in real:
        if k == "nvalid":
            assert zero[k] == 0
            continue
        assert np.asarray(zero[k]).shape == np.asarray(real[k]).shape, k
        assert np.asarray(zero[k]).dtype == np.asarray(real[k]).dtype, k


def test_part_voting_batched_matches_sequential_loop():
    """Batch-stacked part-seg votes (one dispatch per batch) must equal the
    per-vote loop (part_seg/evaluate.py:138-144) given the same rng."""
    ds = SyntheticShapeNetPart(num_samples=4, npoints=32, batch_size=4,
                               seed=1)
    gen = np.random.default_rng(11)
    W = gen.standard_normal((6, NUM_PARTS)).astype(np.float32)

    def eval_fn(batch):  # per-point deterministic "model"
        return np.tanh(batch["points"] @ W)

    got = evaluate_part_seg_voting(eval_fn, ds, num_votes=3, rng=5,
                                   log_fn=lambda s: None)

    # sequential reference with the same rng stream, same metric machinery
    rng = np.random.default_rng(5)
    metrics = PartSegMetrics()
    for batch in ds.epoch(augment=False):
        pts, seg, nvalid = batch["points"], batch["seg"], batch["nvalid"]
        N = pts.shape[1]
        pred_sum = np.zeros((pts.shape[0], N, NUM_PARTS), np.float64)
        for _ in range(3):
            perm = rng.permutation(N)
            lg = np.asarray(eval_fn(dict(batch, points=pts[:, perm])),
                            np.float64)
            pred_sum[:, perm, :] += lg
        metrics.update(pred_sum[:nvalid], seg[:nvalid])
    want = metrics.result(log_fn=lambda s: None)
    assert got["accuracy"] == pytest.approx(want["accuracy"], abs=1e-12)
    assert got["instance_miou"] == pytest.approx(want["instance_miou"],
                                                 abs=1e-12)
