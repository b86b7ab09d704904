"""ScanNet semantic-segmentation pipelines.

Host-side re-implementations of the reference's three samplers
(scannet/scannet_dataset.py):
- :class:`ScannetDataset` — training sampler: pick a random center, crop a
  1.5 x 1.5 x full-height column, retry up to 10x until >=70% of points are
  annotated and >=2% of voxels occupied, resample to npoints, weight by
  class-balancing weights masked to the inner crop (:27-61).
- :class:`ScannetDatasetWholeScene` — eval tiler: 1.5 m x/y blocks, one
  npoints sample per non-empty block -> variable #blocks per scene (:64-120).
- :class:`ScannetDatasetVirtualScan` — 8 virtual camera scans by spherical
  ray-casting visibility (:122-167 + scene_util.py).

Class-balancing weights are 1/log(1.2 + freq) over the train label
histogram (:17-24). Scenes come either from the reference pickle format
(scannet_{split}.pickle: two pickled lists) or from an in-memory list of
(points, labels) for synthetic use.
"""

from __future__ import annotations

import os
import pickle
from collections.abc import Iterator

import numpy as np

from pointnet2_tpu.data.modelnet import _pad_batch

NUM_CLASSES = 21


def compute_label_weights(labels_list) -> np.ndarray:
    """1/log(1.2+freq) class weights over the train histogram."""
    hist = np.zeros(NUM_CLASSES)
    for seg in labels_list:
        tmp, _ = np.histogram(seg, range(NUM_CLASSES + 1))
        hist += tmp
    freq = hist.astype(np.float32) / hist.sum()
    return (1.0 / np.log(1.2 + freq)).astype(np.float32)


def _load_scenes(root: str, split: str):
    path = os.path.join(root, f"scannet_{split}.pickle")
    with open(path, "rb") as fp:
        scene_points_list = pickle.load(fp, encoding="latin1")
        semantic_labels_list = pickle.load(fp, encoding="latin1")
    return scene_points_list, semantic_labels_list


class _ScannetBase:
    def __init__(self, root: str | None = None, npoints: int = 8192,
                 split: str = "train", scenes=None, batch_size: int = 16,
                 seed: int = 0, process_shard: tuple[int, int] | None = None):
        if scenes is not None:
            self.scene_points_list = [np.asarray(p, np.float32)
                                      for p, _ in scenes]
            self.semantic_labels_list = [np.asarray(l, np.int32)
                                         for _, l in scenes]
        else:
            pts, lbl = _load_scenes(root, split)
            self.scene_points_list = [np.asarray(p, np.float32) for p in pts]
            self.semantic_labels_list = [np.asarray(l, np.int32) for l in lbl]
        self.npoints = npoints
        self.split = split
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        if split == "train":
            self.labelweights = compute_label_weights(self.semantic_labels_list)
        else:
            self.labelweights = np.ones(NUM_CLASSES, np.float32)
        if process_shard is not None:
            from pointnet2_tpu.data.modelnet import _host_slice

            # class weights are computed on the FULL train set above, then
            # each host keeps its own scene shard
            sl = _host_slice(len(self.scene_points_list), process_shard)
            self.scene_points_list = self.scene_points_list[sl]
            self.semantic_labels_list = self.semantic_labels_list[sl]

    def __len__(self):
        return len(self.scene_points_list)

    def num_batches(self) -> int:
        return -(-len(self) // self.batch_size)


class ScannetDataset(_ScannetBase):
    """Random-crop training sampler with occupancy/annotation retries."""

    def get_item(self, index: int):
        point_set = self.scene_points_list[index]
        semantic_seg = self.semantic_labels_list[index]
        coordmax = point_set.max(axis=0)
        coordmin = point_set.min(axis=0)
        cur_point_set, cur_semantic_seg, mask = point_set, semantic_seg, None
        for _ in range(10):
            center = point_set[self._rng.integers(len(semantic_seg))]
            curmin = center - [0.75, 0.75, 1.5]
            curmax = center + [0.75, 0.75, 1.5]
            curmin[2], curmax[2] = coordmin[2], coordmax[2]
            choice = np.sum((point_set >= (curmin - 0.2))
                            * (point_set <= (curmax + 0.2)), axis=1) == 3
            cur_point_set = point_set[choice]
            cur_semantic_seg = semantic_seg[choice]
            if len(cur_semantic_seg) == 0:
                continue
            mask = np.sum((cur_point_set >= (curmin - 0.01))
                          * (cur_point_set <= (curmax + 0.01)), axis=1) == 3
            vidx = np.ceil((cur_point_set[mask] - curmin)
                           / (curmax - curmin) * [31.0, 31.0, 62.0])
            vidx = np.unique(vidx[:, 0] * 31.0 * 62.0 + vidx[:, 1] * 62.0
                             + vidx[:, 2])
            annotated = np.sum(cur_semantic_seg > 0) / len(cur_semantic_seg)
            occupancy = len(vidx) / (31.0 * 31.0 * 62.0)
            if annotated >= 0.7 and occupancy >= 0.02:
                break
        if mask is None:  # degenerate scene
            mask = np.ones(len(cur_semantic_seg), bool)
        choice = self._rng.choice(len(cur_semantic_seg), self.npoints,
                                  replace=True)
        point_set = cur_point_set[choice]
        semantic_seg = cur_semantic_seg[choice]
        sample_weight = self.labelweights[semantic_seg] * mask[choice]
        return point_set, semantic_seg, sample_weight.astype(np.float32)

    def epoch(self, augment: bool = False,
              input_dropout: bool = True) -> Iterator[dict]:
        """Yield fixed-shape batches; `input_dropout` applies the reference's
        get_batch_wdp density augmentation (scannet/train.py:181-197)."""
        order = self._rng.permutation(len(self))
        for start in range(0, len(self), self.batch_size):
            sel = order[start:start + self.batch_size]
            items = [self.get_item(i) for i in sel]
            pts = np.stack([it[0] for it in items])
            seg = np.stack([it[1] for it in items])
            smpw = np.stack([it[2] for it in items])
            if input_dropout and self.split == "train":
                B, N = seg.shape
                ratios = self._rng.random((B, 1)) * 0.875
                drop = self._rng.random((B, N)) <= ratios
                first_pt = np.repeat(pts[:, 0:1, :], N, axis=1)
                first_lb = np.repeat(seg[:, 0:1], N, axis=1)
                pts[drop] = first_pt[drop]
                seg[drop] = first_lb[drop]
                smpw[drop] = 0.0
            (pts, seg, smpw), nvalid = _pad_batch([pts, seg, smpw],
                                                  self.batch_size)
            yield {"points": pts.astype(np.float32), "seg": seg.astype(np.int32),
                   "smpw": smpw.astype(np.float32), "nvalid": nvalid}


class ScannetDatasetWholeScene(_ScannetBase):
    """Tile each scene into 1.5 m x/y columns; one npoints sample per
    non-empty block. get_item returns (nblocks, npoints, ...) arrays."""

    def get_item(self, index: int):
        point_set_ini = self.scene_points_list[index]
        seg_ini = self.semantic_labels_list[index]
        coordmax = point_set_ini.max(axis=0)
        coordmin = point_set_ini.min(axis=0)
        nx = int(np.ceil((coordmax[0] - coordmin[0]) / 1.5))
        ny = int(np.ceil((coordmax[1] - coordmin[1]) / 1.5))
        point_sets, segs, weights = [], [], []
        for i in range(nx):
            for j in range(ny):
                curmin = coordmin + [i * 1.5, j * 1.5, 0]
                curmax = coordmin + [(i + 1) * 1.5, (j + 1) * 1.5,
                                     coordmax[2] - coordmin[2]]
                choice = np.sum((point_set_ini >= (curmin - 0.2))
                                * (point_set_ini <= (curmax + 0.2)), axis=1) == 3
                cur_point_set = point_set_ini[choice]
                cur_seg = seg_ini[choice]
                if len(cur_seg) == 0:
                    continue
                mask = np.sum((cur_point_set >= (curmin - 0.001))
                              * (cur_point_set <= (curmax + 0.001)), axis=1) == 3
                sample = self._rng.choice(len(cur_seg), self.npoints,
                                          replace=True)
                ps = cur_point_set[sample]
                sg = cur_seg[sample]
                msk = mask[sample]
                if msk.sum() / float(len(msk)) < 0.01:
                    continue
                w = self.labelweights[sg] * msk
                point_sets.append(ps)
                segs.append(sg)
                weights.append(w.astype(np.float32))
        return (np.stack(point_sets), np.stack(segs), np.stack(weights))

    def blocks(self) -> Iterator[tuple]:
        """All blocks of all scenes, flattened (for batched whole-scene
        eval; per-block predictions are independent in eval mode)."""
        for i in range(len(self)):
            ps, seg, w = self.get_item(i)
            for b in range(ps.shape[0]):
                yield ps[b], seg[b], w[b]


class ScannetDatasetVirtualScan(_ScannetBase):
    """8 virtual camera scans per scene via ray-cast visibility."""

    def get_item(self, index: int):
        from pointnet2_tpu.utils.scene_util import virtual_scan

        point_set_ini = self.scene_points_list[index]
        seg_ini = self.semantic_labels_list[index]
        weight_ini = self.labelweights[seg_ini]
        point_sets, segs, weights = [], [], []
        for mode in range(8):
            smpidx = virtual_scan(point_set_ini, mode=mode)
            if len(smpidx) < 300:
                continue
            sel = self._rng.choice(len(smpidx), self.npoints, replace=True)
            idx = smpidx[sel]
            point_sets.append(point_set_ini[idx])
            segs.append(seg_ini[idx])
            weights.append(weight_ini[idx].astype(np.float32))
        return (np.stack(point_sets), np.stack(segs), np.stack(weights))


def make_synthetic_scenes(num_scenes: int = 4, points_per_scene: int = 20000,
                          extent: float = 4.5, seed: int = 0):
    """Synthetic multi-room scenes with spatially-coherent labels, for
    hermetic whole-scene pipeline tests."""
    gen = np.random.default_rng(seed)
    scenes = []
    for s in range(num_scenes):
        pts = gen.uniform(0, extent, (points_per_scene, 3)).astype(np.float32)
        pts[:, 2] *= 3.0 / extent  # room height ~3m
        anchors = gen.uniform(0, extent, (NUM_CLASSES - 1, 3))
        anchors[:, 2] *= 3.0 / extent
        d = np.linalg.norm(pts[:, None, :] - anchors[None], axis=-1)
        labels = (np.argmin(d, axis=-1) + 1).astype(np.int32)
        unannotated = gen.random(points_per_scene) < 0.1
        labels[unannotated] = 0
        scenes.append((pts, labels))
    return scenes
