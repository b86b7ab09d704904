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
                 seed: int = 0, process_shard: tuple[int, int] | None = None,
                 num_workers: int = 0):
        if scenes is not None:
            pts = [p for p, _ in scenes]
            lbl = [l for _, l in scenes]
        else:
            pts, lbl = _load_scenes(root, split)
        # Scenes are stored X-SORTED: the crop sampler's slab prefilter
        # becomes a contiguous slice (searchsorted directly on the stored
        # array, no per-scene argsort cache, no indirect gathers on the
        # hot path). Within-scene point order carries no semantics for any
        # sampler — crops/blocks/views all resample randomly — though the
        # wdp augmentation's "replace with point 0" now means the
        # leftmost-x point rather than the pickle's arbitrary first point
        # (equally arbitrary; scannet/train.py:190).
        self.scene_points_list = []
        self.semantic_labels_list = []
        for p, l in zip(pts, lbl):
            p = np.asarray(p, np.float32)
            l = np.asarray(l, np.int32)
            order = np.argsort(p[:, 0], kind="stable")
            self.scene_points_list.append(np.ascontiguousarray(p[order]))
            self.semantic_labels_list.append(np.ascontiguousarray(l[order]))
        self.npoints = npoints
        self.split = split
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self._meta_cache: dict[int, tuple] = {}  # x-order/bounds, capped
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

    def zero_batch(self) -> dict:
        """All-padding sem-seg batch (nvalid=0) from shape metadata — see
        evaluation/lockstep.py."""
        B, N = self.batch_size, self.npoints
        return {"points": np.zeros((B, N, 3), np.float32),
                "seg": np.zeros((B, N), np.int32),
                "smpw": np.zeros((B, N), np.float32), "nvalid": 0}

    def scene_meta(self, index: int):
        """Cached (coordmin, coordmax) bounds. Scenes are stored x-sorted
        (see __init__), so the slab prefilter needs no ordering metadata —
        bounds are the only derived per-scene state."""
        meta = self._meta_cache.get(index)
        if meta is None:
            pts = self.scene_points_list[index]
            meta = (pts.min(axis=0), pts.max(axis=0))
            self._meta_cache[index] = meta
        return meta


def _batched_items(items, batch_size: int, rng,
                   input_dropout: bool = False) -> Iterator[dict]:
    """Stack (points, seg, smpw) items into fixed-shape sem_seg batches.
    `input_dropout` applies the reference's get_batch_wdp density
    augmentation (scannet/train.py:181-197): per cloud, a random <=87.5%
    of points are replaced by point 0 with their weight zeroed."""
    buf = []

    def emit(buf):
        pts = np.stack([it[0] for it in buf])
        seg = np.stack([it[1] for it in buf])
        smpw = np.stack([it[2] for it in buf])
        if input_dropout:
            B, N = seg.shape
            ratios = rng.random((B, 1)) * 0.875
            drop = rng.random((B, N)) <= ratios
            first_pt = np.repeat(pts[:, 0:1, :], N, axis=1)
            first_lb = np.repeat(seg[:, 0:1], N, axis=1)
            pts[drop] = first_pt[drop]
            seg[drop] = first_lb[drop]
            smpw[drop] = 0.0
        (pts, seg, smpw), nvalid = _pad_batch([pts, seg, smpw], batch_size)
        return {"points": pts.astype(np.float32),
                "seg": seg.astype(np.int32),
                "smpw": smpw.astype(np.float32), "nvalid": nvalid}

    for item in items:
        buf.append(item)
        if len(buf) == batch_size:
            yield emit(buf)
            buf = []
    if buf:
        yield emit(buf)


class ScannetDataset(_ScannetBase):
    """Random-crop training sampler with occupancy/annotation acceptance.

    Protocol (scannet/scannet_dataset.py:27-61): candidate crops are
    1.5 x 1.5 m x full-height columns around random scene points; a crop is
    accepted when >=70% of its (0.2 m-expanded) member points are annotated
    and >=2% of the 31x31x62 voxel grid over its strict (0.01 m) interior is
    occupied; up to 10 candidates are tried, the final one is used
    regardless. npoints are resampled with replacement and weighted by the
    class-balancing weights masked to the strict interior.

    Redesigned host pipeline: the reference re-tests every scene point
    against every retry box in python (the SURVEY §3.1 input bottleneck);
    here candidates are scored against a cached x-sorted projection — a
    binary-searched slab plus one vectorized y test — with early exit on
    the first acceptance, and only the chosen crop's points are ever
    gathered. :meth:`score_candidates` keeps the full (K, N) matrix
    formulation as the executable protocol spec the fast path is tested
    against. One divergence: if every candidate is empty the reference
    would crash sampling from a zero-length crop; here the whole scene is
    the fallback crop.
    """

    _HALF = np.array([0.75, 0.75, 1.5], np.float32)
    _GRID = np.array([31.0, 31.0, 62.0])

    @classmethod
    def score_candidates(cls, pts: np.ndarray, seg: np.ndarray,
                         centers: np.ndarray):
        """Score candidate crop columns around `centers` in one broadcast
        pass. Returns (expanded (K,N), strict (K,N), annotated (K,),
        occupancy (K,)) per the reference's acceptance formulas."""
        num_candidates = len(centers)
        coordmin, coordmax = pts.min(axis=0), pts.max(axis=0)
        lo = centers - cls._HALF
        hi = centers + cls._HALF
        lo[:, 2], hi[:, 2] = coordmin[2], coordmax[2]

        # (K, N) membership. The column spans the scene's full z range, so
        # the z conditions (z >= coordmin-margin, z <= coordmax+margin) are
        # identically true — x/y tests alone are exact.
        x, y = pts[:, 0], pts[:, 1]
        expanded = ((x >= lo[:, :1] - 0.2) & (x <= hi[:, :1] + 0.2)
                    & (y >= lo[:, 1:2] - 0.2) & (y <= hi[:, 1:2] + 0.2))
        counts = expanded.sum(axis=1)
        annotated = (expanded & (seg > 0)).sum(axis=1) / np.maximum(counts, 1)

        # strict interior: strict ⊂ expanded, so test only expanded pairs
        k_idx, p_idx = np.nonzero(expanded)
        px, py = x[p_idx], y[p_idx]
        s = ((px >= lo[k_idx, 0] - 0.01) & (px <= hi[k_idx, 0] + 0.01)
             & (py >= lo[k_idx, 1] - 0.01) & (py <= hi[k_idx, 1] + 0.01))
        strict = np.zeros_like(expanded)
        strict[k_idx[s], p_idx[s]] = True

        # occupancy: unique voxels of each candidate's strict interior, all
        # candidates at once (keys offset per candidate stay disjoint)
        ks, ps = k_idx[s], p_idx[s]
        v = np.ceil((pts[ps] - lo[ks]) / (hi[ks] - lo[ks]) * cls._GRID)
        keys = (v[:, 0] * cls._GRID[1] + v[:, 1]) * cls._GRID[2] + v[:, 2]
        nvox = int(cls._GRID.prod())
        uniq = np.unique(ks * (nvox * 4) + keys.astype(np.int64))
        occ_counts = np.bincount(uniq // (nvox * 4), minlength=num_candidates)
        occupancy = occ_counts / float(nvox)
        return expanded, strict, annotated, occupancy

    def _score_one(self, pts, seg, center, meta):
        """Score a single candidate column. `pts`/`seg` must be the
        dataset's stored (x-sorted) arrays: the slab is then the
        contiguous slice [l:r) and every test runs on contiguous rows
        (no indirect gathers). Returns (member point ids, strict mask over
        members, annotated fraction, voxel occupancy). Bound arithmetic
        matches :meth:`score_candidates` operation-for-operation so the
        two paths are bitwise consistent."""
        coordmin, coordmax = meta
        lo = center - self._HALF
        hi = center + self._HALF
        lo[2], hi[2] = coordmin[2], coordmax[2]

        # x slab via binary search on the stored-sorted x column, then the
        # y test on the contiguous slab only
        l = np.searchsorted(pts[:, 0], lo[0] - 0.2, "left")
        r = np.searchsorted(pts[:, 0], hi[0] + 0.2, "right")
        y = pts[l:r, 1]
        m = (y >= lo[1] - 0.2) & (y <= hi[1] + 0.2)
        member = l + np.flatnonzero(m)
        if len(member) == 0:
            return member, member.astype(bool), 0.0, 0.0
        nm = len(member)
        annotated = np.count_nonzero(m & (seg[l:r] > 0)) / nm

        px, py = pts[l:r, 0][m], y[m]
        strict = ((px >= lo[0] - 0.01) & (px <= hi[0] + 0.01)
                  & (py >= lo[1] - 0.01) & (py <= hi[1] + 0.01))
        v = np.ceil((pts[member[strict]] - lo) / (hi - lo) * self._GRID)
        keys = ((v[:, 0] * self._GRID[1] + v[:, 1]) * self._GRID[2]
                + v[:, 2]).astype(np.int64)
        nvox = float(self._GRID.prod())
        # occupied-voxel count via bincount over the small fixed key space
        # (no sort, unlike np.unique); keys can sit one cell outside the
        # grid from the +-0.01 strict margin, hence the shift/slack.
        occupancy = np.count_nonzero(
            np.bincount(keys - keys.min() if keys.size else keys,
                        minlength=1)) / nvox
        return member, strict, annotated, occupancy

    def get_item(self, index: int, num_candidates: int = 10, rng=None):
        pts = self.scene_points_list[index]  # (N, 3)
        seg = self.semantic_labels_list[index]  # (N,)
        meta = self.scene_meta(index)
        rng = self._rng if rng is None else rng

        centers = pts[rng.integers(len(pts), size=num_candidates)]
        chosen = last_nonempty = None
        for k in range(num_candidates):  # early exit on first acceptance,
            member, strict, annotated, occupancy = self._score_one(
                pts, seg, centers[k].copy(), meta)  # like the reference scan
            if len(member) == 0:
                continue
            last_nonempty = (member, strict)
            if annotated >= 0.7 and occupancy >= 0.02:
                chosen = last_nonempty
                break
        if chosen is None:
            chosen = last_nonempty
        if chosen is None:  # degenerate scene: no candidate saw any point
            member = np.arange(len(pts))
            strict = np.ones(len(pts), bool)
        else:
            member, strict = chosen
        sel_local = rng.integers(len(member), size=self.npoints)
        sel = member[sel_local]
        weight = self.labelweights[seg[sel]] * strict[sel_local]
        return pts[sel], seg[sel], weight.astype(np.float32)

    def epoch(self, augment: bool = False,
              input_dropout: bool = True) -> Iterator[dict]:
        """Yield fixed-shape batches; `input_dropout` applies the reference's
        get_batch_wdp density augmentation (scannet/train.py:181-197)."""
        order = self._rng.permutation(len(self))
        wdp = input_dropout and self.split == "train"
        if self.num_workers > 1:
            # Per-item generators spawned up front keep the stream
            # deterministic for a given seed regardless of thread timing.
            from pointnet2_tpu.utils.prefetch import parallel_map

            seeds = self._rng.integers(0, 2 ** 63, size=len(order))
            items = parallel_map(
                lambda t: self.get_item(
                    int(t[0]), rng=np.random.default_rng(int(t[1]))),
                list(zip(order, seeds)), self.num_workers)
        else:
            items = (self.get_item(i) for i in order)
        yield from _batched_items(items, self.batch_size, self._rng,
                                  input_dropout=wdp)


class ScannetDatasetWholeScene(_ScannetBase):
    """Tile each scene into 1.5 m x/y columns; one npoints sample per
    non-empty block. get_item returns (nblocks, npoints, ...) arrays.

    Protocol (scannet/scannet_dataset.py:83-118): a block's member points
    lie within its x/y bounds expanded by 0.2 m (full z range); npoints are
    resampled with replacement per block; the block is kept when >=1% of the
    sampled points fall in the strict (0.001 m) interior, which also masks
    the weights.

    Redesigned host pipeline: instead of an O(nx*ny*N) python double loop
    re-testing every point against every block, points are binned to their
    (at most 4, from the 0.2 m overlap) owning blocks in one vectorized
    pass, grouped with a single argsort, and only the small per-block
    sampling remains a loop. Points exactly ON an expanded-box boundary
    (measure-zero for real scan floats) may bin differently than the
    reference's closed-interval test.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._tiling_cache: dict[int, tuple] = {}

    @staticmethod
    def block_members(pts: np.ndarray, coordmin: np.ndarray,
                      nx: int, ny: int) -> np.ndarray:
        """(block_id, point_id) pairs, sorted by block, for the expanded
        (0.2 m-overlap) membership test — each point lands in at most 4
        blocks: floor((d -/+ 0.2)/1.5) on each axis."""
        xy = pts[:, :2] - coordmin[:2]
        blo = np.floor((xy - 0.2) / 1.5).astype(np.int64)  # (N, 2)
        bhi = np.floor((xy + 0.2) / 1.5).astype(np.int64)
        pid = np.arange(len(pts), dtype=np.int64)
        # The 4 (x, y) combos cover every owner; a combo duplicates the
        # first exactly when its floor equals the low floor on that axis,
        # so masking on inequality yields a duplicate-free pair set with
        # no np.unique(axis=0) pass (which dominated tiling cost).
        dx = blo[:, 0] != bhi[:, 0]
        dy = blo[:, 1] != bhi[:, 1]
        combos = [(blo[:, 0], blo[:, 1], None),
                  (bhi[:, 0], blo[:, 1], dx),
                  (blo[:, 0], bhi[:, 1], dy),
                  (bhi[:, 0], bhi[:, 1], dx & dy)]
        pairs = []
        for bx, by, extra in combos:
            keep = (bx >= 0) & (bx < nx) & (by >= 0) & (by < ny)
            if extra is not None:
                keep &= extra
            pairs.append(np.stack([(bx * ny + by)[keep], pid[keep]], 1))
        pairs = np.concatenate(pairs)
        order = np.argsort(pairs[:, 0], kind="stable")
        return pairs[order]

    def _scene_tiling(self, index: int):
        """Static per-scene binning (pairs sorted by block + block table);
        cached — eval passes re-tile the same scenes every time, so only
        the (vectorized) resampling below is paid per pass."""
        cached = self._tiling_cache.get(index)
        if cached is not None:
            return cached
        pts = self.scene_points_list[index]
        coordmin, coordmax = pts.min(axis=0), pts.max(axis=0)
        # `or 1`: a zero-extent axis (degenerate planar scene) still owns
        # one block — matches serving.predict_scene's tiling of the same
        # geometry, instead of silently dropping the scene from eval
        nx = int(np.ceil((coordmax[0] - coordmin[0]) / 1.5)) or 1
        ny = int(np.ceil((coordmax[1] - coordmin[1]) / 1.5)) or 1
        pairs = self.block_members(pts, coordmin, nx, ny)
        block_ids, starts = np.unique(pairs[:, 0], return_index=True)
        counts = np.append(starts[1:], len(pairs)) - starts
        tiling = (pairs[:, 1].astype(np.int32), block_ids, starts, counts,
                  ny, coordmin, coordmax)
        if len(self._tiling_cache) >= 256:  # bound host memory on big evals
            self._tiling_cache.pop(next(iter(self._tiling_cache)))
        self._tiling_cache[index] = tiling
        return tiling

    def get_item(self, index: int):
        pts = self.scene_points_list[index]
        seg = self.semantic_labels_list[index]
        member, block_ids, starts, counts, ny, coordmin, coordmax = \
            self._scene_tiling(index)
        B = len(block_ids)
        # One batched resample-with-replacement for ALL blocks: per-row
        # uniform offsets into each block's contiguous [start, start+count)
        # slice of the sorted membership array.
        u = self._rng.random((B, self.npoints))
        offs = (u * counts[:, None]).astype(np.int64)
        sel = member[starts[:, None] + offs]          # (B, npoints)
        ps = pts[sel]                                 # (B, npoints, 3)
        sg = seg[sel]
        curmin = coordmin + np.stack(
            [(block_ids // ny) * 1.5, (block_ids % ny) * 1.5,
             np.zeros(B)], 1)                         # (B, 3)
        curmax = np.stack(
            [curmin[:, 0] + 1.5, curmin[:, 1] + 1.5,
             np.full(B, coordmax[2])], 1)
        msk = ((ps >= curmin[:, None] - 0.001)
               & (ps <= curmax[:, None] + 0.001)).all(-1)  # (B, npoints)
        keep = msk.mean(1) >= 0.01
        w = (self.labelweights[sg] * msk).astype(np.float32)
        return ps[keep], sg[keep], w[keep]

    def blocks(self) -> Iterator[tuple]:
        """All blocks of all scenes, flattened (for batched whole-scene
        eval; per-block predictions are independent in eval mode)."""
        for i in range(len(self)):
            ps, seg, w = self.get_item(i)
            for b in range(ps.shape[0]):
                yield ps[b], seg[b], w[b]


class ScannetDatasetVirtualScan(_ScannetBase):
    """8 virtual camera scans per scene via ray-cast visibility
    (scannet/scannet_dataset.py:122-165 + scene_util.py): each scene yields
    up to 8 views — the points visible from a virtual camera at one of 8
    horizontal orientations — each resampled to npoints; views seeing <300
    points are dropped. The ray cast runs once per scene and is cached, so
    epochs after the first pay only the resampling cost."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._scan_cache: dict[int, list[np.ndarray]] = {}

    def view_indices(self, index: int) -> list[np.ndarray]:
        """Visible-point index sets of the >=300-point views of a scene."""
        if index not in self._scan_cache:
            from pointnet2_tpu.utils.scene_util import virtual_scan

            views = []
            for mode in range(8):
                smpidx = virtual_scan(self.scene_points_list[index],
                                      mode=mode)
                if len(smpidx) >= 300:
                    views.append(smpidx)
            self._scan_cache[index] = views
        return self._scan_cache[index]

    def _sample_view(self, index: int, smpidx: np.ndarray):
        idx = smpidx[self._rng.integers(len(smpidx), size=self.npoints)]
        seg = self.semantic_labels_list[index][idx]
        return (self.scene_points_list[index][idx], seg,
                self.labelweights[seg].astype(np.float32))

    def get_item(self, index: int):
        views = [self._sample_view(index, s)
                 for s in self.view_indices(index)]
        return (np.stack([v[0] for v in views]),
                np.stack([v[1] for v in views]),
                np.stack([v[2] for v in views]))

    def _all_views(self) -> list[tuple[int, int]]:
        return [(i, v) for i in range(len(self))
                for v in range(len(self.view_indices(i)))]

    def num_batches(self) -> int:
        return -(-len(self._all_views()) // self.batch_size)

    def epoch(self, augment: bool = False,
              input_dropout: bool = True) -> Iterator[dict]:
        """Training epochs over the flattened (scene, view) pairs, in the
        standard sem_seg batch format (so the Trainer/CLI can consume the
        virtual-scan sampler exactly like the crop sampler)."""
        pairs = self._all_views()
        order = self._rng.permutation(len(pairs))
        wdp = input_dropout and self.split == "train"
        items = (self._sample_view(pairs[k][0],
                                   self.view_indices(pairs[k][0])[pairs[k][1]])
                 for k in order)
        yield from _batched_items(items, self.batch_size, self._rng,
                                  input_dropout=wdp)


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
