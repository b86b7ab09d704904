"""Procedural ScanNet scene generator: structure, format round-trip.

The generator must emit the reference pickle format so ScannetDataset,
the whole-scene tiler, and the caliacc protocol consume it unmodified
(scannet/scannet_dataset.py:13-16), with semantically structured labels
(walls are vertical, floors horizontal, furniture on the floor).
"""

import numpy as np
import pytest

from pointnet2_tpu.data.procedural_scannet import (
    LABEL_NAMES,
    LABELS,
    generate,
    make_scene,
)
from pointnet2_tpu.data.scannet import (
    NUM_CLASSES,
    ScannetDataset,
    ScannetDatasetWholeScene,
)


def test_labels_match_reference_list():
    assert len(LABEL_NAMES) == NUM_CLASSES == 21
    assert LABEL_NAMES[0] == "unannotated"
    assert LABELS["wall"] == 1 and LABELS["floor"] == 2


def test_scene_structure():
    rng = np.random.default_rng(1)
    pts, lbl = make_scene(rng, min_points=30_000, max_points=40_000)
    assert pts.dtype == np.float32 and lbl.dtype == np.int32
    assert 30_000 <= len(pts) <= 45_000 and len(lbl) == len(pts)
    assert set(np.unique(lbl)) <= set(range(21))
    # semantic geometry: floor points near z=0, wall points span height
    floor = pts[lbl == LABELS["floor"]]
    wall = pts[lbl == LABELS["wall"]]
    assert np.median(floor[:, 2]) < 0.4  # floor low (ceiling shares label)
    assert wall[:, 2].max() > 2.0 and wall[:, 2].min() < 0.3
    # some unannotated fraction, like real scans
    frac0 = float((lbl == 0).mean())
    assert 0.02 < frac0 < 0.3
    # furniture present
    assert (~np.isin(lbl, [0, 1, 2])).sum() > 1000


def test_pickle_round_trip_and_protocol_consumers(tmp_path):
    generate(str(tmp_path), train=3, test=2, seed=5,
             min_points=20_000, max_points=30_000)
    train = ScannetDataset(root=str(tmp_path), npoints=1024,
                           split="train", batch_size=4)
    assert len(train) == 3
    batch = next(iter(train.epoch()))
    assert batch["points"].shape == (4, 1024, 3)
    assert batch["smpw"].shape == (4, 1024)
    # class weights computed over the generated label histogram
    assert train.labelweights.shape == (21,)
    whole = ScannetDatasetWholeScene(root=str(tmp_path), npoints=1024,
                                     split="test", batch_size=4)
    ps, seg, w = whole.get_item(0)
    assert ps.ndim == 3 and ps.shape[1] == 1024
    assert ps.shape[0] >= 4  # several blocks per multi-meter room


def test_determinism():
    a = make_scene(np.random.default_rng(9), min_points=5000,
                   max_points=6000)
    b = make_scene(np.random.default_rng(9), min_points=5000,
                   max_points=6000)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


@pytest.mark.slow
def test_crop_sampler_accepts_generated_scenes():
    """The >=70%-annotated / >=2%-occupancy acceptance loop must usually
    succeed on generated rooms (they are mostly annotated and dense)."""
    from pointnet2_tpu.data.procedural_scannet import generate_scenes

    scenes = generate_scenes(2, seed=3, min_points=30_000,
                             max_points=40_000)
    ds = ScannetDataset(scenes=scenes, npoints=2048, split="train",
                        batch_size=4)
    for i in range(2):
        pts, seg, w = ds.get_item(i)
        assert (w > 0).mean() > 0.5  # strict-interior weights mostly live
