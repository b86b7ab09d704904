"""Procedural ShapeNetPart generator: label validity, layout round-trip.

The generator (data/procedural_shapenet_part.py) must emit the exact
v0_normal on-disk layout so PartNormalDataset (mirroring the reference's
part_seg/part_dataset_all_normal.py:19-112) consumes it unmodified, with
per-point part labels inside each category's SEG_CLASSES range.
"""

import numpy as np
import pytest

from pointnet2_tpu.data.procedural_shapenet_part import (
    CATEGORY_BUILDERS,
    CATEGORY_SYNSETS,
    generate,
    make_part_shape,
)
from pointnet2_tpu.data.shapenet_part import (
    NUM_PARTS,
    SEG_CLASSES,
    PartNormalDataset,
)


def test_every_category_has_builder_and_synset():
    assert set(CATEGORY_BUILDERS) == set(SEG_CLASSES)
    assert set(CATEGORY_SYNSETS) == set(SEG_CLASSES)
    assert len(set(CATEGORY_SYNSETS.values())) == len(CATEGORY_SYNSETS)


@pytest.mark.parametrize("cat", sorted(SEG_CLASSES))
def test_labels_within_category_range_and_normals_unit(cat):
    rng = np.random.default_rng(3)
    pts, nrm, seg = make_part_shape(cat, rng, 512)
    assert pts.shape == (512, 3) and nrm.shape == (512, 3)
    assert set(np.unique(seg).tolist()) <= set(SEG_CLASSES[cat])
    # required (non-optional) parts must appear: at minimum 2 parts
    assert len(np.unique(seg)) >= 2
    norms = np.linalg.norm(nrm, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_all_50_labels_reachable():
    rng = np.random.default_rng(0)
    seen: set[int] = set()
    for _ in range(30):
        for cat in SEG_CLASSES:
            seen |= set(
                np.unique(make_part_shape(cat, rng, 256)[2]).tolist())
        if len(seen) == NUM_PARTS:
            break
    assert len(seen) == NUM_PARTS


def test_generate_layout_round_trips_through_loader(tmp_path):
    generate(str(tmp_path), train_per_class=2, val_per_class=1,
             test_per_class=1, npoints=192, seed=1)
    train = PartNormalDataset(str(tmp_path), npoints=96, split="trainval",
                              batch_size=4)
    test = PartNormalDataset(str(tmp_path), npoints=96, split="test",
                             batch_size=4)
    assert len(train) == 3 * len(SEG_CLASSES)
    assert len(test) == 1 * len(SEG_CLASSES)
    batch = next(iter(train.epoch()))
    assert batch["points"].shape == (4, 96, 6)
    assert batch["seg"].shape == (4, 96)
    assert batch["cls_label"].shape == (4,)
    # labels must be consistent with the declared category
    cats = list(train.cat)
    for row in range(int(batch["nvalid"])):
        cat = cats[int(batch["cls_label"][row])]
        assert set(np.unique(batch["seg"][row]).tolist()) \
            <= set(SEG_CLASSES[cat])


def test_determinism():
    a = make_part_shape("Chair", np.random.default_rng(7), 128)
    b = make_part_shape("Chair", np.random.default_rng(7), 128)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_synthetic_category_ids_match_real_loader_order():
    """SyntheticShapeNetPart's one-hot ids must equal the ids
    PartNormalDataset derives from synsetoffset2category.txt order
    (alphabetical — CATEGORY_ORDER); a permuted assignment silently
    breaks checkpoints moved between synthetic and real data."""
    from pointnet2_tpu.data.shapenet_part import (CATEGORY_ORDER,
                                                  SyntheticShapeNetPart)

    ds = SyntheticShapeNetPart(num_samples=16, npoints=32, batch_size=4)
    assert CATEGORY_ORDER == sorted(CATEGORY_ORDER)
    assert CATEGORY_ORDER[int(ds.cls[0])] == CATEGORY_ORDER[0]
    # sample i takes category i % 16 in CATEGORY_ORDER order
    for i in range(16):
        assert int(ds.cls[i]) == i
