"""Overfit-to-accuracy integration tests, one per model family.

Loss-decrease checks (test_train.py) can't catch subtle layer bugs — a
mis-wired skip connection or a wrong pooling still lets the loss drift
down. Requiring the full train/eval stack to actually REACH high train
accuracy on a tiny learnable dataset does (SURVEY §4 implication 4).

Runtime budget: tiny shapes, early exit once the target is hit, and the
cls shapes match test_train's so jit executables are reused within the
test session.
"""

import numpy as np
import pytest

from pointnet2_tpu.data import (
    SyntheticClassification,
    SyntheticSegmentation,
    SyntheticShapeNetPart,
)
from pointnet2_tpu.train import TrainConfig, Trainer


def _overfit(tmp_path, model, ds, target, max_epochs, lr=5e-3, eval_every=2,
             **cfg_kw):
    cfg = TrainConfig(model=model, batch_size=8, log_dir=str(tmp_path),
                      learning_rate=lr, augment="none",
                      steps_per_call=ds.num_batches(), **cfg_kw)
    tr = Trainer(cfg)
    example = next(iter(ds.epoch()))
    state = tr.init_state(tr._device_view(example))
    acc = 0.0
    for epoch in range(max_epochs):
        state = tr.train_epoch(state, ds, epoch)
        if epoch % eval_every and epoch != max_epochs - 1:
            continue
        acc = tr.eval_epoch(state, ds, epoch)
        if acc >= target:
            break
    assert acc >= target, f"{model}: train accuracy {acc:.3f} < {target}"


@pytest.mark.parametrize("model", ["pointnet_cls_basic",
                                   "pointnet2_cls_ssg"])
def test_overfit_classification(tmp_path, model):
    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8, seed=0)
    _overfit(tmp_path, model, ds, target=0.95, max_epochs=30, lr=1e-2)


@pytest.mark.slow
def test_overfit_classification_msg(tmp_path):
    ds = SyntheticClassification(num_classes=4, samples_per_class=8,
                                 npoints=64, batch_size=8, seed=0)
    _overfit(tmp_path, "pointnet2_cls_msg", ds, target=0.95, max_epochs=30)


@pytest.mark.slow
def test_overfit_part_seg(tmp_path):
    # one category: 16 samples of a 4-part angular-sector airplane
    ds = SyntheticShapeNetPart(num_samples=16, npoints=512, batch_size=8,
                               seed=0, categories=["Airplane"])
    _overfit(tmp_path, "pointnet2_part_seg", ds, target=0.85, max_epochs=20,
             lr=1e-2)


@pytest.mark.slow
def test_overfit_part_seg_msg_one_hot(tmp_path):
    ds = SyntheticShapeNetPart(num_samples=16, npoints=512, batch_size=8,
                               seed=0, categories=["Airplane"])
    _overfit(tmp_path, "pointnet2_part_seg_msg_one_hot", ds, target=0.85,
             max_epochs=20, lr=1e-2)


@pytest.mark.slow
def test_overfit_sem_seg(tmp_path):
    ds = SyntheticSegmentation(num_classes=2, num_samples=16, npoints=512,
                               batch_size=8, seed=0)
    _overfit(tmp_path, "pointnet2_sem_seg", ds, target=0.9, max_epochs=20,
             lr=1e-2, model_kwargs={"num_classes": 2})
