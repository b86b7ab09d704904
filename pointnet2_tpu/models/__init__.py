"""Model registry: reference-compatible names -> Flax modules + losses.

The reference selects models by module name via importlib
(train.py:52 `importlib.import_module(FLAGS.model)`); here a plain registry
serves the same role for the unified trainer CLI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pointnet2_tpu.models.cls_basic import PointNetClsBasic
from pointnet2_tpu.models.cls_msg import PointNet2ClsMSG
from pointnet2_tpu.models.cls_ssg import PointNet2ClsSSG
from pointnet2_tpu.models.part_seg import PointNet2PartSeg
from pointnet2_tpu.models.part_seg_msg_one_hot import PointNet2PartSegMSGOneHot
from pointnet2_tpu.models.sem_seg import PointNet2SemSeg
from pointnet2_tpu.models.losses import (
    classification_loss,
    segmentation_loss,
    weighted_segmentation_loss,
)

__all__ = [
    "PointNetClsBasic",
    "PointNet2ClsSSG",
    "PointNet2ClsMSG",
    "PointNet2PartSeg",
    "PointNet2PartSegMSGOneHot",
    "PointNet2SemSeg",
    "classification_loss",
    "segmentation_loss",
    "weighted_segmentation_loss",
    "get_model",
    "MODEL_REGISTRY",
]


@dataclass(frozen=True)
class ModelSpec:
    cls: type
    loss: Callable
    task: str  # "cls" | "part_seg" | "sem_seg"


MODEL_REGISTRY: dict[str, ModelSpec] = {
    # keys match the reference's models/*.py file names
    "pointnet_cls_basic": ModelSpec(PointNetClsBasic, classification_loss, "cls"),
    "pointnet2_cls_ssg": ModelSpec(PointNet2ClsSSG, classification_loss, "cls"),
    "pointnet2_cls_msg": ModelSpec(PointNet2ClsMSG, classification_loss, "cls"),
    "pointnet2_part_seg": ModelSpec(PointNet2PartSeg, segmentation_loss,
                                    "part_seg"),
    "pointnet2_part_seg_msg_one_hot": ModelSpec(
        PointNet2PartSegMSGOneHot, segmentation_loss, "part_seg_one_hot"),
    "pointnet2_sem_seg": ModelSpec(PointNet2SemSeg,
                                   weighted_segmentation_loss, "sem_seg"),
}


def get_model(name: str, **kwargs: Any):
    """Instantiate a registered model by its reference-compatible name."""
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name].cls(**kwargs)
