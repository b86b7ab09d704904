"""Evaluation protocols: vote ensembling, part mIoU, ScanNet whole-scene."""

from pointnet2_tpu.evaluation.cls_vote import evaluate_cls_voting  # noqa: F401
from pointnet2_tpu.evaluation.part_miou import (  # noqa: F401
    PartSegMetrics,
    constrained_part_prediction,
)
from pointnet2_tpu.evaluation.scannet_eval import (  # noqa: F401
    ScanNetMetrics,
    evaluate_scannet_chopped,
    evaluate_scannet_whole_scene,
)
