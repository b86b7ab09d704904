"""Neural-net layer library: shared MLPs, batch norm, SA/FP point modules."""

from pointnet2_tpu.nn.layers import BatchNorm, ConvBN, DenseBN, SharedMLP  # noqa: F401
from pointnet2_tpu.nn.pointnet import (  # noqa: F401
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMSG,
    sample_and_group,
    sample_and_group_all,
)
