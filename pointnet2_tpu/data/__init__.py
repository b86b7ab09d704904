"""Dataset pipelines and augmentation (host numpy + on-device JAX)."""

from pointnet2_tpu.data import augment, augment_jax  # noqa: F401
from pointnet2_tpu.data.modelnet import ModelNetDataset, ModelNetH5Dataset  # noqa: F401
from pointnet2_tpu.data.scannet import (  # noqa: F401
    ScannetDataset,
    ScannetDatasetVirtualScan,
    ScannetDatasetWholeScene,
    make_synthetic_scenes,
)
from pointnet2_tpu.data.shapenet_part import (  # noqa: F401
    PartNormalDataset,
    SyntheticShapeNetPart,
)
from pointnet2_tpu.data.synthetic import (  # noqa: F401
    SyntheticClassification,
    SyntheticSegmentation,
)
