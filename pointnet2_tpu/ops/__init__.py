"""Core point-cloud ops (TPU-native; Pallas kernels with XLA fallbacks)."""

from pointnet2_tpu.ops.sampling import (  # noqa: F401
    farthest_point_sample,
    gather_point,
    prob_sample,
)
from pointnet2_tpu.ops.grouping import (  # noqa: F401
    query_ball_point,
    query_ball_point_multi,
    query_ball_and_group_xyz,
    group_point,
    knn_point,
)
from pointnet2_tpu.ops.interpolate import (  # noqa: F401
    three_nn,
    three_interpolate,
)
from pointnet2_tpu.ops.pooling import max_pool  # noqa: F401
from pointnet2_tpu.ops.mesh import (  # noqa: F401
    sample_mesh,
    triangle_areas,
)
