"""pointnet2_tpu — a TPU-native PointNet++ framework in JAX/XLA/Pallas.

Built from scratch with the capabilities of the reference implementation
(charlesq34/pointnet2, mounted read-only at /root/reference), re-designed
TPU-first:

- Point-cloud core ops (farthest point sampling, ball-query grouping,
  three-NN interpolation) as Pallas TPU kernels with pure-XLA fallbacks and
  reference-exact semantics (`pointnet2_tpu.ops`).
- Set-abstraction / feature-propagation layer library and the five reference
  model architectures as pure-functional Flax modules (`pointnet2_tpu.nn`,
  `pointnet2_tpu.models`).
- A single jit+shard_map data-parallel training loop that scales 1 chip → N
  hosts over a `jax.sharding.Mesh` (`pointnet2_tpu.parallel`,
  `pointnet2_tpu.train`).
- Host-side data pipelines with vectorized augmentation
  (`pointnet2_tpu.data`).
"""

__version__ = "0.1.0"

from pointnet2_tpu import ops  # noqa: F401
