"""Host input-pipeline benchmarks: can the samplers keep the chip fed?

The reference's per-sample python crop loop was the known input bottleneck
(SURVEY §3.1, scannet/scannet_dataset.py:36-60). The vectorized samplers
must produce clouds faster than the measured device step consumes them
(sem_seg step ~476 clouds/s on one chip, benchmarks/models.py).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/loaders.py
"""

import json
import time

import numpy as np

from pointnet2_tpu.data.scannet import (
    ScannetDataset,
    ScannetDatasetVirtualScan,
    ScannetDatasetWholeScene,
)


def make_scenes(num=8, points=200_000, seed=0):
    """Realistic ScanNet-scale scenes (~200k points, ~6x6x3 m rooms)."""
    gen = np.random.default_rng(seed)
    scenes = []
    for _ in range(num):
        pts = gen.uniform(0, 6.0, (points, 3)).astype(np.float32)
        pts[:, 2] *= 0.5
        labels = gen.integers(0, 21, points).astype(np.int32)
        scenes.append((pts, labels))
    return scenes


def bench(name, fn, iters):
    fn()  # warmup
    t0 = time.perf_counter()
    n = 0
    for _ in range(iters):
        n += fn()
    dt = time.perf_counter() - t0
    print(json.dumps({"loader": name, "items_per_sec": round(n / dt, 1),
                      "sec_per_item": round(dt / n, 4)}))
    return n / dt


def main():
    scenes = make_scenes()

    train = ScannetDataset(scenes=scenes, npoints=8192, split="train",
                           batch_size=16)
    bench("scannet_crop_get_item",
          lambda: (train.get_item(np.random.randint(len(scenes))), 1)[1], 64)

    def one_epoch_batches(ds):
        return sum(1 for _ in ds.epoch()) * ds.batch_size

    bench("scannet_crop_epoch_clouds", lambda: one_epoch_batches(train), 8)
    train2 = ScannetDataset(scenes=scenes, npoints=8192, split="train",
                            batch_size=16, num_workers=2)
    bench("scannet_crop_epoch_clouds_2workers",
          lambda: one_epoch_batches(train2), 8)

    # cold = fresh dataset (tiling computed); warm = cached tiling, the
    # steady state of the every-5-epochs whole-scene eval protocol
    def whole_cold():
        w = ScannetDatasetWholeScene(scenes=scenes[:2], npoints=8192,
                                     split="test")
        return w.get_item(0)[0].shape[0]

    bench("scannet_whole_scene_blocks_cold", whole_cold, 8)
    whole = ScannetDatasetWholeScene(scenes=scenes[:2], npoints=8192,
                                     split="test")
    whole.get_item(0)
    bench("scannet_whole_scene_blocks_warm",
          lambda: whole.get_item(0)[0].shape[0], 8)

    vs = ScannetDatasetVirtualScan(scenes=scenes[:2], npoints=8192,
                                   split="train", batch_size=16)
    vs.view_indices(0), vs.view_indices(1)  # warm the ray-cast cache
    bench("scannet_virtual_scan_epoch_clouds",
          lambda: sum(b["nvalid"] for b in vs.epoch()), 4)

    # ModelNet h5 path with the full host augmentation chain — must beat
    # the measured cls_ssg train step (~3200 clouds/s/chip) to keep the
    # chip fed when augmenting on host instead of on device.
    import os
    import tempfile

    from pointnet2_tpu.data import ModelNetH5Dataset
    from pointnet2_tpu.data.procedural_modelnet import generate

    d = tempfile.mkdtemp()
    generate(d, train_per_class=16, test_per_class=2, seed=0)
    mn = ModelNetH5Dataset(os.path.join(d, "train_files.txt"),
                           batch_size=16, npoints=1024)
    bench("modelnet_h5_epoch_clouds_augmented",
          lambda: sum(b["nvalid"] for b in mn.epoch(augment=True)), 4)
    bench("modelnet_h5_epoch_clouds_plain",
          lambda: sum(b["nvalid"] for b in mn.epoch(augment=False)), 4)


if __name__ == "__main__":
    main()
