"""Unified training CLI.

Replaces the reference's five drivers (train.py, train_multi_gpu.py,
part_seg/train.py, part_seg/train_one_hot.py, scannet/train.py) with one
entry point; the task comes from the model registry. Data-parallel scaling
needs no flag beyond --num_devices (and multi-host just works after
jax.distributed.initialize — there is no separate multi-device script).

Usage:
  python -m pointnet2_tpu.cli.train --model pointnet2_cls_ssg \
      --data data/modelnet40_ply_hdf5_2048 --num_point 1024 --batch_size 16
  python -m pointnet2_tpu.cli.train --model pointnet2_cls_ssg --synthetic

Flag names follow the reference (train.py:25-38).
"""

from __future__ import annotations

import argparse

from pointnet2_tpu.models import MODEL_REGISTRY


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="pointnet2_cls_ssg",
                   choices=sorted(MODEL_REGISTRY))
    p.add_argument("--data", default=None,
                   help="dataset root (task-specific layout)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the built-in synthetic dataset (hermetic)")
    p.add_argument("--synthetic_size", type=int, default=8,
                   help="samples per class for the synthetic cls dataset")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--max_epoch", type=int, default=251)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "momentum"])
    p.add_argument("--decay_step", type=int, default=200000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    p.add_argument("--normal", action="store_true",
                   help="use XYZ+normal input (txt dataset for cls)")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None,
                   help="override the model's class count (e.g. sem_seg)")
    p.add_argument("--model_kwargs", type=str, default=None,
                   help="JSON dict of extra model constructor kwargs, e.g. "
                        "'{\"sa1_nsample\": [128,128,128]}' for the MSG "
                        "5000-pt paper recipe (README.md:59)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (params/stats stay float32)")
    p.add_argument("--eval_every", type=int, default=None,
                   help="epochs between evals (default 1; sem_seg defaults "
                        "to 5 like scannet/train.py:167)")
    p.add_argument("--no_whole_scene_eval", action="store_true",
                   help="sem_seg: skip the whole-scene sliding-block eval "
                        "and caliacc best-ckpt selection during training")
    p.add_argument("--loader_workers", type=int, default=2,
                   help="sem_seg: threads producing crop samples in "
                        "parallel (0/1 = in-line; measured ~1.4x at 2)")
    p.add_argument("--virtual_scan", action="store_true",
                   help="sem_seg: train on 8-view virtual-scan samples "
                        "instead of random crops "
                        "(scannet_dataset.py:122-165)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="scan K prefetched batches per device dispatch "
                        "(amortizes the host round trip; bench.py uses 25)")
    p.add_argument("--remat", default="none",
                   choices=["none", "full", "dots", "dots_nobatch"],
                   help="backward-pass rematerialization policy (slower on "
                        "this chip — see docs/PERF.md; for memory-limited "
                        "configs)")
    p.add_argument("--watchdog_secs", type=float, default=None,
                   help="exit 75 (retryable) if no dispatch completes for "
                        "this long — detects wedged remote-device sessions; "
                        "resume with the same command (train/watchdog.py)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed; --batch_size is the "
                        "GLOBAL batch, data is sharded per host")
    return p


def make_datasets(args, test_only: bool = False):
    """Build (train, eval, on-device-augment-name) for the model's task.

    With --multihost, each process loads only its shard and its loaders
    yield local batches (global batch / process count). `test_only` skips
    loading the train split entirely (cli.evaluate / cli.visualize pay
    neither the h5/pickle read nor its host memory) and returns None for
    it."""
    import jax

    shard = None
    if getattr(args, "multihost", False) and jax.process_count() > 1:
        import copy

        from pointnet2_tpu.parallel import multihost

        shard = (jax.process_index(), jax.process_count())
        args = copy.copy(args)
        args.batch_size = multihost.local_batch_size(args.batch_size)
    return _make_datasets_sharded(args, shard, test_only)


def _make_datasets_sharded(args, shard, test_only=False):
    task = MODEL_REGISTRY[args.model].task
    if task == "cls":
        if args.synthetic or args.data is None:
            from pointnet2_tpu.data import SyntheticClassification

            mk = lambda seed: SyntheticClassification(
                num_classes=40, samples_per_class=args.synthetic_size,
                npoints=args.num_point, channels=6 if args.normal else 3,
                batch_size=args.batch_size, seed=seed)
            return mk(0), mk(1), "cls_normals" if args.normal else "cls"
        if args.normal:
            from pointnet2_tpu.data import ModelNetDataset

            train = None if test_only else ModelNetDataset(
                args.data, batch_size=args.batch_size,
                npoints=args.num_point, split="train", process_shard=shard)
            test = ModelNetDataset(args.data, batch_size=args.batch_size,
                                   npoints=args.num_point, split="test",
                                   process_shard=shard)
            return train, test, "cls_normals"
        from pointnet2_tpu.data import ModelNetH5Dataset
        import os

        train = None if test_only else ModelNetH5Dataset(
            os.path.join(args.data, "train_files.txt"),
            batch_size=args.batch_size, npoints=args.num_point,
            process_shard=shard)
        test = ModelNetH5Dataset(os.path.join(args.data, "test_files.txt"),
                                 batch_size=args.batch_size,
                                 npoints=args.num_point, shuffle=False,
                                 process_shard=shard)
        return train, test, "cls"
    if task in ("part_seg", "part_seg_one_hot"):
        if args.synthetic or args.data is None:
            from pointnet2_tpu.data import SyntheticShapeNetPart

            mk = lambda seed: SyntheticShapeNetPart(
                num_samples=64, npoints=args.num_point,
                batch_size=args.batch_size, seed=seed)
            return mk(0), mk(1), "none"
        from pointnet2_tpu.data import PartNormalDataset

        train = None if test_only else PartNormalDataset(
            args.data, npoints=args.num_point, split="trainval",
            batch_size=args.batch_size, process_shard=shard)
        test = PartNormalDataset(args.data, npoints=args.num_point,
                                 split="test", batch_size=args.batch_size,
                                 process_shard=shard)
        return train, test, "none"
    # sem_seg
    from pointnet2_tpu.data import ScannetDataset, ScannetDatasetVirtualScan

    train_cls = (ScannetDatasetVirtualScan if getattr(args, "virtual_scan",
                                                      False)
                 else ScannetDataset)
    if args.synthetic or args.data is None:
        from pointnet2_tpu.data import make_synthetic_scenes

        train = train_cls(scenes=make_synthetic_scenes(4),
                          npoints=args.num_point, split="train",
                          batch_size=args.batch_size,
                          num_workers=getattr(args, "loader_workers", 2))
        test = ScannetDataset(scenes=make_synthetic_scenes(2, seed=9),
                              npoints=args.num_point, split="test",
                              batch_size=args.batch_size)
        return train, test, "scannet"
    train = None if test_only else train_cls(
        root=args.data, npoints=args.num_point, split="train",
        batch_size=args.batch_size, process_shard=shard,
        num_workers=getattr(args, "loader_workers", 2))
    test = ScannetDataset(root=args.data, npoints=args.num_point,
                          split="test", batch_size=args.batch_size,
                          process_shard=shard)
    return train, test, "scannet"


def parse_model_kwargs(args, task) -> dict:
    """--model_kwargs JSON (+ --num_classes) -> model constructor kwargs.

    JSON lists become tuples RECURSIVELY: flax dataclass fields expect
    hashables, and nested widths like [[64,64],[128,128]] must become
    tuples of tuples, not a tuple of lists. Shared by train, evaluate,
    and visualize so an override-trained checkpoint restores everywhere.
    """
    model_kwargs = {}
    if getattr(args, "model_kwargs", None):
        import json

        def _tuplify(v):
            return tuple(_tuplify(x) for x in v) if isinstance(v, list) else v

        model_kwargs.update({
            k: _tuplify(v)
            for k, v in json.loads(args.model_kwargs).items()})
    if getattr(args, "num_classes", None) is not None:
        key = "num_classes" if task in ("cls", "sem_seg") else "num_parts"
        model_kwargs[key] = args.num_classes
    return model_kwargs


def make_sem_seg_eval_protocol(args, test_ds, shard):
    """Whole-scene + caliacc best-ckpt selection (scannet/train.py:167-174).

    The chopped (random-crop) eval reuses `test_ds`; the whole-scene tiler
    reads the same scenes (pickle root or the synthetic set)."""
    from pointnet2_tpu.data import ScannetDatasetWholeScene
    from pointnet2_tpu.evaluation.scannet_eval import (
        make_scannet_eval_protocol,
    )

    if args.synthetic or args.data is None:
        from pointnet2_tpu.data import make_synthetic_scenes

        whole = ScannetDatasetWholeScene(
            scenes=make_synthetic_scenes(2, seed=9),
            npoints=args.num_point, split="test",
            batch_size=args.batch_size)
    else:
        whole = ScannetDatasetWholeScene(
            root=args.data, npoints=args.num_point, split="test",
            batch_size=args.batch_size, process_shard=shard)
    return make_scannet_eval_protocol(test_ds, whole,
                                      batch_size=args.batch_size)


def main(argv=None) -> None:
    from pointnet2_tpu.train import TrainConfig, Trainer

    args = build_parser().parse_args(argv)
    if args.multihost:
        from pointnet2_tpu.parallel import multihost

        multihost.initialize()
    train_ds, test_ds, augment = make_datasets(args)
    task = MODEL_REGISTRY[args.model].task
    model_kwargs = parse_model_kwargs(args, task)
    eval_every = args.eval_every
    if eval_every is None:
        eval_every = 5 if task == "sem_seg" else 1
    config = TrainConfig(
        model=args.model, num_point=args.num_point,
        batch_size=args.batch_size, max_epoch=args.max_epoch,
        learning_rate=args.learning_rate, momentum=args.momentum,
        optimizer=args.optimizer, decay_step=args.decay_step,
        decay_rate=args.decay_rate, augment=augment,
        num_devices=args.num_devices, log_dir=args.log_dir,
        eval_every=eval_every, compute_dtype=args.dtype,
        watchdog_secs=args.watchdog_secs, remat=args.remat,
        steps_per_call=args.steps_per_call,
        model_kwargs=model_kwargs)
    trainer = Trainer(config)
    trainer.log(f"config: {vars(args)}")
    eval_protocol = None
    if task == "sem_seg" and not args.no_whole_scene_eval:
        import jax

        shard = ((jax.process_index(), jax.process_count())
                 if args.multihost and jax.process_count() > 1 else None)
        eval_protocol = make_sem_seg_eval_protocol(args, test_ds, shard)
    trainer.fit(train_ds, eval_dataset=test_ds, eval_protocol=eval_protocol)


if __name__ == "__main__":
    main()
