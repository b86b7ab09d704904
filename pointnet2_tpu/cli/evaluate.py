"""Evaluation CLI: restore a checkpoint and run the task's full protocol.

Replaces evaluate.py (vote-ensembled classification), part_seg/evaluate.py
(VOTE_NUM mIoU), and scannet/train.py's eval passes (whole-scene
voxel/calibrated accuracy).

Usage:
  python -m pointnet2_tpu.cli.evaluate --model pointnet2_cls_ssg \
      --log_dir log --num_votes 12 [--synthetic | --data ROOT]
"""

from __future__ import annotations

import argparse

import numpy as np

from pointnet2_tpu.models import MODEL_REGISTRY


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="pointnet2_cls_ssg",
                   choices=sorted(MODEL_REGISTRY))
    p.add_argument("--data", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=8)
    p.add_argument("--log_dir", default="log")
    p.add_argument("--ckpt", default="ckpt", help="checkpoint name in log_dir")
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_votes", type=int, default=12)
    p.add_argument("--normal", action="store_true")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--model_kwargs", type=str, default=None,
                   help="JSON dict of extra model constructor kwargs "
                        "(must match the trained config)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed; --batch_size is the "
                        "GLOBAL batch, data is sharded per host (parity "
                        "with cli.train --multihost)")
    p.add_argument("--out", default=None,
                   help="write the protocol metrics as JSON here "
                        "(primary process only)")
    return p


def main(argv=None) -> None:
    from pointnet2_tpu.cli.train import make_datasets
    from pointnet2_tpu.evaluation import evaluate_cls_voting
    from pointnet2_tpu.evaluation.part_miou import evaluate_part_seg_voting
    from pointnet2_tpu.evaluation.scannet_eval import (
        evaluate_scannet_chopped,
        evaluate_scannet_whole_scene,
    )
    from pointnet2_tpu.parallel.mesh import shard_batch
    from jax.sharding import PartitionSpec as P

    from pointnet2_tpu.parallel.mesh import DATA_AXIS
    from pointnet2_tpu.parallel.multihost import to_local_numpy
    from pointnet2_tpu.train import TrainConfig, Trainer
    from pointnet2_tpu.train import checkpoint as ckpt

    args = build_parser().parse_args(argv)
    if args.multihost:
        from pointnet2_tpu.parallel import multihost

        multihost.initialize()
    task = MODEL_REGISTRY[args.model].task
    _, test_ds, _ = make_datasets(args, test_only=True)
    from pointnet2_tpu.cli.train import parse_model_kwargs

    model_kwargs = parse_model_kwargs(args, task)
    config = TrainConfig(model=args.model, num_point=args.num_point,
                         batch_size=args.batch_size,
                         num_devices=args.num_devices, log_dir=args.log_dir,
                         model_kwargs=model_kwargs)
    trainer = Trainer(config)
    example = next(iter(test_ds.epoch()))
    state = trainer.init_state(trainer._device_view(example))
    state = ckpt.restore_checkpoint(args.log_dir, state, name=args.ckpt)
    trainer.log(f"restored {args.ckpt} at step {int(state.step)}")

    if task == "cls":
        def logits_fn(points):
            batch = {"points": np.asarray(points, np.float32),
                     "label": np.zeros(points.shape[0], np.int32)}
            db = shard_batch(trainer.mesh, trainer._device_view(batch))
            return to_local_numpy(trainer.eval_step(state, db),
                                  trainer.mesh, P(DATA_AXIS))

        results = evaluate_cls_voting(
            logits_fn, test_ds, num_votes=args.num_votes,
            num_classes=(args.num_classes
                         if args.num_classes is not None else 40),
            rng=0, log_fn=trainer.log)
    elif task in ("part_seg", "part_seg_one_hot"):
        def logits_fn(batch):
            db = shard_batch(trainer.mesh, trainer._device_view(
                {k: np.asarray(v) for k, v in batch.items()
                 if k != "nvalid"}))
            return to_local_numpy(trainer.eval_step(state, db),
                                  trainer.mesh, P(DATA_AXIS))

        results = evaluate_part_seg_voting(logits_fn, test_ds,
                                           num_votes=args.num_votes,
                                           rng=0, log_fn=trainer.log)
    else:  # sem_seg
        def logits_fn(batch):
            db = shard_batch(trainer.mesh, trainer._device_view(
                {k: np.asarray(v) for k, v in batch.items()
                 if k != "nvalid"}))
            return to_local_numpy(trainer.eval_step(state, db),
                                  trainer.mesh, P(DATA_AXIS))

        chopped = evaluate_scannet_chopped(logits_fn, test_ds, rng=0,
                                           log_fn=trainer.log)
        from pointnet2_tpu.data import (
            ScannetDatasetWholeScene,
            make_synthetic_scenes,
        )

        import jax

        shard = ((jax.process_index(), jax.process_count())
                 if args.multihost and jax.process_count() > 1 else None)
        if args.synthetic or args.data is None:
            whole = ScannetDatasetWholeScene(
                scenes=make_synthetic_scenes(2, seed=9),
                npoints=args.num_point, split="test")
        else:
            whole = ScannetDatasetWholeScene(root=args.data,
                                             npoints=args.num_point,
                                             split="test",
                                             process_shard=shard)
        whole_res = evaluate_scannet_whole_scene(
            logits_fn, whole, batch_size=args.batch_size,
            log_fn=trainer.log)
        results = {"chopped": chopped, "whole_scene": whole_res}

    if args.out:
        import json

        from pointnet2_tpu.parallel import multihost

        if multihost.is_primary():
            def _clean(v):
                if isinstance(v, dict):
                    return {k: _clean(x) for k, x in v.items()}
                if isinstance(v, np.ndarray):
                    return v.tolist()
                return v

            record = {"model": args.model, "ckpt": args.ckpt,
                      "step": int(state.step),
                      "num_votes": args.num_votes, "metrics": _clean(results)}
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)
            trainer.log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
