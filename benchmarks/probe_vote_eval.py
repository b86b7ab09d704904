"""Wall-clock of a FULL 12-vote test-split protocol eval, before/after.

The r4 protocol issued one device dispatch per vote per batch
(evaluate.py:126-141 parity); on this platform's ~30-60 ms dispatch round
trip that cost ~13x the actual compute (SERVING_r04.json). r5 stacks the
votes along the batch axis — one dispatch per eval batch. This probe
times the complete 12-vote eval of the procedural ModelNet40 test split
(2480 shapes, B=16) both ways through the real jitted eval step.

Run: python benchmarks/probe_vote_eval.py [--votes 12] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/procedural_modelnet40")
    ap.add_argument("--votes", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from jax.sharding import PartitionSpec as P

    from pointnet2_tpu.data.modelnet import ModelNetH5Dataset
    from pointnet2_tpu.data import augment as A
    from pointnet2_tpu.evaluation import evaluate_cls_voting
    from pointnet2_tpu.parallel.mesh import DATA_AXIS, shard_batch
    from pointnet2_tpu.parallel.multihost import to_local_numpy
    from pointnet2_tpu.train import TrainConfig, Trainer

    ds = ModelNetH5Dataset(f"{args.data}/test_files.txt",
                           batch_size=args.batch, npoints=1024,
                           shuffle=False)
    config = TrainConfig(model="pointnet2_cls_ssg", num_point=1024,
                         batch_size=args.batch, log_dir="/tmp/probe_vote")
    trainer = Trainer(config)
    example = next(iter(ds.epoch()))
    state = trainer.init_state(trainer._device_view(example))

    def logits_fn(points):
        batch = {"points": np.asarray(points, np.float32),
                 "label": np.zeros(points.shape[0], np.int32)}
        db = shard_batch(trainer.mesh, trainer._device_view(batch))
        return to_local_numpy(trainer.eval_step(state, db),
                              trainer.mesh, P(DATA_AXIS))

    res = {"backend": jax.default_backend(), "num_votes": args.votes,
           "batch": args.batch, "shapes": len(ds),
           "batches": ds.num_batches()}

    # warm both executables (V*B and B shapes) outside the timed regions
    logits_fn(example["points"][: args.batch].repeat(args.votes, axis=0)
              .reshape(args.votes * args.batch, 1024, 3))
    logits_fn(example["points"][: args.batch])

    t0 = time.perf_counter()
    evaluate_cls_voting(logits_fn, ds, num_votes=args.votes,
                        rng=0, log_fn=lambda s: None)
    res["batched_s"] = round(time.perf_counter() - t0, 2)
    print("batched (one dispatch/batch):", res["batched_s"], "s", flush=True)

    # the r4 per-vote-dispatch protocol, same rng stream and metrics
    def sequential_eval():
        g = np.random.default_rng(0)
        correct = seen = 0
        for batch in ds.epoch(augment=False):
            pts, label, nvalid = (batch["points"], batch["label"],
                                  batch["nvalid"])
            total = None
            for v in range(args.votes):
                perm = g.permutation(pts.shape[1])
                rot = A.rotate_point_cloud_by_angle(
                    pts[:, perm, :], v / float(args.votes) * 2 * np.pi)
                lg = np.asarray(logits_fn(rot), np.float64)
                total = lg if total is None else total + lg
            pred = total.argmax(axis=1)[:nvalid]
            correct += int((pred == label[:nvalid]).sum())
            seen += nvalid
        return correct / max(seen, 1)

    t0 = time.perf_counter()
    sequential_eval()
    res["sequential_s"] = round(time.perf_counter() - t0, 2)
    print("sequential (one dispatch/vote):", res["sequential_s"], "s",
          flush=True)
    res["speedup"] = round(res["sequential_s"] / res["batched_s"], 2)
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
