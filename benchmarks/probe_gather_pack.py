"""On-chip probe: can the narrow-lane lifted gather be packed wider?

The lifted one-hot gathers run ~36% MXU at the sem-seg sa1 / MSG-5k
shapes because the lifted feature width (mlp[0] = 32) uses 32 of each
128-lane MXU output tile (docs/PERF.md). This probe measures the r5
VERDICT's two candidate layouts against the current one, fwd and
fwd+bwd, at the two slowest encoders' shapes:

1. `kmajor` (current): out (B, K, C) = onehot(B,K,N) @ values(B,N,C) —
   output lanes = C = 32.
2. `cmajor` (transposed output): out (B, C, K) = values^T @ onehot^T —
   output lanes = K = M*nsample (large), sublanes = C (the MXU emits
   8-sublane x 128-lane tiles, so a short sublane dim is cheap while a
   short lane dim wastes the tile). The backward scatter transposes to
   (B, C, N): lanes = N, also full.
3. `packed` (block-diagonal across MSG scales): stack the scales'
   one-hots along K and concat their lifted values along C in one
   matmul, slicing each scale's rows/columns out — lane use rises to
   sum(C_s) but every scale pays every other scale's columns.

Each layout is also measured through a consumer mini-chain
(affine+relu -> next dense -> max-pool over the group) so relayout
costs at the boundary are captured, not just the bare gather.

Run (chip): python benchmarks/probe_gather_pack.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_tpu.utils.profiling import time_op_loop

DT = jnp.bfloat16


def onehot(idx_flat, n, dtype=DT):
    return jax.nn.one_hot(idx_flat, n, dtype=dtype)


def run_shape(tag, B, N, M, S, C1, C2, rng, res):
    K = M * S
    vals = jnp.asarray(rng.rand(B, N, C1).astype(np.float32)).astype(DT)
    idx = jnp.asarray(rng.randint(0, N, (B, K)).astype(np.int32))
    a = jnp.asarray(rng.rand(C1).astype(np.float32)).astype(DT)
    b = jnp.asarray(rng.rand(C1).astype(np.float32)).astype(DT)
    W2 = jnp.asarray(rng.rand(C1, C2).astype(np.float32)).astype(DT)
    prec = jax.lax.Precision.DEFAULT

    def g_kmajor(v):
        oh = onehot(idx, N)
        return jnp.einsum("bkn,bnc->bkc", oh, v, precision=prec)

    def g_cmajor(v):
        oh = onehot(idx, N)
        return jnp.einsum("bnc,bkn->bck", v, oh, precision=prec)

    def chain_kmajor(v):
        g = g_kmajor(v)  # (B, K, C1)
        h = jax.nn.relu(g * a + b)
        d = jnp.einsum("bkc,cd->bkd", h, W2, precision=prec)
        return d.reshape(B, M, S, C2).max(axis=2)

    def chain_cmajor(v):
        g = g_cmajor(v)  # (B, C1, K)
        h = jax.nn.relu(g * a[:, None] + b[:, None])
        d = jnp.einsum("cd,bck->bdk", W2, h, precision=prec)
        return d.reshape(B, C2, M, S).max(axis=3)

    row = {}
    for name, gfn, cfn in (("kmajor", g_kmajor, chain_kmajor),
                           ("cmajor", g_cmajor, chain_cmajor)):
        fwd = time_op_loop(gfn, vals, iters=30) * 1e3
        bwd = time_op_loop(
            lambda v, gfn=gfn: jax.grad(lambda q: jnp.sum(jnp.square(
                gfn(q).astype(jnp.float32))))(v), vals, iters=30) * 1e3
        cfwd = time_op_loop(cfn, vals, iters=30) * 1e3
        cbwd = time_op_loop(
            lambda v, cfn=cfn: jax.grad(lambda q: jnp.sum(jnp.square(
                cfn(q).astype(jnp.float32))))(v), vals, iters=30) * 1e3
        row[name] = {"gather_fwd_ms": round(fwd, 3),
                     "gather_fwdbwd_ms": round(bwd, 3),
                     "chain_fwd_ms": round(cfwd, 3),
                     "chain_fwdbwd_ms": round(cbwd, 3)}
    # numeric check (bf16-exact: one-hot contraction)
    gk = np.asarray(g_kmajor(vals).astype(jnp.float32))
    gc = np.asarray(g_cmajor(vals).astype(jnp.float32))
    row["err"] = float(np.abs(gk - np.moveaxis(gc, 1, 2)).max())
    res[tag] = row
    print(tag, json.dumps(row), flush=True)


def run_packed_msg(tag, B, N, M, scales, rng, res):
    """scales: list of (S, C) per MSG scale."""
    vals = [jnp.asarray(rng.rand(B, N, c).astype(np.float32)).astype(DT)
            for _, c in scales]
    idxs = [jnp.asarray(rng.randint(0, N, (B, M * s)).astype(np.int32))
            for s, _ in scales]
    prec = jax.lax.Precision.DEFAULT

    def separate(vs):
        outs = [jnp.einsum("bkn,bnc->bkc", onehot(i, N), v, precision=prec)
                for i, v in zip(idxs, vs)]
        return outs

    def packed(vs):
        oh = jnp.concatenate([onehot(i, N) for i in idxs], axis=1)
        vcat = jnp.concatenate(vs, axis=-1)
        big = jnp.einsum("bkn,bnc->bkc", oh, vcat, precision=prec)
        outs = []
        k0 = c0 = 0
        for (s, c) in scales:
            outs.append(big[:, k0:k0 + M * s, c0:c0 + c])
            k0 += M * s
            c0 += c
        return outs

    row = {}
    for name, fn in (("separate", separate), ("packed", packed)):
        fwd = time_op_loop(lambda v0, fn=fn: sum(
            jnp.sum(o.astype(jnp.float32)) for o in fn([v0] + vals[1:])),
            vals[0], iters=30) * 1e3
        bwd = time_op_loop(
            lambda v0, fn=fn: jax.grad(lambda q: sum(
                jnp.sum(jnp.square(o.astype(jnp.float32)))
                for o in fn([q] + vals[1:])))(v0), vals[0], iters=30) * 1e3
        row[name] = {"fwd_ms": round(fwd, 3), "fwdbwd_ms": round(bwd, 3)}
    res[tag] = row
    print(tag, json.dumps(row), flush=True)


def main():
    rng = np.random.RandomState(0)
    res = {"backend": jax.default_backend()}
    # (tag, B, N, M, S, C1, C2)
    run_shape("semseg_sa1", 16, 8192, 1024, 32, 32, 32, rng, res)
    run_shape("msg5k_sa1_s0", 8, 5000, 512, 128, 32, 32, rng, res)
    run_shape("cls_sa1", 32, 1024, 512, 32, 32, 32, rng, res)
    # MSG-5k sa1: 3 scales, nsample 128 each, lifted widths 32/64/64
    run_packed_msg("msg5k_sa1_packed", 8, 5000, 512,
                   [(128, 32), (128, 64), (128, 64)], rng, res)
    print(json.dumps(res, indent=1))
    with open("/tmp/probe_gather_pack.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
