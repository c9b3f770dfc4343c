#!/usr/bin/env python
"""Standalone cost of the decode kernels' in-VMEM top-K extraction.

The span/step kernels extract the per-row top-K from the (R, Vp) f32
logit work array with K iterative max/argmax/mask rounds (exact
lax.top_k first-occurrence tie order — ops/span_pallas.py head section).
Each round is ~3 full VPU passes over the work array; at bench dims
(R = G*K = 160 rows, Vp = 6,784, 51 steps, 32 chunks) that is a
non-trivial slice of the 195 ms span decode.  This tool times a Pallas
kernel that does ONLY the seed + logsumexp + extraction at exactly those
shapes and grid, isolating the extraction's share so optimisation effort
can be sized honestly (BASELINE.md decode MFU row names this as the
headroom).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=160)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--steps", type=int, default=51)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", default="full,seedonly")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, V, K = args.rows, args.vocab, args.k
    Vp = -(-V // 128) * 128
    NEG = -1e30

    def make(extract: bool):
        def kernel(lg_ref, out_v, out_i, work_scr):
            cols_v = jax.lax.broadcasted_iota(jnp.int32, (R, Vp), 1)
            lg = lg_ref[0].astype(jnp.float32)
            mrow = jnp.max(lg, axis=1, keepdims=True)
            work_scr[:] = lg - mrow
            logs = jnp.log(jnp.sum(jnp.exp(work_scr[:]), axis=1,
                                   keepdims=True))
            if extract:
                tvs, tis = [], []
                for _ in range(K):
                    v = jnp.max(work_scr[:], axis=1, keepdims=True)
                    a = jnp.argmax(work_scr[:], axis=1)[:, None]
                    tvs.append(v)
                    tis.append(a)
                    work_scr[:] = jnp.where(cols_v == a, NEG, work_scr[:])
                out_v[0] = jnp.concatenate(tvs, axis=1) - logs
                out_i[0] = jnp.concatenate(tis, axis=1)
            else:
                out_v[0] = jnp.broadcast_to(logs, (R, K))
                out_i[0] = jnp.zeros((R, K), jnp.int32)

        grid = (args.chunks, args.steps)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, R, Vp), lambda c, s: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((1, R, K), lambda c, s: (c, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, R, K), lambda c, s: (c, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((args.chunks, R, K),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((args.chunks, R, K),
                                            jnp.int32)),
            scratch_shapes=[pltpu.VMEM((R, Vp), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )

    rng = np.random.default_rng(0)
    lg = jax.device_put(rng.standard_normal(
        (args.chunks, R, Vp), np.float32).astype(jnp.bfloat16))

    print(f"R={R} Vp={Vp} K={K} grid=({args.chunks},{args.steps})")
    for mode in args.mode.split(","):
        fn = jax.jit(make(mode == "full"))
        v, i = fn(lg)
        float(jax.device_get(v[0, 0, 0]))
        t0 = time.time()
        for _ in range(args.iters):
            v, i = fn(lg)
        float(jax.device_get(v[0, 0, 0]))
        d = (time.time() - t0) / args.iters * 1e3
        print(f"  {mode:9s}: {d:7.2f} ms "
              f"({d / args.steps / args.chunks * 1e3:6.1f} us/invocation)")


if __name__ == "__main__":
    main()
