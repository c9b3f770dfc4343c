#!/usr/bin/env python
"""Pallas DMA bandwidth probe: what block shape reaches the XLA rate?

XLA read-reduce streams 872 MB at ~623 GB/s on this chip; the v3 attention
kernel's pipeline measured ~361 GB/s (tools/exp_attend_parts.py).  Sweeps
grid/block configurations of a pure-read kernel over the same 872 MB
enc tensor to find the fastest DMA schedule.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        _compiler_params)
    sys.path.insert(0, os.path.dirname(__file__))
    from profile_decode import loop_timeit

    B, Pp, E = 1024, 208, 2048
    dt = jnp.bfloat16
    x3 = (jax.random.normal(jax.random.key(0), (B, Pp, E))).astype(dt)
    x2 = x3.reshape(B * Pp, E)
    nbytes = x3.size * 2

    def probe3(G):
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:, :1, :1].astype(jnp.float32)

        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, 1, 1), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            compiler_params=_compiler_params(),
        )

    def probe2(rows):
        R = B * Pp

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:8, :].astype(jnp.float32)

        return pl.pallas_call(
            kernel,
            grid=(R // rows,),
            in_specs=[pl.BlockSpec((rows, E), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, E), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, E), jnp.float32),
            compiler_params=_compiler_params(),
        )

    def run(name, call, x):
        def body(_, c, cs):
            o = call(cs["x"] if c.dtype == jnp.float32 else cs["x"])
            if isinstance(o, tuple):
                o = o[0]
            return c * 0.5 + jnp.sum(o) * 1e-12

        try:
            t = loop_timeit(body, jnp.float32(0.1), {"x": x})
            print("%-22s %7.3f ms  %5.0f GB/s"
                  % (name, t * 1e3, nbytes / t / 1e9))
        except Exception as e:
            print("%-22s FAILED %s: %s" % (name, type(e).__name__,
                                           str(e)[:160]))

    for G in (8, 16, 32, 64, 128):
        run(f"3d G={G}", probe3(G), x3)
    for rows in (1024, 2048, 4096, 8192, 16384):
        run(f"2d rows={rows}", probe2(rows), x2)


if __name__ == "__main__":
    main()
