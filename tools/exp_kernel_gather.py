#!/usr/bin/env python
"""Probe Mosaic support for in-kernel dynamic gathers (megakernel design).

The full-decode kernel needs per-step embedding rows at runtime-computed
token ids.  Three candidate lowerings, probed for compile+run success and
cost on the real chip:

  a) jnp.take(table, ids, axis=0) inside the kernel (tpu.DynamicGatherOp?)
  b) one-hot matmul (ids == iota) @ table  (always works, streams table)
  c) per-row pl.ds dynamic-slice loads, unrolled
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
    sys.path.insert(0, os.path.dirname(__file__))
    from profile_decode import loop_timeit

    V, Emb, R = 6784, 512, 160
    table = (jax.random.normal(jax.random.key(0), (V, Emb))
             * 0.1).astype(jnp.bfloat16)
    ids = jax.random.randint(jax.random.key(1), (R,), 0, 6763, jnp.int32)

    def call(kernel):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, Emb), jnp.bfloat16),
        )

    # ids arrive as (R, 1) int32 in VMEM
    ids2 = ids[:, None]

    def k_take(table_ref, ids_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], ids_ref[:, 0], axis=0)

    def k_onehot(table_ref, ids_ref, out_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)
        oh = (cols == ids_ref[:]).astype(table_ref.dtype)
        out_ref[:] = jax.lax.dot_general(
            oh, table_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    def k_dslice(table_ref, ids_ref, out_ref):
        for r in range(R):
            i = ids_ref[r, 0]
            out_ref[r, :] = table_ref[pl.ds(i, 1), :][0]

    ref = jnp.take(table, ids, axis=0)
    for name, k in (("take", k_take), ("onehot", k_onehot),
                    ("dslice", k_dslice)):
        try:
            out = jax.jit(lambda t, i: call(k)(t, i))(table, ids2)
            ok = bool(jnp.all(out == ref))
            print(f"{name}: compiles+runs, exact={ok}")

            def body(_, c, cs, k=k):
                idx = (jnp.abs(c) % 6763).astype(jnp.int32)
                out = call(k)(cs["table"], idx)
                return idx + out[:, :1].astype(jnp.int32)

            t = loop_timeit(body, ids2, {"table": table})
            print(f"{name}: {t*1e6:9.1f} us/call")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
