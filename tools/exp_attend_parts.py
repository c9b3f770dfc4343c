#!/usr/bin/env python
"""Dissect the fused-attention kernel cost on the real chip.

Builds stripped kernel variants at bench dims to locate where the
~2.8 ms/step (B=1024) actually goes:

  dma    — read enc+enc_att blocks, write one row per image (pure DMA)
  score  — + the K relu+mul+lane-reduce score passes
  soft   — + softmax
  awe    — + block-diagonal weighted sum (= full v3, no alpha)

Run AFTER any kernel change; pair with tools/profile_decode.py.
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
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        _compiler_params, pad_pixels)
    sys.path.insert(0, os.path.dirname(__file__))
    from profile_decode import loop_timeit

    B, K, P, E, A, D = 1024, 5, 196, 2048, 512, 512
    G, m = 32, 8
    dt = jnp.bfloat16
    params = attn.init_attention(jax.random.key(0), E, D, A, jnp.float32)
    params = jax.tree.map(lambda x: x.astype(dt), params)
    enc = (jax.random.normal(jax.random.key(1), (B, P, E)) * 0.1).astype(dt)
    enc_att = attn.precompute(params, enc)
    h = (jax.random.normal(jax.random.key(2), (B, K, D)) * 0.1).astype(dt)
    ep, eap = pad_pixels(enc), pad_pixels(enc_att)
    Pp = ep.shape[1]
    NEG_INF = float("-inf")

    def make_kernel(mode):
        def kernel(enc_ref, enc_att_ref, dec_ref, wf_ref, awe_ref, bd_ref):
            wf = wf_ref[:].astype(dt)
            for base in range(0, G, m):
                if mode == "awe":
                    bd_ref[:] = jnp.zeros_like(bd_ref)
                for j in range(m):
                    g = base + j
                    if mode == "dma":
                        awe_ref[g] = (enc_ref[g, :K, :]
                                      + enc_att_ref[g, :K, :1])
                        continue
                    ea = enc_att_ref[g]
                    dk = dec_ref[g]
                    cols = []
                    for k in range(K):
                        e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                        cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
                    att = jnp.concatenate(cols, axis=1).astype(jnp.float32)
                    if mode == "score":
                        awe_ref[g] = att[:K, :1] + enc_ref[g, :K, :]
                        continue
                    rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                    att = jnp.where(rows < P, att, NEG_INF)
                    mx = jnp.max(att, axis=0, keepdims=True)
                    ex = jnp.exp(att - mx)
                    s = jnp.sum(ex, axis=0, keepdims=True)
                    alpha = ex / s
                    if mode == "soft":
                        awe_ref[g] = alpha[:K, :1] + enc_ref[g, :K, :]
                        continue
                    bd_ref[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                        alpha.astype(bd_ref.dtype)
                if mode == "awe":
                    enc_grp = enc_ref[base:base + m].reshape(m * Pp, E)
                    awe = jax.lax.dot_general(
                        bd_ref[:], enc_grp, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    awe_ref[base:base + m] = awe.reshape(m, K, E).astype(dt)

        return kernel

    def call(mode):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Pp, A), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, K, A), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, A), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, K, E), dt),
            scratch_shapes=[pltpu.VMEM((m * Pp, m * K), dt)],
            compiler_params=_compiler_params(),
        )

    wf = params["full_att"]["w"].astype(jnp.float32).reshape(1, A)

    def feed(h, awe):
        return (h * 0.999 + awe[..., :h.shape[-1]] * 1e-3).astype(h.dtype)

    consts = {"att": params, "enc_p": ep, "enc_att_p": eap, "wf": wf}
    for mode in ("dma", "score", "soft", "awe"):
        def body(_, h, cs, mode=mode):
            dec = (h @ cs["att"]["decoder_att"]["w"]
                   + cs["att"]["decoder_att"]["b"]).astype(dt)
            awe = call(mode)(cs["enc_p"], cs["enc_att_p"], dec, cs["wf"])
            return feed(h, awe)
        try:
            t = loop_timeit(body, h, consts)
            print("%-6s %8.3f ms/step" % (mode, t * 1e3))
        except Exception as e:
            print("%-6s FAILED: %s: %s" % (mode, type(e).__name__,
                                           str(e)[:300]))


if __name__ == "__main__":
    main()
