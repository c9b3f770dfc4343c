#!/usr/bin/env python
"""Dissect the fused-STEP kernel cost on the real chip.

Times the production fused_decode_step at flagship bench dims with one
stage ablated at a time (ops/step_pallas.py `ablate=` hook — the DMA
schedule stays identical, so under the pipeline's DMA/compute overlap the
deltas locate which stage sets the kernel's critical path):

  full          — the production kernel
  dma           — windows fetched, no compute (the pipeline's DMA floor)
  attend_const  — constant attention scores (skips the K relu passes)
  no_cell       — identity recurrence
  no_head       — skip logits + top-K

Run AFTER any step_pallas.py change; pair with tools/profile_decode.py.
A variant ~= full means that stage is NOT on the critical path; a big
drop means it is.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--img_tile", type=int, default=32)
    ap.add_argument("--modes", default="full,dma,attend_const,no_cell,"
                    "no_head")
    ap.add_argument("--pipeline", default="auto",
                    choices=("auto", "manual"),
                    help="window pipelining: Mosaic automatic or explicit "
                    "double-buffered make_async_copy")
    ap.add_argument("--semantics", default=None,
                    choices=(None, "parallel", "arbitrary"),
                    help="override the kernel grid dimension_semantics")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders, scn_cell
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        pad_pixels)
    from indonesian_image_captioning_tpu.ops.step_pallas import (
        fused_decode_step, pack_step_weights)
    sys.path.insert(0, os.path.dirname(__file__))
    from profile_decode import loop_timeit

    if args.semantics:
        from jax.experimental.pallas import tpu as pltpu
        from indonesian_image_captioning_tpu.ops import step_pallas
        from indonesian_image_captioning_tpu.ops.attention_pallas import (
            _VMEM_LIMIT)
        step_pallas._compiler_params = lambda: pltpu.CompilerParams(
            dimension_semantics=(args.semantics,),
            vmem_limit_bytes=_VMEM_LIMIT)
        print(f"dimension_semantics override: {args.semantics}")

    dt = jnp.dtype(args.dtype)
    B, K, V = args.batch, args.beam, args.vocab
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype=args.dtype)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params, dt)
    P, E, D = cfg.num_pixels, cfg.encoder_dim, cfg.decoder_dim
    F4 = 4 * cfg.factored_dim

    enc = (jax.random.normal(jax.random.key(1), (B, P, E)) * 0.1).astype(dt)
    enc_att = attn.precompute(params["attention"], enc)
    tags = jax.random.uniform(jax.random.key(2), (B, cfg.semantic_dim))
    sx, sh = scn_cell.semantic_projections(params["decode_step"], tags)
    weights = pack_step_weights(params, cfg, dt)
    R = B * K
    consts = {
        "w": weights,
        "enc_p": pad_pixels(enc),
        "ea_p": pad_pixels(enc_att),
        "emb": (jax.random.normal(jax.random.key(3), (R, cfg.embed_dim))
                * 0.1).astype(dt),
        "semx": jnp.repeat(sx.reshape(B, F4), K, axis=0).astype(dt),
        "semh": jnp.repeat(sh.reshape(B, F4), K, axis=0).astype(dt),
    }
    h0 = (jax.random.normal(jax.random.key(4), (R, D)) * 0.1).astype(dt)
    c0 = jnp.zeros((R, D), dt)
    print(f"dims: B={B} K={K} P={P} E={E} D={D} V={V} dtype={dt} "
          f"G<={args.img_tile} m={args.group}")

    for mode in args.modes.split(","):
        if mode == "xla_stream":
            # Same-process bandwidth calibration: one XLA pass over the
            # same enc/ea bytes the kernel windows stream per step.
            def sbody(_, carry, cs):
                h, c = carry
                s = (jnp.sum(cs["enc_p"], axis=(1, 2))
                     + jnp.sum(cs["ea_p"], axis=(1, 2)))      # (B,)
                return (h + 1e-6 * jnp.repeat(s, K)[:, None].astype(dt), c)

            t = loop_timeit(sbody, (h0, c0), consts)
            gb = (consts["enc_p"].size + consts["ea_p"].size) * 2 / 1e9
            print("%-13s %8.3f ms/step  (%.0f GB/s)"
                  % (mode, t * 1e3, gb / t))
            continue
        pipe = args.pipeline
        if mode == "full_manual":
            ab, pipe = None, "manual"
        else:
            ab = None if mode == "full" else mode

        def body(_, carry, cs, ab=ab, pipe=pipe):
            h, c = carry
            topv, topi, lse, h_new, c_new = fused_decode_step(
                cs["w"], cs["enc_p"], cs["ea_p"], cs["emb"], h, c,
                cs["semx"], cs["semh"], num_pixels=P,
                img_tile=args.img_tile, group=args.group,
                vocab_size=V, ablate=ab, pipeline=pipe)
            return (h_new * 0.999 + 1e-3 * lse.astype(dt), c_new)

        try:
            t = loop_timeit(body, (h0, c0), consts)
            print("%-13s %8.3f ms/step" % (mode, t * 1e3))
        except Exception as e:
            print("%-13s FAILED: %s: %s" % (mode, type(e).__name__,
                                            str(e)[:300]))


if __name__ == "__main__":
    main()
