#!/usr/bin/env python
"""Round-2 attention-step shootout on the real chip.

Candidates (all exact, module docstrings):
  * attend          — XLA, (B, K, P, A) relu layout (round-1 default)
  * attend_pk       — XLA, (B, P, K, A) layout: beams innermost so a fused
                      consumer re-reads enc_att rows from registers
  * attend_fused_mxu — Pallas, full_att contraction on the MXU (G sweep)
  * attend_fused    — round-1 Pallas kernel (VPU lane-reduce), reference

In-loop fori_loop timing; see tools/profile_decode.py for methodology.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOOP_ITERS = 50


def loop_timeit(make_body, carry, consts, n=3):
    import jax

    @jax.jit
    def run(carry, consts):
        return jax.lax.fori_loop(
            0, LOOP_ITERS, lambda i, c: make_body(i, c, consts), carry)

    r = run(carry, consts)
    jax.device_get(jax.tree.leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = run(carry, consts)
    jax.device_get(jax.tree.leaves(r)[0])
    return (time.time() - t0) / (n * LOOP_ITERS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-old", action="store_true")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        attend_fused, attend_fused_mxu, pad_pixels)

    dt = jnp.dtype(args.dtype)
    B, K = args.batch, args.beam
    cfg = ModelConfig(model_type="attention_scn", vocab_size=1000,
                      dtype=args.dtype)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params, dt)
    P, E, A, D = cfg.num_pixels, cfg.encoder_dim, cfg.attention_dim, \
        cfg.decoder_dim
    print(f"dims: B={B} K={K} P={P} E={E} A={A} D={D} dtype={dt}")

    enc = (jax.random.normal(jax.random.key(1), (B, P, E)) * 0.1).astype(dt)
    enc_att = attn.precompute(params["attention"], enc)
    h = (jax.random.normal(jax.random.key(2), (B, K, D)) * 0.1).astype(dt)

    def feed(h, awe):
        return (h * 0.999 + awe[..., :h.shape[-1]] * 1e-3).astype(h.dtype)

    consts = {"att": params["attention"], "enc": enc, "enc_att": enc_att,
              "enc_p": pad_pixels(enc), "enc_att_p": pad_pixels(enc_att)}

    def xla_body(_, h, cs):
        awe, _ = attn.attend(cs["att"], cs["enc"][:, None],
                             cs["enc_att"][:, None], h)
        return feed(h, awe)

    t = loop_timeit(xla_body, h, consts)
    print(f"attend XLA (B,K,P,A):      {t*1e3:8.3f} ms/step")

    def xla_pk_body(_, h, cs):
        awe, _ = attn.attend_pk(cs["att"], cs["enc"], cs["enc_att"], h)
        return feed(h, awe)

    t = loop_timeit(xla_pk_body, h, consts)
    print(f"attend XLA (B,P,K,A):      {t*1e3:8.3f} ms/step")

    for gtile in (0, 4, 8, 16):
        def mxu_body(_, h, cs, gtile=gtile):
            awe, _ = attend_fused_mxu(cs["att"], cs["enc_p"][:, None],
                                      cs["enc_att_p"][:, None], h,
                                      p_actual=P, img_tile=gtile)
            return feed(h, awe)
        try:
            t = loop_timeit(mxu_body, h, consts)
            print(f"attend Pallas MXU G={gtile:<3d}:    {t*1e3:8.3f} ms/step")
        except Exception as e:
            print(f"attend Pallas MXU G={gtile} FAILED: "
                  f"{type(e).__name__}: {e}")

    if not args.skip_old:
        def old_body(_, h, cs):
            awe, _ = attend_fused(cs["att"], cs["enc_p"][:, None],
                                  cs["enc_att_p"][:, None], h, p_actual=P,
                                  img_tile=4)
            return feed(h, awe)
        t = loop_timeit(old_body, h, consts)
        print(f"attend Pallas round-1 G=4: {t*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
