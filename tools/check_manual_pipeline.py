#!/usr/bin/env python
"""Exactness check: fused step with pipeline="manual" vs "auto" on the chip.

The manual mode replaces Mosaic's automatic window pipelining for the big
encoder-state inputs with explicit double-buffered make_async_copy DMA; the
compute body is byte-identical, so outputs must match bit-for-bit.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders, scn_cell
    from indonesian_image_captioning_tpu.ops.attention_pallas import pad_pixels
    from indonesian_image_captioning_tpu.ops.step_pallas import (
        fused_decode_step, pack_step_weights)

    ok = True
    for B, V, dtype in ((64, 6763, "bfloat16"), (256, 6763, "float32"),
                        (128, 38732, "bfloat16")):
        dt = jnp.dtype(dtype)
        cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                          dtype=dtype)
        params = decoders.cast_params(
            decoders.init_decoder(jax.random.key(0), cfg), dt)
        P, D = cfg.num_pixels, cfg.decoder_dim
        K = 5
        R = B * K
        F4 = 4 * cfg.factored_dim
        enc = (jax.random.normal(jax.random.key(1),
                                 (B, P, cfg.encoder_dim)) * 0.1).astype(dt)
        ea = attn.precompute(params["attention"], enc)
        tags = jax.random.uniform(jax.random.key(2), (B, cfg.semantic_dim))
        sx, sh = scn_cell.semantic_projections(params["decode_step"], tags)
        w = pack_step_weights(params, cfg, dt)
        kw = dict(
            num_pixels=P, vocab_size=V,
        )
        argv = (w, pad_pixels(enc), pad_pixels(ea),
                (jax.random.normal(jax.random.key(3),
                                   (R, cfg.embed_dim)) * 0.1).astype(dt),
                (jax.random.normal(jax.random.key(4), (R, D)) * 0.1)
                .astype(dt),
                jnp.zeros((R, D), dt),
                jnp.repeat(sx.reshape(B, F4), K, axis=0).astype(dt),
                jnp.repeat(sh.reshape(B, F4), K, axis=0).astype(dt))
        a = fused_decode_step(*argv, pipeline="auto", **kw)
        m = fused_decode_step(*argv, pipeline="manual", **kw)
        names = ("topv", "topi", "lse", "h", "c")
        for nm, x, y in zip(names, a, m):
            same = bool(jnp.array_equal(x, y))
            if not same:
                d = np.abs(np.asarray(x, np.float32)
                           - np.asarray(y, np.float32))
                print(f"B={B} V={V} {dtype}: {nm} MISMATCH "
                      f"max|d|={d.max():.3e} n={int((d > 0).sum())}")
                ok = False
        print(f"B={B} V={V} {dtype}: "
              + ("bit-exact" if ok else "see mismatches above"))
    print("MANUAL PIPELINE:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
