#!/usr/bin/env python
"""Compiled-vs-interpret diff for ONE fused_decode_span call on the chip.

tests/test_span_fused.py proves the span kernel's math matches the step
engine in interpret mode; tools/exp_span_scores.py showed the COMPILED
kernel's decodes score +13 higher than the engine — a semantic bug
somewhere between the Python kernel body and Mosaic.  This isolates it:
same inputs, one span call, interpret=True vs False, elementwise diffs
per output.  Association noise is ~1e-6 on vals; a bookkeeping bug is
O(0.1+) or an index mismatch in words/parents far beyond tie rate.
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
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        _round_up, pad_pixels)
    from indonesian_image_captioning_tpu.ops.span_pallas import (
        NEG, fused_decode_span)
    from indonesian_image_captioning_tpu.ops.step_pallas import (
        pack_step_weights)

    B, V, K, S = 16, 6763, 5, 4
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="float32")
    dt = jnp.float32
    params = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), cfg), dt)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, 2048)) * 0.1
           ).astype(dt)
    tags = jax.random.uniform(jax.random.key(2), (B, 1000)).astype(dt)

    enc_p = pad_pixels(enc)
    ea_p = pad_pixels(attn.precompute(params["attention"], enc))
    weights = pack_step_weights(params, cfg, dt)
    Vp = _round_up(V, 128)
    emb_tab = jnp.pad(params["embedding"].astype(dt), ((0, Vp - V), (0, 0)))
    F4 = 4 * cfg.factored_dim
    sx, sh = scn_cell.semantic_projections(params["decode_step"], tags)
    tile_k = lambda x: jnp.repeat(x, K, axis=0)
    semx = tile_k(sx.reshape(B, F4)).astype(dt)
    semh = tile_k(sh.reshape(B, F4)).astype(dt)
    h0, c0 = decoders.init_hidden_state(params, enc)
    R = B * K
    rows_r = jnp.arange(R)[:, None]
    args = (weights, emb_tab, enc_p, ea_p, semx, semh,
            tile_k(h0).astype(dt), tile_k(c0).astype(dt),
            jnp.where(rows_r % K == 0, 0.0, NEG).astype(jnp.float32),
            jnp.full((R, 1), V - 2, jnp.int32),
            jnp.full((B, 1), K, jnp.int32))
    kw = dict(span=S, num_pixels=196, end_id=V - 1, vocab_size=V,
              cell="scn")

    names = ("words", "parents", "vals", "h", "c", "sc", "pw", "alive")
    a = [np.asarray(x) for x in
         jax.device_get(fused_decode_span(*args, interpret=True, **kw))]
    b = [np.asarray(x) for x in
         jax.device_get(fused_decode_span(*args, interpret=False, **kw))]
    for nm, x, y in zip(names, a, b):
        if x.dtype.kind in "iu":
            neq = int((x != y).sum())
            print(f"{nm:8s} int mismatches: {neq}/{x.size}")
        else:
            d = np.abs(x.astype(np.float64) - y.astype(np.float64))
            print(f"{nm:8s} max|d| {d.max():.3e}  mean|d| {d.mean():.3e}")
    # per-step val diff to locate the first diverging span step
    for s in range(S):
        d = np.abs(a[2][:, s] - b[2][:, s]).max()
        print(f"step {s}: max|vals diff| {d:.3e}")


if __name__ == "__main__":
    main()
