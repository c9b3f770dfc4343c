#!/usr/bin/env python
"""Floor-probe the span decode kernel's SELECTION BOOKKEEPING
(VERDICT r3 #4): the non-matmul, non-DMA share of the beam step — the
per-lane top-K extraction (already floor-probed standalone in
exp_topk_floor), the K*K flat merge, the record emission, the
retire/alive masks + (G,K)->(R,1) one-hot layout moves, and the (h, c)
parent-reorder one-hot matmuls.

Method: ablated span kernels (ops/span_pallas._make_kernel ablate=...)
that replace ONE component with slices/passthroughs (values wrong,
timing honest), driven through 13 sequential span calls = a full
52-step beam-5 decode at production shapes, interleaved in one process.

Reference anchor: the reference's beam hot loop
(/root/reference/models/decoders/attention_scn.py:217-290) does this
bookkeeping in Python per step; here it is the VPU tail of each span.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--span", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", default="all",
                    help="run a single probe (debug): None, noextract, ...")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders, scn_cell
    from indonesian_image_captioning_tpu.ops import span_pallas as sp
    from indonesian_image_captioning_tpu.ops import step_pallas
    from indonesian_image_captioning_tpu.ops.attention_pallas import \
        pad_pixels

    B, K, V = args.batch, 5, args.vocab
    dt = jnp.dtype(args.dtype)
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    params = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), cfg), dt)
    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal(
        (B, 196, 2048)) * 0.1).astype(np.float32)).astype(dt)
    tags = jax.device_put(
        rng.random((B, 1000)).astype(np.float32)).astype(dt)

    enc_p = pad_pixels(enc)
    ea_p = pad_pixels(attn.precompute(params["attention"], enc))
    weights = step_pallas.pack_step_weights(params, cfg, dt)
    Vp = -(-V // 128) * 128
    emb_tab = jnp.pad(params["embedding"].astype(jnp.float32)
                      if dt == jnp.float32 else params["embedding"],
                      ((0, Vp - V), (0, 0)))
    sx, sh = scn_cell.semantic_projections(params["decode_step"], tags)
    F4 = 4 * cfg.factored_dim
    # per-LANE semantic rows (R = B*K)
    semx = jnp.repeat(sx.reshape(B, F4), K, axis=0).astype(dt)
    semh = jnp.repeat(sh.reshape(B, F4), K, axis=0).astype(dt)
    h0, c0 = decoders.init_hidden_state(params, enc)
    R = B * K
    h = jnp.repeat(h0, K, axis=0).astype(dt)
    c = jnp.repeat(c0, K, axis=0).astype(dt)
    NEG = -1e9
    sc = jnp.where(
        (jnp.arange(R) % K == 0)[:, None], 0.0, NEG).astype(jnp.float32)
    pw = jnp.full((R, 1), V - 2, jnp.int32)
    alive = jnp.full((B, 1), K, jnp.int32)
    S = args.span
    n_spans = 52 // S

    def full_decode(abl):
        st = (h, c, sc, pw, alive)
        outs = None
        for _ in range(n_spans):
            outs = sp.fused_decode_span(
                weights, emb_tab, enc_p, ea_p, semx, semh, *st,
                span=S, num_pixels=196, end_id=V - 1, interpret=False,
                vocab_size=V, ablate=abl)
            st = outs[3:]
        return outs[2]          # vals of the last span

    probes = [p for p in (None, "noextract", "nomerge", "norecords",
                          "nobook", "noreorder")
              if args.only in ("all", str(p))]
    ms = {}
    for abl in probes:
        try:
            jax.device_get(full_decode(abl).ravel()[0])   # compile+warm
            print(f"  compiled {abl}", flush=True)
        except Exception as ex:
            print(f"  {abl}: COMPILE/RUN FAIL {str(ex)[:140]}", flush=True)
            ms[abl] = None
    for abl in probes:
        if ms.get(abl, 0) is None:
            continue
        t0 = time.time()
        for _ in range(args.iters):
            out = full_decode(abl)
        float(jax.device_get(out.ravel()[0]))
        ms[abl] = (time.time() - t0) / args.iters * 1e3
    base = ms.get(None)
    print(f"B={B} K={K} V={V} {args.dtype} S={S}: full 52-step decode "
          f"via {n_spans} span calls")
    for abl in probes:
        if not ms.get(abl):
            continue
        extra = (f" (component ~{base - ms[abl]:+6.1f} ms)"
                 if base and abl is not None else "")
        print(f"  {str(abl):9s}: {ms[abl]:7.1f} ms "
              f"({B / ms[abl] * 1e3:.0f} c/s){extra}")


if __name__ == "__main__":
    main()
