#!/usr/bin/env python
"""Empirical G/Vt sweep for the tiled-head span kernel at COCO vocab.

The VMEM estimator gates the span tile conservatively; this tool
overrides the budget and tries larger image tiles on the real chip to
find where Mosaic actually stops accepting the kernel — and what each
feasible point is worth.  Results calibrate _VMEM_BUDGET / the plan
ladder (VERDICT r2 #3).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--vocab", type=int, default=38732)
    ap.add_argument("--span", type=int, default=4)
    ap.add_argument("--tiles", default="8,16,24,32")
    ap.add_argument("--window", default="single")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp

    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.ops import span_pallas

    V, B, K, S = args.vocab, args.batch, args.beam, args.span
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="bfloat16")
    params = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), cfg), jnp.bfloat16)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, cfg.encoder_dim))
           * 0.3).astype(jnp.bfloat16)
    tags = jax.random.uniform(
        jax.random.key(2), (B, cfg.semantic_dim)).astype(jnp.bfloat16)

    span_pallas._VMEM_BUDGET = 10 ** 12          # estimator off: raw Mosaic
    for G in map(int, args.tiles.split(",")):
        t0 = time.time()
        try:
            rec = span_pallas.beam_decode_span_records(
                params, cfg, enc, tags, beam_size=K, start_id=V - 2,
                end_id=V - 1, max_steps=51, span=S, img_tile=G,
                window_mode=args.window, head_mode="tiled",
                interpret=False)
            # hard sync: device_get (block_until_ready alone can return
            # early through the axon relay — see bench.py)
            jax.device_get(rec["vals"])
        except Exception as e:
            print(f"G={G}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            rec = span_pallas.beam_decode_span_records(
                params, cfg, enc, tags, beam_size=K, start_id=V - 2,
                end_id=V - 1, max_steps=51, span=S, img_tile=G,
                window_mode=args.window, head_mode="tiled",
                interpret=False)
            jax.device_get(rec["vals"])
        dt = (time.time() - t0) / args.reps
        print(f"G={G}: compile {compile_s:.0f}s, {dt*1e3:.1f} ms/decode "
              f"= {B/dt:.0f} captions/s", flush=True)


if __name__ == "__main__":
    main()
