#!/usr/bin/env python
"""Compiled-path benchmark: fused full-decode kernel vs the step engine.

Measured verdict (v5e via axon relay, B=1024, K=5, V=6763, bf16,
2026-08-17):

    fused (G=16, m=8):  1048.7 ms/batch =  976 captions/s  (compile ~12 min)
    step engine:         248.3 ms/batch = 4123 captions/s

The fused kernel eliminates the 1.09 GB/step enc/enc_att HBM re-read but
pays for it in per-chunk compute at G*K = 80 rows: the per-step weight
matmuls (fc, one-hot embedding, SCN projections) run at <128-row MXU
utilisation per chunk, and the full-width (R, Vp) top-k argmax rounds
make ~11 VMEM passes per step.  The step engine amortises every weight
matmul over B*K = 5120 rows.  See ModelConfig.decode_impl.

bf16 sequence agreement with the engine is ~0 on RANDOM weights (uniform
logits make every pick a near-tie between the kernel's f32 scoring and the
engine's bf16 log-softmax); at f32 the two paths agree exactly
(tests/test_decode_fused.py).
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
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--img-tile", type=int, default=16)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--skip-engine", action="store_true")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.decode.replay import (
        replay_beam_records)
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.ops.decode_pallas import (
        beam_decode_records)

    V, B, K = args.vocab, args.batch, args.beam
    dt = jnp.dtype(args.dtype)
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype=args.dtype)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params, dt)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, 2048)) * 0.1
           ).astype(dt)
    tags = jax.random.uniform(jax.random.key(2), (B, 1000)).astype(dt)

    def fused():
        rec = beam_decode_records(params, cfg, enc, tags, beam_size=K,
                                  start_id=V - 2, end_id=V - 1,
                                  img_tile=args.img_tile, group=args.group)
        out = replay_beam_records(rec, start_id=V - 2, end_id=V - 1,
                                  seq_len=52)
        return jax.device_get(out["lengths"]), out

    t0 = time.time()
    _, out = fused()
    print("fused compile+first run: %.1f s" % (time.time() - t0))
    n = 3
    t0 = time.time()
    for _ in range(n):
        fused()
    dt_s = (time.time() - t0) / n
    print("fused:  %8.1f ms/batch = %8.1f captions/s"
          % (dt_s * 1e3, B / dt_s))

    if args.skip_engine:
        return
    def engine():
        o = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                                end_id=V - 1,
                                beam_cfg=BeamConfig(beam_size=K))
        return jax.device_get(o["lengths"]), o

    engine()
    t0 = time.time()
    for _ in range(n):
        _, ro = engine()
    dt_s = (time.time() - t0) / n
    print("engine: %8.1f ms/batch = %8.1f captions/s"
          % (dt_s * 1e3, B / dt_s))
    same = (ro["sequences"] == out["sequences"]).all(axis=1)
    print("sequence agreement: %d/%d" % (int(same.sum()), B))


if __name__ == "__main__":
    main()
