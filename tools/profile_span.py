#!/usr/bin/env python
"""Compiled-path benchmark: fused SPAN kernel vs fused_step vs step engine.

The span kernel (ops/span_pallas.py) runs S consecutive beam steps per
streamed window fetch — per-step encoder DMA divided by S.  This tool
times full 51-step decodes through the PRODUCTION caption_beam_search
path for decode_impl in {steps, fused_step (auto), fused_span at each
--spans value}, syncing only on the tiny lengths array (never fetch a
feature map through the relay — see BASELINE.md measurement notes).

Run after any span_pallas.py change; compare against the fused_step
default before considering a default flip.
"""

import argparse
import dataclasses
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
    ap.add_argument("--spans", default="2,4,8")
    ap.add_argument("--img-tile", type=int, default=32)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--impls", default="steps,fused_step,fused_span")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    V, B, K = args.vocab, args.batch, args.beam
    dt = jnp.dtype(args.dtype)
    base_cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                           dtype=args.dtype)
    params = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), base_cfg), dt)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, 2048)) * 0.1
           ).astype(dt)
    tags = jax.random.uniform(jax.random.key(2), (B, 1000)).astype(dt)

    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        _round_up)
    from indonesian_image_captioning_tpu.ops.span_pallas import (
        _estimate_vmem, pick_span_tile)
    dims = dict(Pp=_round_up(196, 16), E=2048, A=base_cfg.attention_dim,
                D=base_cfg.decoder_dim, Emb=base_cfg.embed_dim,
                F4=4 * base_cfg.factored_dim, Vp=_round_up(V, 128),
                isz=dt.itemsize, group=args.group)
    for s in (int(x) for x in args.spans.split(",")):
        g = pick_span_tile(B, K, s, args.img_tile, dims=dims)
        est = (_estimate_vmem(g, K, s, **dims) / 2**20) if g else 0
        print(f"span S={s}: picked G={g} (est {est:.1f} MB scoped VMEM)")
    print(f"dims: B={B} K={K} V={V} dtype={dt} reps={args.reps}")

    outs = {}

    def run(label, cfg):
        def call():
            o = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                                    end_id=V - 1,
                                    beam_cfg=BeamConfig(beam_size=K))
            jax.device_get(o["lengths"])
            return o

        t0 = time.time()
        o = call()
        print("%-16s compile+first: %6.1f s" % (label, time.time() - t0))
        t0 = time.time()
        for _ in range(args.reps):
            o = call()
        dt_s = (time.time() - t0) / args.reps
        print("%-16s %8.1f ms/batch = %8.1f captions/s"
              % (label, dt_s * 1e3, B / dt_s))
        outs[label] = o

    for impl in args.impls.split(","):
        if impl == "fused_span":
            for s in (int(x) for x in args.spans.split(",")):
                run(f"fused_span S={s}",
                    dataclasses.replace(base_cfg, decode_impl="fused_span",
                                        decode_span=s))
        else:
            run(impl, dataclasses.replace(base_cfg, decode_impl=impl))

    labels = list(outs)
    ref = outs[labels[0]]["sequences"]
    for lb in labels[1:]:
        same = (outs[lb]["sequences"] == ref).all(axis=1)
        print("sequence agreement %s vs %s: %d/%d (bf16 near-ties expected"
              " on random weights)" % (lb, labels[0], int(same.sum()), B))


if __name__ == "__main__":
    main()
