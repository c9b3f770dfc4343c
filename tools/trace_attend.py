#!/usr/bin/env python
"""Capture a device trace of the attention step (XLA vs Pallas) and print
the top ops by total duration — diagnoses WHERE the Pallas kernel loses
(DMA stalls vs compute) instead of guessing.

Writes a perfetto trace and aggregates its events.
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_perfetto(log_dir, top=18):
    paths = glob.glob(os.path.join(log_dir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        print("no perfetto trace found under", log_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    total = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")[:70]
            total[name] = total.get(name, 0.0) + e["dur"]
    print(f"-- top ops by total duration ({os.path.basename(path)}) --")
    for name, dur in sorted(total.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:10.3f} ms  {name}")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=("xla", "pallas", "pallas_t"),
                    default="pallas")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        attend_fused, attend_fused_t, precompute_transposed)

    dt = jnp.bfloat16
    B, K = args.batch, 5
    cfg = ModelConfig(model_type="attention_scn", vocab_size=100,
                      dtype="bfloat16")
    params = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), cfg), dt)
    enc = (jax.random.normal(jax.random.key(1),
                             (B, cfg.num_pixels, cfg.encoder_dim))
           * 0.1).astype(dt)
    enc_att = attn.precompute(params["attention"], enc)
    enc_att_t = precompute_transposed(params["attention"], enc)
    h = (jax.random.normal(jax.random.key(2), (B, K, cfg.decoder_dim))
         * 0.1).astype(dt)

    def body(i, carry, cs):
        hh = carry
        if args.impl == "xla":
            awe, _ = attn.attend(cs["att"], cs["enc"][:, None],
                                 cs["ea"][:, None], hh)
        elif args.impl == "pallas":
            awe, _ = attend_fused(cs["att"], cs["enc"][:, None],
                                  cs["ea"][:, None], hh)
        else:
            awe, _ = attend_fused_t(cs["att"], cs["enc"][:, None],
                                    cs["ea_t"], hh)
        return (hh * 0.999 + awe[..., :hh.shape[-1]] * 1e-3).astype(hh.dtype)

    consts = {"att": params["attention"], "enc": enc, "ea": enc_att,
              "ea_t": enc_att_t}

    @jax.jit
    def run(h, consts):
        return jax.lax.fori_loop(0, args.iters,
                                 lambda i, c: body(i, c, consts), h)

    r = run(h, consts)
    jax.device_get(r[0, 0, 0])
    log_dir = f"/tmp/trace_attend_{args.impl}"
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        r = run(h, consts)
        jax.device_get(r[0, 0, 0])
    parse_perfetto(log_dir)


if __name__ == "__main__":
    main()
