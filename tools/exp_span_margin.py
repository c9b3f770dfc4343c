#!/usr/bin/env python
"""Distinguish near-tie flips from systematic bugs in the span kernel.

Random-weight decodes have near-uniform logits, so ANY floating-point
association difference between two exact decode paths flips most
sequences (profile_span agreement counts are useless as a correctness
signal).  Scaling the fc weight widens the per-step logit margins; with
margins far above bf16/f32 rounding noise, exact paths MUST agree on
every selection.  Persistent disagreement at high scale = real bug.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--scales", default="1,4,16,64")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    V, B = args.vocab, args.batch
    dt = jnp.dtype(args.dtype)
    base_cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                           dtype=args.dtype)
    params0 = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), base_cfg), dt)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, 2048)) * 0.1
           ).astype(dt)
    tags = jax.random.uniform(jax.random.key(2), (B, 1000)).astype(dt)

    for scale in (float(x) for x in args.scales.split(",")):
        params = dict(params0)
        params["fc"] = {"w": params0["fc"]["w"] * scale,
                        "b": params0["fc"]["b"] * scale}
        outs = {}
        for impl in ("steps", "fused_step", "fused_span"):
            cfg = dataclasses.replace(base_cfg, decode_impl=impl,
                                      decode_span=4)
            o = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                                    end_id=V - 1,
                                    beam_cfg=BeamConfig(beam_size=5))
            outs[impl] = jax.device_get(o["sequences"])
        a = (outs["fused_step"] == outs["steps"]).all(axis=1).sum()
        b = (outs["fused_span"] == outs["steps"]).all(axis=1).sum()
        c = (outs["fused_span"] == outs["fused_step"]).all(axis=1).sum()
        print(f"scale {scale:6.1f}: step==steps {a}/{B}  "
              f"span==steps {b}/{B}  span==step {c}/{B}")


if __name__ == "__main__":
    main()
