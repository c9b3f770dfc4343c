#!/usr/bin/env python
"""Score-parity discriminator for the span kernel's compiled path.

Sequence-agreement counts between exact decode paths are uninformative
under FP-association noise (near-ties flip, and scaling logits scales
noise equally).  But beam search MAXIMIZES cumulative logprob: when two
exact implementations disagree on a sequence it is because two beams'
final scores are within rounding noise of each other, so the per-image
score difference must be centred on zero at ~1e-5 scale.  A bookkeeping
bug (wrong parent, dropped beam, stale state) surfaces as systematically
LOWER scores on one side.  Prints mean/min/max/quantiles of
score(span) - score(steps) and score(fused_step) - score(steps).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--model", default="attention_scn")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    V, B = args.vocab, args.batch
    dt = jnp.dtype(args.dtype)
    base_cfg = ModelConfig(model_type=args.model, vocab_size=V,
                           dtype=args.dtype)
    params = decoders.cast_params(
        decoders.init_decoder(jax.random.key(0), base_cfg), dt)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, 2048)) * 0.1
           ).astype(dt)
    tags = jax.random.uniform(jax.random.key(2), (B, 1000)).astype(dt)

    outs = {}
    for impl in ("steps", "fused_step", "fused_span"):
        cfg = dataclasses.replace(base_cfg, decode_impl=impl, decode_span=4)
        o = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                                end_id=V - 1,
                                beam_cfg=BeamConfig(beam_size=5))
        outs[impl] = {k: np.asarray(jax.device_get(v))
                      for k, v in o.items()}

    ref = outs["steps"]["scores"]
    for impl in ("fused_step", "fused_span"):
        d = outs[impl]["scores"] - ref
        q = np.quantile(d, [0.01, 0.5, 0.99])
        print(f"{impl:11s} score delta vs steps: mean {d.mean():+.3e} "
              f"min {d.min():+.3e} max {d.max():+.3e} "
              f"q01/med/q99 {q[0]:+.3e}/{q[1]:+.3e}/{q[2]:+.3e}")
        ls = outs[impl]["lengths"]
        print(f"{impl:11s} mean len {ls.mean():.2f} "
              f"(steps {outs['steps']['lengths'].mean():.2f})")


if __name__ == "__main__":
    main()
