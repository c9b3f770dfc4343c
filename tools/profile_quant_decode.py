#!/usr/bin/env python
"""Full-decode throughput: int8 encoder-state serving mode vs bf16.

The decode attention step is ~89% DMA of the loop-invariant enc/enc_att
(tools/exp_attend_parts.py); enc_quant="int8" halves those bytes.  This
measures the end effect on the headline batched beam-5 decode.
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
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    V, B, K = args.vocab, args.batch, args.beam
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="bfloat16")
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params, jnp.bfloat16)
    enc = (jax.random.normal(jax.random.key(1), (B, 196, 2048)) * 0.1
           ).astype(jnp.bfloat16)
    tags = jax.random.uniform(jax.random.key(2), (B, 1000)
                              ).astype(jnp.bfloat16)

    outs = {}
    for quant in ("none", "int8", "none"):
        c = dataclasses.replace(cfg, enc_quant=quant)

        def run():
            o = caption_beam_search(params, c, enc, tags, start_id=V - 2,
                                    end_id=V - 1,
                                    beam_cfg=BeamConfig(beam_size=K))
            return jax.device_get(o["lengths"]), o

        _, o = run()
        outs[quant] = o
        n = 3
        t0 = time.time()
        for _ in range(n):
            run()
        dt = (time.time() - t0) / n
        print("enc_quant=%-5s %8.1f ms/batch = %8.1f captions/s"
              % (quant, dt * 1e3, B / dt))

    same = (outs["none"]["sequences"] == outs["int8"]["sequences"]
            ).all(axis=1)
    print("sequence agreement int8 vs bf16 (random weights, near-tie "
          "regime): %d/%d" % (int(same.sum()), B))


if __name__ == "__main__":
    main()
