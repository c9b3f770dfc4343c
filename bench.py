#!/usr/bin/env python
"""Headline benchmark: batched beam-5 caption decode throughput.

Prints ONE JSON line:
  {"metric": "captions_per_sec_beam5", "value": N, "unit": "captions/s",
   "vs_baseline": N / <reference CPU captions/s>}

Baseline (BASELINE.md): the unmodified PyTorch reference AttentionSCN
``sample()`` at identical dims (512/512/512/512, semantic 1000, V=6763,
beam 5, 51 decode steps, precomputed encoder features) measured on this
machine's CPU (8 torch threads): 16.07 s/caption = 0.0622 captions/s.

Apples-to-apples: this bench also decodes from precomputed encoder
features with a randomly initialised model (random weights never emit
<end>, so both sides pay the full 51 steps — worst case for us, since a
trained model finishes in ~10-20 steps).  Our side decodes a BATCH of
images through the jitted fixed-shape beam engine; the reference can only
do one image at a time.
"""

import json
import time

REFERENCE_CPU_CAPTIONS_PER_SEC = 0.0622  # measured, see BASELINE.md


def main():
    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    V = 6763  # flickr8k-id vocab (reference corpus_score.py:110-118)
    # bf16 params/activations (TPU-native serving precision), batch 1024
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      dtype="bfloat16")
    params = decoders.init_decoder(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    B = 1024
    enc = (jax.random.normal(
        jax.random.key(1),
        (B, cfg.enc_image_size, cfg.enc_image_size, cfg.encoder_dim))
        * 0.1).astype(jnp.bfloat16)
    tags = jax.random.uniform(jax.random.key(2),
                              (B, cfg.semantic_dim)).astype(jnp.bfloat16)
    beam_cfg = BeamConfig(beam_size=5)

    def run():
        out = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                                  end_id=V - 1, beam_cfg=beam_cfg)
        # hard sync: device_get (block_until_ready alone can return early
        # through the axon relay)
        return jax.device_get(out["lengths"])

    lens = run()  # compile + warm
    # sanity: worst case decode ran the full window
    assert int(lens[0]) == beam_cfg.max_steps + 1, (
        "expected full-length decode with random weights")

    n_iter = 3
    t0 = time.time()
    for _ in range(n_iter):
        run()
    dt = (time.time() - t0) / n_iter
    cps = B / dt

    print(json.dumps({
        "metric": "captions_per_sec_beam5",
        "value": round(cps, 3),
        "unit": "captions/s",
        "vs_baseline": round(cps / REFERENCE_CPU_CAPTIONS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
