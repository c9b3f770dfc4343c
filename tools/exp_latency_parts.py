#!/usr/bin/env python
"""Where does single-request serving latency go?  (bench.py --mode latency)

Times, at batch 1 / beam 5 / flagship dims on the real chip:
  * the jitted encoder+tagger call alone,
  * the jitted beam decode alone,
  * a chain of 4 DEPENDENT decodes inside one jit call — the slope
    isolates per-decode DEVICE time from the per-call host dispatch.

Measured 2026-08-19 (v5e behind the axon relay): encode-alone p50 34.0 ms,
decode-alone 35.6 ms, 4x-chained decode 40.2 ms -> device-side decode is
(40.21-35.56)/3 = **1.6 ms/request**; the ~34 ms floor under every call is
host->device dispatch through the relay, not framework cost.  Padding the
batch to 8 to make the fused kernels eligible LOSES (52 vs 37 ms p50):
at G=8 the kernels' tiny tiles cost more than the steps engine saves.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from indonesian_image_captioning_tpu.core import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from indonesian_image_captioning_tpu.core.config import (  # noqa: E402
    BeamConfig, ModelConfig)
from indonesian_image_captioning_tpu.core.prng import root_key  # noqa: E402
from indonesian_image_captioning_tpu.decode.api import (  # noqa: E402
    caption_beam_search)
from indonesian_image_captioning_tpu.models import encoders  # noqa: E402
from indonesian_image_captioning_tpu.train import (  # noqa: E402
    caption as caption_train, steps)
from indonesian_image_captioning_tpu.train.steps import (  # noqa: E402
    prep_images)

V = 6763
cfg = ModelConfig(model_type="attention_scn", vocab_size=V, dtype="bfloat16")
opt = steps.make_optimizer(4e-4, 5.0)
state = caption_train.init_state(root_key(0), cfg, opt)
bf = jnp.bfloat16
state = jax.device_put(jax.tree.map(
    lambda x: x.astype(bf)
    if jnp.issubdtype(x.dtype, jnp.floating) else x, state))
images = jax.device_put(np.random.default_rng(0).integers(
    0, 256, (1, 3, 256, 256), np.uint8))


@jax.jit
def encode(st, images_u8):
    x = prep_images(images_u8).astype(bf)
    enc_out = encoders.apply_encoder_caption(
        st["encoder"], st["encoder_stats"], x, train=False,
        enc_image_size=cfg.enc_image_size, arch=cfg.encoder_arch)[0]
    tags = encoders.apply_encoder_tagger(
        st["tagger"], st["tagger_stats"], x, train=False,
        arch=cfg.encoder_arch)[0]
    return enc_out.astype(bf), tags.astype(bf)


@jax.jit
def decode(st, enc_out, tags):
    out = caption_beam_search(st["params"], cfg, enc_out, tags,
                              start_id=V - 2, end_id=V - 1,
                              beam_cfg=BeamConfig(beam_size=5))
    return out["sequences"], out["lengths"]


@jax.jit
def decode_n(st, enc_out, tags, n_static=4):
    """N dependent decodes in ONE jit call: the slope over n is the
    per-decode DEVICE time, with the per-call dispatch paid once."""
    lengths = None
    t = tags
    for _ in range(n_static):
        out = caption_beam_search(st["params"], cfg, enc_out, t,
                                  start_id=V - 2, end_id=V - 1,
                                  beam_cfg=BeamConfig(beam_size=5))
        # data-dependence so XLA can't run the decodes concurrently
        t = t + 0.0 * out["lengths"].astype(t.dtype).sum()
        lengths = out["lengths"]
    return lengths


def p50(f, n=30):
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(f())
        ts.append((time.time() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    enc_out, tags = encode(state, images)
    jax.device_get(decode(state, enc_out, tags)[1])
    jax.device_get(decode_n(state, enc_out, tags))

    e = p50(lambda: encode(state, images))
    d1 = p50(lambda: decode(state, enc_out, tags))
    d4 = p50(lambda: decode_n(state, enc_out, tags))
    print(f"encode p50 ms:            {e:6.2f}")
    print(f"decode p50 ms:            {d1:6.2f}")
    print(f"decode x4 chained p50 ms: {d4:6.2f}")
    print(f"-> device-side decode:    {(d4 - d1) / 3:6.2f} ms/request; "
          f"the rest of each call is host dispatch")


if __name__ == "__main__":
    main()
