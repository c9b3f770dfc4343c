#!/usr/bin/env python
"""Device trace of the cached-epoch caption train step (decoder fwd/bwd/Adam
only — feature rows gathered from the frozen-feature cache), printing the
top device ops by total duration.  Locates where the b1024 ~300 ms decoder
step actually goes before any kernel work is attempted.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trace_attend import parse_perfetto  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--decoder-dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps
    from indonesian_image_captioning_tpu.train.feature_cache import (
        FeatureCache)

    V = 6763
    B = args.batch
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    opt = steps.make_optimizer(4e-4, 5.0)
    state = jax.device_put(ct.init_state(root_key(0), cfg, opt))
    tcfg = TrainConfig(batch_size=B, decoder_dtype=args.decoder_dtype)
    _, step = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)

    rng = np.random.default_rng(0)
    n_img = max(2 * B // 5, 1)
    feats = (jax.random.normal(
        jax.random.key(2),
        (n_img, cfg.enc_image_size, cfg.enc_image_size,
         cfg.encoder_dim)) * 0.1).astype(jnp.float32)
    ftags = jax.random.uniform(jax.random.key(3), (n_img, 1000))
    cache = FeatureCache(feats, ftags, cpi=5, on_device=True)
    idx = jax.device_put(rng.integers(0, n_img * 5, (B,)).astype(np.int32))
    caps = jax.device_put(rng.integers(
        1, V, (B, cfg.max_caption_len)).astype(np.int32))
    caplens = jax.device_put(np.full((B,), 30, np.int32))
    key = jax.random.key(1)
    sub = {"params": state["params"], "opt_state": state["opt_state"]}

    def one():
        enc_out, tags = cache.lookup(idx)
        _, metrics = step(sub, enc_out, tags, caps, caplens, key)
        return float(jax.device_get(metrics["loss"]))

    one()  # compile + warm
    log_dir = "/tmp/trace_train"
    with jax.profiler.trace(log_dir):
        for _ in range(args.iters):
            one()
    import time
    t0 = time.time()
    for _ in range(args.iters):
        one()
    dt = (time.time() - t0) / args.iters
    print(f"B={B} decoder_dtype={args.decoder_dtype}: "
          f"{dt*1e3:.1f} ms/batch = {B/dt:.1f} imgs/s "
          f"(divide trace totals by {args.iters} iters)")
    parse_perfetto(log_dir, top=args.top)


if __name__ == "__main__":
    main()
