#!/usr/bin/env python
"""Decompose the cached-epoch caption train step at b1024: forward scan,
vocab head + loss, backward, Adam.  All timings sync on a scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, iters=5):
    """block_until_ready does not sync through the axon relay — fetch a
    scalar from the LAST dispatch; in-order execution covers the rest."""
    import jax
    import jax.numpy as jnp

    def scalar(o):
        return jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0]

    float(jax.device_get(scalar(fn(*args))))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(scalar(out)))
    return (time.time() - t0) / iters * 1e3


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--decoder-dtype", default="bfloat16")
    ap.add_argument("--vocab", type=int, default=6763,
                    help="38732 = the reference COCO-ID vocab "
                         "(corpus_score.py:110-118)")
    ap.add_argument("--scan-impl", default=None,
                    help="ModelConfig.train_scan_impl override "
                         "(xla = disable the fused kernel pair)")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.ops import losses
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    V = args.vocab
    B = args.batch
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      **({"train_scan_impl": args.scan_impl}
                         if args.scan_impl else {}))
    opt = steps.make_optimizer(4e-4, 5.0)
    state = jax.device_put(ct.init_state(root_key(0), cfg, opt))
    tcfg = TrainConfig(batch_size=B, decoder_dtype=args.decoder_dtype)
    _, step = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)

    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal(
        (B, cfg.enc_image_size, cfg.enc_image_size, cfg.encoder_dim)) * 0.1
        ).astype(np.float32))
    tags = jax.device_put(rng.random((B, 1000)).astype(np.float32))
    caps = jax.device_put(rng.integers(
        1, V, (B, cfg.max_caption_len)).astype(np.int32))
    caplens = jax.device_put(np.full((B,), 30, np.int32))
    key = jax.random.key(1)
    sub = {"params": state["params"], "opt_state": state["opt_state"]}

    cdt = jnp.dtype(args.decoder_dtype)
    params_c = jax.tree.map(
        lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, state["params"])
    enc_c = enc.astype(cdt)
    tags_c = tags.astype(cdt)

    @jax.jit
    def fwd_only(p, enc, tags, caps, caplens, key):
        out = decoders.teacher_forcing(p, cfg, enc, tags, caps, caplens,
                                       dropout_rng=key, train=True)
        return out["predictions"].sum(), out["alphas"].sum()

    @jax.jit
    def fwd_loss(p, enc, tags, caps, caplens, key):
        out = decoders.teacher_forcing(p, cfg, enc, tags, caps, caplens,
                                       dropout_rng=key, train=True)
        loss, _ = losses.caption_loss(out, caps, alpha_c=1.0)
        return loss

    grad_fn = jax.jit(jax.grad(
        lambda p, enc, tags, caps, caplens, key: fwd_loss.__wrapped__(
            p, enc, tags, caps, caplens, key)))

    t_fwd = timed(fwd_only, params_c, enc_c, tags_c, caps, caplens, key)
    t_fl = timed(fwd_loss, params_c, enc_c, tags_c, caps, caplens, key)
    t_grad = timed(grad_fn, params_c, enc_c, tags_c, caps, caplens, key)
    t_step = timed(lambda: step(sub, enc, tags, caps, caplens, key)[1]["loss"])
    print(f"B={B} V={V} dtype={args.decoder_dtype}")
    print(f"  forward scan only (preds+alphas sums): {t_fwd:7.1f} ms")
    print(f"  forward + loss:                        {t_fl:7.1f} ms")
    print(f"  grad (fwd+bwd):                        {t_grad:7.1f} ms")
    print(f"  full train step (grad+clip+Adam):      {t_step:7.1f} ms")


if __name__ == "__main__":
    main()
