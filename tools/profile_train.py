#!/usr/bin/env python
"""Measure caption training throughput on the real chip.

One "batch" = the production step pair from train/steps.py: both frozen
encoder forwards (ResNet-152 caption + tagger, TrainConfig.encoder_dtype)
feeding the jitted decoder fwd/bwd/Adam update — the same programs
train/caption.py runs per batch (reference recipe:
/root/reference/trains/attention_scn.py:204-252).

Synchronisation is on the SCALAR loss only.  On this machine the chip sits
behind a relay: fetching the (B,14,14,2048) feature map with the result
costs ~1 s/100 MB and silently dominates the measurement (this inflated
the round-1 record 81 ms -> 235 ms).  Production never fetches it either —
features flow device-to-device into the decoder step.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,128,256",
                    help="comma-separated batch sizes")
    ap.add_argument("--encoder-dtype", default=None,
                    help="override TrainConfig.encoder_dtype "
                         "(bfloat16 default; float32 = parity mode)")
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--decoder-dtype", default=None,
                    help="override TrainConfig.decoder_dtype")
    ap.add_argument("--cached", action="store_true",
                    help="steady-state epoch with the frozen-feature cache "
                         "(train/feature_cache.py): an HBM gather of the "
                         "batch's feature/tag rows replaces both ResNet-152 "
                         "forwards")
    ap.add_argument("--fine-tune", action="store_true",
                    help="the fine_tune_encoder recipe "
                         "(/root/reference/models/encoders/caption.py:44-57,"
                         " trains/attention_scn.py:84-96): joint Adam on "
                         "the decoder AND ResNet stages 2-4, train-mode "
                         "BN, XLA decoder scan (the fused kernel emits no "
                         "d_enc)")
    ap.add_argument("--encoder-remat", default=None,
                    help="TrainConfig.encoder_remat for --fine-tune "
                         "(e.g. blocks; needed at b>=128)")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    V = args.vocab
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    opt = steps.make_optimizer(4e-4, 5.0)
    state = jax.device_put(ct.init_state(root_key(0), cfg, opt))
    jax.device_get(jax.tree.leaves(state)[0])
    rng = np.random.default_rng(0)

    for B in (int(b) for b in args.batches.split(",")):
        kw = ({"encoder_dtype": args.encoder_dtype}
              if args.encoder_dtype else {})
        if args.decoder_dtype:
            kw["decoder_dtype"] = args.decoder_dtype
        if args.fine_tune:
            kw["fine_tune_encoder"] = True
            if args.encoder_remat:
                kw["encoder_remat"] = args.encoder_remat
        tcfg = TrainConfig(batch_size=B, **kw)
        if args.fine_tune:
            enc_opt = steps.make_optimizer(tcfg.encoder_lr, tcfg.grad_clip)
            tagger_fn, ft_step = steps.make_caption_finetune_train_step(
                cfg, tcfg, opt, enc_opt, donate=False)
            ft_state = {**state, "enc_opt_state": enc_opt.init(
                state["encoder"])}
        encode_fn, step = steps.make_caption_train_step(
            cfg, tcfg, opt, donate=False)
        batch = {"images": jax.device_put(rng.integers(
            0, 256, (B, 3, 256, 256), np.uint8))}
        caps = jax.device_put(rng.integers(
            1, V, (B, cfg.max_caption_len)).astype(np.int32))
        caplens = jax.device_put(np.full((B,), 30, np.int32))
        key = jax.random.key(1)
        sub = {"params": state["params"], "opt_state": state["opt_state"]}

        if args.fine_tune:
            def full_batch():
                tags = tagger_fn(state, batch)
                _, metrics = ft_step(ft_state, batch["images"], tags,
                                     caps, caplens, key)
                return float(jax.device_get(metrics["loss"]))
        elif args.cached:
            # steady-state cached epoch: feature rows come from an
            # HBM-resident cache of N unique images (gathered by caption
            # index, cpi=5), never from the encoders
            import jax.numpy as jnp
            from indonesian_image_captioning_tpu.train.feature_cache import (
                FeatureCache)
            n_img = max(2 * B // 5, 1)
            feats = (jax.random.normal(
                jax.random.key(2),
                (n_img, cfg.enc_image_size, cfg.enc_image_size,
                 cfg.encoder_dim)) * 0.1).astype(jnp.float32)
            ftags = jax.random.uniform(jax.random.key(3), (n_img, 1000))
            cache = FeatureCache(feats, ftags, cpi=5, on_device=True)
            idx_dev = jax.device_put(rng.integers(
                0, n_img * 5, (B,)).astype(np.int32))

            def full_batch():
                enc_out, tags = cache.lookup(idx_dev)
                _, metrics = step(sub, enc_out, tags, caps, caplens, key)
                return float(jax.device_get(metrics["loss"]))
        else:
            def full_batch():
                enc_out, tags = encode_fn(state, batch)  # device-resident
                _, metrics = step(sub, enc_out, tags, caps, caplens, key)
                return float(jax.device_get(metrics["loss"]))  # scalar sync

        full_batch()  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            full_batch()
        dt = (time.time() - t0) / args.iters
        print(f"B={B} encoder_dtype={tcfg.encoder_dtype}: "
              f"{dt * 1e3:8.1f} ms/batch = {B / dt:7.1f} imgs/s")


if __name__ == "__main__":
    main()
