#!/usr/bin/env python
"""Measure TAGGER training throughput on the real chip.

One "batch" = the production tagger step from train/steps.py: ResNet-152
fwd/bwd + BCE + masked Adam on the trainable subset (head + layer2..4),
BatchNorm in train mode with running-stat updates — the same program
train/tagger.py runs per batch (reference recipe:
/root/reference/trains/tagger.py:35-43,132-192).

Contenders (tagger_dtype) are INTERLEAVED in one process: this machine's
speed drifts ±20% between measurement windows, so A-then-B timing lies.
Sync is on the SCALAR loss only (fetching tensors through the relay
inflates measurements, see profile_train.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,128,256")
    ap.add_argument("--dtypes", default="float32,bfloat16",
                    help="comma-separated TrainConfig.tagger_dtype contenders")
    ap.add_argument("--arch", default="resnet152")
    ap.add_argument("--semantic", type=int, default=1000)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", default="off",
                    help="comma-separated TrainConfig.encoder_remat "
                         "contenders from {off, blocks, convs} — some mode "
                         "is required at 256px B>=128")
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved A/B rounds per batch size")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        TaggerConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.train import steps
    from indonesian_image_captioning_tpu.train import tagger as tt

    dtypes = args.dtypes.split(",")
    tagger_cfg = TaggerConfig(semantic_size=args.semantic,
                              encoder_arch=args.arch)
    opt = steps.make_optimizer(1e-4, 5.0)
    rng = np.random.default_rng(0)

    for B in (int(b) for b in args.batches.split(",")):
        batch = {
            "images": jax.device_put(rng.integers(
                0, 256, (B, 3, args.image_size, args.image_size), np.uint8)),
            "tags": jax.device_put(
                (rng.random((B, args.semantic)) < 0.01).astype(np.float32)),
        }
        key = jax.random.key(1)
        runs = {}
        for dt in dtypes:
            for rm in args.remat.split(","):
                remat = False if rm == "off" else rm
                tcfg = TrainConfig(batch_size=B, tagger_dtype=dt,
                                   encoder_remat=remat)
                state = jax.device_put(tt.init_state(
                    root_key(0), tcfg, tagger_cfg, opt))
                step = steps.make_tagger_train_step(
                    tcfg, opt, tagger_cfg.dropout, arch=args.arch,
                    donate=False)
                # compile + warm
                _, m = step(state, batch, key)
                float(jax.device_get(m["loss"]))
                runs[dt, rm] = (state, step)
        for r in range(args.rounds):
            for (dt, rm), (state, step) in runs.items():
                t0 = time.time()
                for _ in range(args.iters):
                    _, m = step(state, batch, key)
                    loss = float(jax.device_get(m["loss"]))
                d = (time.time() - t0) / args.iters
                print(f"B={B} tagger_dtype={dt:9s} remat={rm:6s} round {r}: "
                      f"{d * 1e3:8.1f} ms/batch = {B / d:7.1f} imgs/s "
                      f"(loss {loss:.4f})")


if __name__ == "__main__":
    main()
