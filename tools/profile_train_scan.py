#!/usr/bin/env python
"""Interleaved A/B of the caption train step: XLA scan vs the fused
training-scan kernel pair (ops/train_pallas.py), on the cached-epoch
decoder-only path (the regime the kernel targets).

Interleaves the contenders in ONE process across rounds — machine-speed
drift between measurement windows on this relay-attached chip is +-20%,
larger than most kernel effects (BASELINE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--decoder-dtype", default="bfloat16")
    ap.add_argument("--span", type=int, default=4)
    ap.add_argument("--model", default="attention_scn",
                    choices=["attention_scn", "pure_attention"])
    ap.add_argument("--impl", default="xla,fused",
                    help="comma list of impls to run")
    args = ap.parse_args()
    impls = tuple(args.impl.split(","))

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import dataclasses

    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    V = 6763
    B = args.batch
    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal(
        (B, 14, 14, 2048)) * 0.1).astype(np.float32))
    tags = jax.device_put(rng.random((B, 1000)).astype(np.float32))
    caps = jax.device_put(rng.integers(1, V, (B, 52)).astype(np.int32))
    caplens = jax.device_put(np.full((B,), 30, np.int32))
    key = jax.random.key(1)

    steps_by_impl = {}
    subs = {}
    for impl in impls:
        cfg = ModelConfig(model_type=args.model, vocab_size=V,
                          train_scan_impl=impl, train_span=args.span)
        opt = steps.make_optimizer(4e-4, 5.0)
        state = jax.device_put(ct.init_state(root_key(0), cfg, opt))
        tcfg = TrainConfig(batch_size=B, decoder_dtype=args.decoder_dtype)
        _, step = steps.make_caption_train_step(cfg, tcfg, opt,
                                                donate=False)
        steps_by_impl[impl] = step
        subs[impl] = {"params": state["params"],
                      "opt_state": state["opt_state"]}

    def once(impl):
        _, m = steps_by_impl[impl](subs[impl], enc, tags, caps, caplens,
                                   key)
        return m["loss"]

    for impl in impls:
        t0 = time.time()
        loss = float(jax.device_get(once(impl)))
        print(f"{impl:6s} compile+first: {time.time()-t0:6.1f}s "
              f"loss={loss:.4f}")

    for rnd in range(args.rounds):
        for impl in impls:
            t0 = time.time()
            for _ in range(args.iters):
                out = once(impl)
            float(jax.device_get(out))
            dt = (time.time() - t0) / args.iters
            print(f"round {rnd} {impl:6s}: {dt*1e3:7.1f} ms/batch = "
                  f"{B/dt:7.1f} imgs/s")


if __name__ == "__main__":
    main()
