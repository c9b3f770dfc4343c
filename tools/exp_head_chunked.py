#!/usr/bin/env python
"""Measure the chunked vocab CE head vs the dense head in the full caption
train step (VERDICT r4 #1): flagship dims (V=6763) and COCO-ID vocab
(V=38,732, /root/reference/corpus_score.py:110-118) at batch 1024 bf16.

Usage: python tools/exp_head_chunked.py [--impl auto|dense|chunked]
       [--vocab N] [--batch N] [--dtype bfloat16|float32] [--tile N]
       [--rounds N] [--loss-check]
Prints one JSON line per measurement.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from indonesian_image_captioning_tpu.core import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from indonesian_image_captioning_tpu.core.config import (  # noqa: E402
    ModelConfig, TrainConfig)
from indonesian_image_captioning_tpu.core.prng import root_key  # noqa: E402
from indonesian_image_captioning_tpu.train import (  # noqa: E402
    caption as caption_train, steps)


def measure(V, B, impl, dtype, tile, rounds, loss_check):
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    opt = steps.make_optimizer(4e-4, 5.0)
    state = jax.device_put(caption_train.init_state(root_key(0), cfg, opt))
    tcfg = TrainConfig(batch_size=B, decoder_dtype=dtype, head_impl=impl,
                       head_tile=tile)
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

    def dispatch():
        return step(sub, enc, tags, caps, caplens, key)[1]

    m = dispatch()
    loss = float(jax.device_get(m["loss"]))
    top5 = float(jax.device_get(m["top5"]))
    assert np.isfinite(loss)

    times = []
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(3):
            out = dispatch()
        float(jax.device_get(out["loss"]))
        times.append((time.time() - t0) / 3)
    times.sort()
    med = times[len(times) // 2]
    line = {
        "experiment": "head_chunked_train_step",
        "impl": impl, "vocab": V, "batch": B, "dtype": dtype,
        "tile": tile, "step_ms": round(med * 1e3, 1),
        "imgs_per_s": round(B / med, 1),
        "t_min_ms": round(times[0] * 1e3, 1),
        "t_max_ms": round(times[-1] * 1e3, 1),
        "loss": round(loss, 5), "top5": round(top5, 3),
    }
    print(json.dumps(line), flush=True)
    return line


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="chunked",
                    choices=("auto", "dense", "chunked"))
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--loss-check", action="store_true")
    a = ap.parse_args()
    measure(a.vocab, a.batch, a.impl, a.dtype, a.tile, a.rounds,
            a.loss_check)
