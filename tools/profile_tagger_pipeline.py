#!/usr/bin/env python
"""End-to-end tagger EPOCH throughput: host loader vs device image store.

tools/profile_tagger.py times the bare train step on a device-resident
batch (compute ceiling); tools/profile_loader.py times the input pipeline
alone.  This tool runs the real thing — an on-disk HDF5 artifact through
TagDataset + the production train step for whole epochs — once with the
per-step host->device pixel copy (loader prefetch) and once with the
device image store (data/device_store.py), which uploads the split to HBM
once and gathers rows by a jitted index lookup.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from profile_loader import build_artifact  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--tagger-dtype", default="bfloat16")
    ap.add_argument("--remat", default="blocks")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    from indonesian_image_captioning_tpu.core.config import (
        TaggerConfig, TrainConfig)
    from indonesian_image_captioning_tpu.core.prng import per_step, root_key
    from indonesian_image_captioning_tpu.data import (
        device_store, loader as loader_lib)
    from indonesian_image_captioning_tpu.data.datasets import TagDataset
    from indonesian_image_captioning_tpu.train import tagger as tt, steps

    with tempfile.TemporaryDirectory() as tmp:
        base = build_artifact(tmp, args.n)
        tagger_cfg = TaggerConfig()
        tcfg = TrainConfig(batch_size=args.batch,
                           tagger_dtype=args.tagger_dtype,
                           encoder_remat=args.remat)
        opt = steps.make_optimizer(1e-4, 5.0)
        state = jax.device_put(tt.init_state(
            root_key(0), tcfg, tagger_cfg, opt))
        step = steps.make_tagger_train_step(
            tcfg, opt, tagger_cfg.dropout, donate=False)
        key = root_key(1)

        def epoch(ds, store, ep):
            it = loader_lib.prefetch_to_device(loader_lib.iterate(
                ds, args.batch, shuffle=True, seed=0, epoch=ep,
                with_index=store is not None))
            nonlocal_state = state
            m = None
            t0 = time.time()
            for i, batch in enumerate(it):
                if store is not None:
                    images = store.lookup(batch["index"])
                    batch = {k: v for k, v in batch.items() if k != "index"}
                    batch["images"] = images
                nonlocal_state, m = step(nonlocal_state, batch,
                                         per_step(key, ep * 1000 + i))
            loss = float(jax.device_get(m["loss"]))
            return time.time() - t0, loss

        for label, use_store in (("host loader", False),
                                 ("device store", True)):
            ds = TagDataset(tmp, base, "TRAIN")
            store = None
            if use_store:
                t0 = time.time()
                store = device_store.build(
                    ds, budget_bytes=4 << 30)
                ds.load_images = False
                print(f"{label}: one-time upload "
                      f"{time.time() - t0:.2f} s for "
                      f"{store.nbytes / (1 << 20):.0f} MiB")
            epoch(ds, store, ep=99)  # warm/compile
            for ep in range(args.epochs):
                d, loss = epoch(ds, store, ep)
                print(f"{label}: epoch {ep} {d:6.2f} s = "
                      f"{args.n / d:7.1f} imgs/s (loss {loss:.4f})")


if __name__ == "__main__":
    main()
