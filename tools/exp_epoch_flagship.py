#!/usr/bin/env python
"""Whole-epoch flagship caption-training throughput (VERDICT r3 #7).

The BASELINE step-time rows (147 ms cached-epoch b1024) say nothing about
what a USER's epoch costs end to end.  This runs the PUBLIC trainer
(train/caption.py via cli/train.py) at flagship shape — 256px images,
ResNet-152 encoders, 512-wide attention_scn decoder, semantic width 1000,
5 captions/image — over a synthetic on-disk corpus through the real
pipeline: HDF5 loader, feature cache build (epoch 1), cached steady-state
epochs, greedy validation decode, async orbax checkpointing.  Reports
per-epoch wall time and steady-state imgs/s.

Run: python tools/exp_epoch_flagship.py [--images 1288] [--batch 1024]
"""

import argparse
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1288)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--decoder-dtype", default="bfloat16")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()

    td = tempfile.mkdtemp(prefix="epoch_flagship_")
    print(f"building synthetic flagship corpus ({args.images} images, "
          f"256px, 5 cpi, 1000 tags) under {td} ...")
    t0 = time.time()
    from indonesian_image_captioning_tpu.data.synthetic import (
        make_synthetic_corpus)
    n_train = args.images - 2 * max(args.images // 10, 4)
    data_cfg = make_synthetic_corpus(
        os.path.join(td, "root"), os.path.join(td, "scn"),
        n_images=args.images, n_train=n_train, image_size=256,
        # max_len=50: artifact rows are max_len + 2 ids (<start>/<end>,
        # data/preprocess.py) = 52 = ModelConfig.max_caption_len's
        # flagship default — 52 here made 54-wide rows that broke the
        # step's (B, T) shapes
        captions_per_image=5, caption_words=8, max_len=50,
        tag_vocab=tuple(f"tag{i}" for i in range(1000)))
    print(f"  corpus ready in {time.time() - t0:.0f}s "
          f"(TRAIN {n_train} images = {n_train * 5} caption rows)")

    from indonesian_image_captioning_tpu.core.config import TrainConfig
    from indonesian_image_captioning_tpu.train import caption

    lines = []

    def log(msg):
        lines.append(str(msg))
        if "epoch time" in str(msg) or "BLEU" in str(msg):
            print(str(msg).strip())

    tcfg = TrainConfig(batch_size=args.batch, epochs=args.epochs,
                       decoder_dtype=args.decoder_dtype,
                       cache_features=True,
                       checkpoint_dir=os.path.join(td, "ckpt"))
    os.makedirs(tcfg.checkpoint_dir, exist_ok=True)
    t0 = time.time()
    caption.main("attention_scn", data_cfg, tcfg, log=log)
    total = time.time() - t0

    times = [float(m.group(1)) for ln in lines
             if (m := re.search(r"epoch time ([0-9.]+)s", ln))]
    rows = n_train * 5
    print(f"\ntotal wall (incl. corpus-feature cache build + compiles): "
          f"{total:.0f}s")
    for i, t in enumerate(times):
        print(f"epoch {i + 1}: {t:.1f}s = {rows / t:.0f} caption-rows/s")
    if len(times) > 1:
        steady = min(times[1:])
        print(f"STEADY-STATE EPOCH: {steady:.1f}s = {rows / steady:.0f} "
              f"caption-rows/s (train + greedy validation decode + async "
              f"checkpoint, b{args.batch} {args.decoder_dtype})")


if __name__ == "__main__":
    main()
