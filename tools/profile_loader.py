#!/usr/bin/env python
"""Input-pipeline throughput: can the host feed the train step?

SURVEY.md §7 calls the reference's single-h5py-worker DataLoader its #1
input bottleneck.  This framework's answer is datasets.py (in-RAM or
windowed HDF5 gathers) + loader.prefetch_to_device (background thread
overlapping gather + device_put with device compute).  This tool measures,
against a synthetic on-disk HDF5 artifact at flagship shapes
(3x256x256 uint8):

  * host gather throughput, in-RAM vs windowed HDF5 (shuffled epochs);
  * sustained imgs/s through prefetch_to_device with a device consumer
    that syncs every batch (the train-loop pattern);
  * the same overlapped with a simulated train step, to show the pipeline
    hides the input time rather than adding to it.

Compare the sustained number against the measured train steps
(BASELINE.md): tagger b128 bf16 = 618 imgs/s, cached-epoch caption
b1024 = 6,228 imgs/s (cached epochs gather 52-token captions, not pixels —
measured separately below).
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_artifact(folder: str, n: int, tag_size: int = 1000) -> str:
    import h5py
    import numpy as np
    base = "synthbench_5_cap_per_img_5_min_word_freq"
    rng = np.random.default_rng(0)
    with h5py.File(os.path.join(folder, f"TRAIN_IMAGES_{base}.hdf5"),
                   "w") as h:
        h.attrs["captions_per_image"] = 5
        d = h.create_dataset("images", (n, 3, 256, 256), np.uint8)
        for i in range(0, n, 256):  # chunked writes keep RAM flat
            j = min(i + 256, n)
            d[i:j] = rng.integers(0, 256, (j - i, 3, 256, 256), np.uint8)
    with h5py.File(os.path.join(folder, f"TRAIN_TAGS_{base}.hdf5"),
                   "w") as h:
        h.attrs["tag_size"] = tag_size
        h.create_dataset("tags", data=(rng.random((n, tag_size)) < 0.01)
                         .astype(np.float32))
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048, help="dataset images")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--step-ms", type=float, default=207.0,
                    help="simulated train-step cost (default: the measured "
                         "b128 bf16 tagger step)")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import numpy as np
    from indonesian_image_captioning_tpu.data import loader as loader_lib
    from indonesian_image_captioning_tpu.data.datasets import TagDataset

    with tempfile.TemporaryDirectory() as tmp:
        base = build_artifact(tmp, args.n)
        B, n = args.batch, args.n

        for label, in_memory in (("in-RAM", True), ("windowed HDF5", False)):
            ds = TagDataset(tmp, base, "TRAIN", in_memory=in_memory)

            # 1. host gather only
            t0 = time.time()
            for ep in range(args.epochs):
                for batch in loader_lib.iterate(ds, B, shuffle=True,
                                                seed=1, epoch=ep):
                    pass
            d = time.time() - t0
            rate_h = args.epochs * n / d
            print(f"{label:14s} host gather:            "
                  f"{rate_h:10.0f} imgs/s")

            # 2. + prefetch_to_device with a per-batch device sync
            t0 = time.time()
            for ep in range(args.epochs):
                for batch in loader_lib.prefetch_to_device(
                        loader_lib.iterate(ds, B, shuffle=True,
                                           seed=1, epoch=ep)):
                    jax.block_until_ready(batch["images"])
            d = time.time() - t0
            rate_d = args.epochs * n / d
            print(f"{label:14s} + device prefetch:      "
                  f"{rate_d:10.0f} imgs/s")

            # 3. overlapped with a simulated train step: sustained rate
            # should approach B / max(step, input) — i.e. the pipeline
            # hides whichever side is cheaper.
            t0 = time.time()
            steps = 0
            for ep in range(args.epochs):
                for batch in loader_lib.prefetch_to_device(
                        loader_lib.iterate(ds, B, shuffle=True,
                                           seed=1, epoch=ep)):
                    jax.block_until_ready(batch["images"])
                    time.sleep(args.step_ms / 1e3)  # the "train step"
                    steps += 1
            d = time.time() - t0
            overhead = (d - steps * args.step_ms / 1e3) / steps * 1e3
            print(f"{label:14s} overlapped w/ {args.step_ms:.0f} ms step: "
                  f"{args.epochs * n / d:7.0f} imgs/s "
                  f"(input adds {overhead:+.1f} ms/batch)")


if __name__ == "__main__":
    main()
