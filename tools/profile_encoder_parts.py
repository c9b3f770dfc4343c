#!/usr/bin/env python
"""Where does the ResNet-152 encoder forward spend its time?

Times jitted TRUNCATED forwards on the real chip — stem only (conv7x7/2 +
BN + relu + maxpool3x3/2), then cumulatively through each residual stage —
at serving config (eval-mode BN, bf16, batch 256).  Successive differences
give the per-stage cost; comparing against each stage's analytic FLOPs
shows which part runs furthest from the MXU roofline (the encoder is
56% MFU end-to-end — this locates the other 44%).

Sync is on a SCALAR reduction of the truncated output (feature maps must
never travel through this rig's relay, see tools/profile_train.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# Analytic fwd GFLOPs per image per cumulative prefix at 256px input
# (2 * MACs, conv only).  Derived from the torchvision resnet152 layout:
# stem 0.32, layer1 (3 blocks @128x128->64x64) 2.70, layer2 (8 blocks)
# 7.16, layer3 (36 blocks) 16.32, layer4 (3 blocks) 3.77 — total 30.3
# (BASELINE.md encoder FLOPs row).
STAGE_GFLOPS = {"stem": 0.32, "layer1": 2.70, "layer2": 7.16,
                "layer3": 16.32, "layer4": 3.77}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.models import resnet

    dt = jnp.dtype(args.dtype)
    params, stats = resnet.init_resnet(jax.random.key(0), "resnet152")
    params = jax.device_put(jax.tree.map(lambda x: x.astype(dt), params))
    stats = jax.device_put(stats)
    B, S = args.batch, args.image_size
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        (B, S, S, 3), np.float32).astype(dt))

    def prefix_fn(upto: int):
        # upto: 0 = stem only, k = stem + layers 1..k
        def f(p, s, x):
            y = resnet._conv(x, p["conv1"], 2, [(3, 3), (3, 3)])
            y, _ = resnet._bn(y, p["bn1"], s["bn1"], False)
            y = jax.nn.relu(y)
            y = resnet._max_pool_3x3s2(y)
            for stage in range(1, upto + 1):
                stride = 1 if stage == 1 else 2
                y, _ = resnet._stage(y, p[f"layer{stage}"],
                                     s[f"layer{stage}"], stride, False)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(f)

    names = ["stem", "layer1", "layer2", "layer3", "layer4"]
    fns = {k: prefix_fn(i) for i, k in enumerate(names)}
    for f in fns.values():
        float(jax.device_get(f(params, stats, x)))  # compile + warm

    for r in range(args.rounds):
        cum = {}
        for k, f in fns.items():
            t0 = time.time()
            for _ in range(args.iters):
                out = f(params, stats, x)
            float(jax.device_get(out))
            cum[k] = (time.time() - t0) / args.iters * 1e3
        prev = 0.0
        print(f"round {r} (B={B}, {args.dtype}, {S}px):")
        for k in names:
            d = cum[k] - prev
            gf = STAGE_GFLOPS[k] * B
            tf = gf / max(d, 1e-9)  # GFLOP / ms = TFLOP/s
            print(f"  {k:7s} cumulative {cum[k]:7.2f} ms   stage {d:7.2f} ms"
                  f"   ~{tf:6.1f} TFLOP/s ({tf / 197 * 100:4.1f}% of v5e "
                  f"bf16 peak)")
            prev = cum[k]


if __name__ == "__main__":
    main()
