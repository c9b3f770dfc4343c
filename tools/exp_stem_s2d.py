#!/usr/bin/env python
"""Space-to-depth stem experiment (MLPerf-style exact transform).

The ResNet stem conv (7x7 stride 2 on 3-channel input) runs at ~10% MFU
(tools/profile_encoder_parts.py): with C=3 the contraction is 7*7*3=147
multiply-adds feeding 128 MXU lanes from a 3-deep channel axis — the
classic TPU small-channels stem problem.

Exact rewrite: 2x2 space-to-depth the input to (B, H/2, W/2, 12) and run
an equivalent 4x4 stride-1 conv whose (4,4,12,64) kernel is the 7x7x3
kernel scattered into cell space (one zero tap row/col).  Identical math —
every output value is the same sum of the same 147 products.

This tool checks exactness vs the standard stem and times, at serving
config (B=256, bf16, 256px):
  * stem alone (conv + BN + relu + maxpool), both ways;
  * the FULL ResNet-152 encoder forward, both ways.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    def s2d(x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                     4 * C)

    def s2d_weights(w7):
        # (7,7,3,64) -> (4,4,12,64): pad a zero leading row/col so padded
        # tap index p = k+1; cell a = p//2, in-cell dy = p%2 -> k = 2a+dy-1,
        # exactly the cell-space geometry of the 7x7 stride-2 window.
        wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        return wp.reshape(4, 2, 4, 2, 3, -1).transpose(
            0, 2, 1, 3, 4, 5).reshape(4, 4, 12, -1)

    def stem_conv7(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stem_s2d(x, w):
        return jax.lax.conv_general_dilated(
            s2d(x), s2d_weights(w).astype(x.dtype), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = jnp.dtype(args.dtype)
    B, S = args.batch, args.image_size
    params, stats = resnet.init_resnet(jax.random.key(0), "resnet152")
    params = jax.device_put(jax.tree.map(lambda x: x.astype(dt), params))
    stats = jax.device_put(stats)
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        (B, S, S, 3), np.float32).astype(dt))

    # --- exactness (f32, small batch) ---
    xf = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 64, 3),
                                                              np.float32))
    wf = jnp.asarray(np.random.default_rng(2).standard_normal((7, 7, 3, 64),
                                                              np.float32))
    a = jax.jit(stem_conv7)(xf, wf)
    b = jax.jit(stem_s2d)(xf, wf)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    print(f"exactness (f32): shapes {a.shape} vs {b.shape}, "
          f"max rel err {err:.2e}")
    assert a.shape == b.shape and err < 1e-5

    # --- timed variants ---
    def full_stem(conv):
        def f(p, s, x):
            y = conv(x, p["conv1"])
            y, _ = resnet._bn(y, p["bn1"], s["bn1"], False)
            y = jax.nn.relu(y)
            y = resnet._max_pool_3x3s2(y)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(f)

    def full_encoder(conv):
        def f(p, s, x):
            y = conv(x, p["conv1"])
            y, _ = resnet._bn(y, p["bn1"], s["bn1"], False)
            y = jax.nn.relu(y)
            y = resnet._max_pool_3x3s2(y)
            for stage in range(1, 5):
                stride = 1 if stage == 1 else 2
                y, _ = resnet._stage(y, p[f"layer{stage}"],
                                     s[f"layer{stage}"], stride, False)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(f)

    fns = {"stem/conv7": full_stem(stem_conv7),
           "stem/s2d": full_stem(stem_s2d),
           "full/conv7": full_encoder(stem_conv7),
           "full/s2d": full_encoder(stem_s2d)}
    for f in fns.values():
        float(jax.device_get(f(params, stats, x)))

    for r in range(args.rounds):
        for k, f in fns.items():
            t0 = time.time()
            for _ in range(args.iters):
                out = f(params, stats, x)
            float(jax.device_get(out))
            d = (time.time() - t0) / args.iters * 1e3
            print(f"round {r} {k:12s} {d:7.2f} ms/batch "
                  f"({B / d * 1e3:7.0f} imgs/s)")


if __name__ == "__main__":
    main()
