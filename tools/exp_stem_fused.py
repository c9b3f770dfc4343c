#!/usr/bin/env python
"""Fused-stem feasibility probe: measure the floors a fully fused
conv7x7s2 + BN + relu + maxpool Pallas stem kernel would have to beat.

Why a probe and not a kernel: with C_in=3 the stem contraction is
7*7*3 = 147 multiply-adds, and on the MXU there are only two ways to
express it —

  (a) x-unfold only (im2col over kx,c): seven K=21 matmuls per conv row.
      K=21 fills 21/128 of the MXU contraction lanes, so the compute
      floor is ~5x the ideal conv time, and the unfolded operand is
      3.2x the input bytes.
  (b) full unfold (im2col over ky,kx,c): one K=147 matmul at decent MXU
      utilisation, but the y-overlap of stride-2 7-row windows makes
      the unfolded operand ~3.4x the CONV-OUTPUT row count, i.e. >1 GB
      of HBM at serving batch — the kernel becomes a pure HBM copy.

This tool measures, at serving config (B=256, bf16, 256px):
  * the current XLA stem (conv + eval BN + relu + maxpool) and its
    pieces (conv alone; conv+bn+relu) — what fusion could save;
  * formulation (a)'s matmul train at exactly its shapes/dtypes;
  * formulation (b)'s single matmul at exactly its shapes/dtypes
    (operand read included — it is intrinsic to the formulation);
  * the x-unfold (U2) build+write pass both formulations need.

If max(compute floor, traffic floor) + U2 build is not clearly below
the measured XLA stem, a fused stem kernel cannot win and the negative
verdict is recorded without spending a week on Mosaic layout work.
Reference anchor: the ResNet-152 consumption in
/root/reference/models/encoders/caption.py:6-57 (torchvision stem).
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

    dt = jnp.dtype(args.dtype)
    B, S = args.batch, args.image_size
    Ho = S // 2                                       # conv output rows
    params, stats = resnet.init_resnet(jax.random.key(0), "resnet152")
    params = jax.device_put(jax.tree.map(lambda x: x.astype(dt), params))
    stats = jax.device_put(stats)
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        (B, S, S, 3), np.float32).astype(dt))

    def conv7(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stem(p, s, x):
        y = conv7(x, p["conv1"])
        y, _ = resnet._bn(y, p["bn1"], s["bn1"], False)
        y = jax.nn.relu(y)
        y = resnet._max_pool_3x3s2(y)
        return jnp.sum(y.astype(jnp.float32))

    def conv_only(p, s, x):
        return jnp.sum(conv7(x, p["conv1"]).astype(jnp.float32))

    def conv_bn_relu(p, s, x):
        y = conv7(x, p["conv1"])
        y, _ = resnet._bn(y, p["bn1"], s["bn1"], False)
        return jnp.sum(jax.nn.relu(y).astype(jnp.float32))

    # ---- U2 build: x-unfold (kx, c) with x kept minor-most so the HBM
    # layout stays compact ((..., 21) would tile-pad 21 -> 128) ----
    def u2_build(x):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        cols = [xp[:, :, kx:kx + 2 * Ho - 1:2, :] for kx in range(7)]
        u2 = jnp.concatenate(cols, axis=-1)           # (B, S+6, Ho, 21)
        return jnp.swapaxes(u2, 2, 3)                 # (B, S+6, 21, Ho)

    u2_shape = (B, S + 6, 21, Ho)

    # ---- formulation (a): seven K=21 (pad 24) matmuls per conv row;
    # probe with the y-batched equivalent (best case for the MXU) ----
    rng = np.random.default_rng(1)
    lhs_a = jax.device_put(rng.standard_normal(
        (B * Ho * Ho, 24), np.float32).astype(dt))
    w_a = jax.device_put(rng.standard_normal((24, 64), np.float32)
                         .astype(dt))

    def floor_a(lhs, w):
        acc = jnp.zeros((lhs.shape[0], 64), jnp.float32)
        for _ in range(7):
            acc = acc + jax.lax.dot_general(
                lhs, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(acc)

    # ---- formulation (b): one K=147 (pad 160) matmul over the fully
    # unfolded operand (its 3.4x row duplication is intrinsic) ----
    lhs_b = jax.device_put(rng.standard_normal(
        (B * Ho * Ho, 160), np.float32).astype(dt))
    w_b = jax.device_put(rng.standard_normal((160, 64), np.float32)
                         .astype(dt))

    def floor_b(lhs, w):
        return jnp.sum(jax.lax.dot_general(
            lhs, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    fns = {
        "stem/xla (conv+bn+relu+pool)": lambda: jstem(params, stats, x),
        "stem/conv-only": lambda: jconv(params, stats, x),
        "stem/conv+bn+relu": lambda: jcbr(params, stats, x),
        "u2/build+write": lambda: ju2(x),
        "floor/a 7xK24 matmuls": lambda: jfa(lhs_a, w_a),
        "floor/b 1xK160 matmul": lambda: jfb(lhs_b, w_b),
    }
    jstem = jax.jit(stem)
    jconv = jax.jit(conv_only)
    jcbr = jax.jit(conv_bn_relu)
    ju2 = jax.jit(lambda x: jnp.sum(u2_build(x).astype(jnp.float32)))
    jfa = jax.jit(floor_a)
    jfb = jax.jit(floor_b)

    for f in fns.values():
        float(jax.device_get(f()))
    print(f"B={B} {args.dtype} {S}px; U2 {u2_shape} "
          f"({np.prod(u2_shape) * dt.itemsize / 1e6:.0f} MB)")
    for r in range(args.rounds):
        for k, f in fns.items():
            t0 = time.time()
            for _ in range(args.iters):
                out = f()
            float(jax.device_get(out))
            d = (time.time() - t0) / args.iters * 1e3
            print(f"round {r} {k:30s} {d:7.2f} ms/batch")


if __name__ == "__main__":
    main()
