#!/usr/bin/env python
"""Time the fused training-scan kernels individually vs the XLA scan
pieces, with scalar-fetch sync.  Optional G/span overrides to sweep the
schedule.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, iters=5):
    import jax

    out = fn()
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.time() - t0) / iters * 1e3


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--span", type=int, default=4)
    ap.add_argument("--img-tile", type=int, default=32)
    ap.add_argument("--what", default="fwd,bwd,xla")
    args = ap.parse_args()

    from indonesian_image_captioning_tpu.core import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import decoders, scn_cell
    from indonesian_image_captioning_tpu.ops import train_pallas as tp
    from indonesian_image_captioning_tpu.ops.attention_pallas import \
        pad_pixels

    B = args.batch
    dt = jnp.dtype(args.dtype)
    V = 6763
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    params0 = decoders.init_decoder(jax.random.key(0), cfg)
    params = decoders.cast_params(params0, dt)
    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal(
        (B, 196, 2048)) * 0.1).astype(np.float32)).astype(dt)
    tags = jax.device_put(rng.random((B, 1000)).astype(np.float32)) \
        .astype(dt)
    T = 51
    emb = jax.device_put((rng.standard_normal(
        (B, T, 512)) * 0.1).astype(np.float32)).astype(dt)

    S = args.span
    Tp = tp._span_pad(T, S)
    F4 = 4 * cfg.factored_dim
    cell = params["decode_step"]
    enc_p = pad_pixels(enc)
    ea_p = pad_pixels(attn.precompute(params["attention"], enc))
    sx, sh = scn_cell.semantic_projections(cell, tags)
    semx = sx.reshape(B, F4).astype(dt)
    semh = sh.reshape(B, F4).astype(dt)
    h0, c0 = decoders.init_hidden_state(params, enc)
    h0, c0 = h0.astype(dt), c0.astype(dt)
    emb_fac = jnp.pad((emb @ cell["w_x"][:512]).astype(dt),
                      ((0, 0), (0, Tp - T), (0, 0)))
    kw = tp.pack_train_weights(params, cfg, dt)
    isz = dt.itemsize
    dims = dict(Pp=enc_p.shape[1], E=2048, A=512, D=512, F4=F4, isz=isz)
    Gf = tp.pick_train_tile(B, S, dims=dims, backward=False,
                            img_tile=args.img_tile)
    Gb = tp.pick_train_tile(B, S, dims=dims, backward=True,
                            img_tile=args.img_tile)
    print(f"B={B} dt={args.dtype} span={S} G_fwd={Gf} G_bwd={Gb}")

    fwd = lambda **kw2: tp._fwd_call(kw, enc_p, ea_p, emb_fac, semx,
                                     semh, h0, c0, span=S,
                                     num_pixels=196,
                                     img_tile=args.img_tile,
                                     interpret=False, **kw2)
    what = args.what.split(",")
    if "fwd" in what:
        fwd()
        print(f"  fwd kernel : {timed(fwd):7.1f} ms")
    if "fwdsave" in what:
        fwd(save_awe=True)
        print(f"  fwd kernel (save_awe): "
              f"{timed(lambda: fwd(save_awe=True)):7.1f} ms")
    for w in what:
        if not w.startswith("bwd"):
            continue
        ablate = w[3:].lstrip("-:") or None
        known = (None, "noatt", "nodalpha", "node", "nodea", "nowf")
        if ablate not in known:
            raise SystemExit(f"unknown bwd ablation {ablate!r}; "
                             f"expected one of {known[1:]}")
        h_all, c_all, alphas, awe_raw = fwd(save_awe=True)
        d_hall = jnp.ones((B, Tp, 512), dt) * 0.01
        d_alphas = jnp.zeros((B, Tp, alphas.shape[-1]), jnp.float32)
        bwd = lambda: tp._bwd_call(kw, enc_p, ea_p, emb_fac, semx, semh,
                                   h0, c0, h_all, c_all, alphas, awe_raw,
                                   d_hall, d_alphas, span=S,
                                   num_pixels=196,
                                   img_tile=args.img_tile,
                                   interpret=False, ablate=ablate)
        print(f"  bwd kernel ({ablate}): {timed(bwd):7.1f} ms")
    if "xla" in what:
        caps = jax.device_put(rng.integers(
            1, V, (B, 52)).astype(np.int32))
        caplens = jax.device_put(np.full((B,), 30, np.int32))

        @jax.jit
        def xla_fwd(params, enc, tags, caps, caplens):
            import dataclasses
            c2 = dataclasses.replace(cfg, train_scan_impl="xla")
            out = decoders.teacher_forcing(params, c2, enc, tags, caps,
                                           caplens, train=False)
            return out["predictions"].sum(), out["alphas"].sum()

        print(f"  xla fwd+head: "
              f"{timed(lambda: xla_fwd(params, enc, tags, caps, caplens)):7.1f} ms")


if __name__ == "__main__":
    main()
