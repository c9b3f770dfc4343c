#!/usr/bin/env python
"""Roofline-floor the fused training-scan kernel pair (VERDICT r3 #1).

Protocol (same as tools/exp_attend_parts.py / exp_topk_floor.py did for
decode): (a) count the bytes each kernel must move and the matmul FLOPs
it must execute at b1024 flagship dims; (b) measure ablated kernels that
strip one component at a time (fwd: the per-image M=1 alpha@enc dot, the
(G, Pp, A) e-tensor VPU pass, the 8 factor->hidden gate matmuls, the h@W
projections, the awe@wxa matmul; bwd: the existing noatt/nodalpha/node/
nodea/nowf probes); (c) report each component's share and the kernel's
distance from max(DMA floor, MXU floor, VPU floor).

All timings sync on a scalar fetched from the LAST dispatch (the axon
relay inflates array fetches).  Interleave contenders within one process
(BASELINE.md: +-20% drift between measurement windows).
"""

import argparse
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


def analytic(B, T, G, S, Pp, E, A, D, F, H, F4, isz, save_awe):
    """Bytes + FLOPs the forward kernel must move/execute."""
    n_chunks = B // G
    # HBM traffic: windows once per chunk; streams once per element
    win = n_chunks * G * Pp * (E + A) * isz
    stream_in = B * T * F4 * isz                       # emb_fac
    stream_out = B * T * (2 * D * isz + Pp * 4)        # h_all c_all alphas
    if save_awe:
        stream_out += B * T * E * isz
    rows = B * (2 * F4 + 4 * D) * isz                  # semx/semh/h0/c0
    dma = win + stream_in + stream_out + rows
    # matmul MACs per image-step
    mm = D * A + D * E + E * F4 + D * F4 + 8 * F * H   # M=G rows
    mm_m1 = Pp * E                                     # alpha@enc, M=1/img
    macs = B * T * (mm + mm_m1)
    # VPU element-ops per image-step: e-tensor relu+mul+reduce (~3 passes
    # over Pp*A) + cell/softmax elementwise (small)
    vpu = B * T * (3 * Pp * A + 10 * (4 * H + Pp))
    return dma, macs, vpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--span", type=int, default=4)
    ap.add_argument("--img-tile", type=int, default=32)
    ap.add_argument("--what", default="fwd",
                    help="comma list: fwd, bwd")
    ap.add_argument("--save-awe", action="store_true",
                    help="probe the production (under-grad) forward")
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
    params = decoders.cast_params(decoders.init_decoder(
        jax.random.key(0), cfg), dt)
    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal(
        (B, 196, 2048)) * 0.1).astype(np.float32)).astype(dt)
    tags = jax.device_put(
        rng.random((B, 1000)).astype(np.float32)).astype(dt)
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
    Pp = enc_p.shape[1]
    dims = dict(Pp=Pp, E=2048, A=512, D=512, F4=F4, isz=isz)
    Gf = tp.pick_train_tile(B, S, dims=dims, backward=False,
                            img_tile=args.img_tile)
    Gb = tp.pick_train_tile(B, S, dims=dims, backward=True,
                            img_tile=args.img_tile)
    print(f"B={B} dt={args.dtype} span={S} G_fwd={Gf} G_bwd={Gb} "
          f"save_awe={args.save_awe}")

    what = args.what.split(",")
    if "fwd" in what:
        dma, macs, vpu = analytic(B, T, Gf, S, Pp, 2048, 512, 512, 512,
                                  512, F4, isz, args.save_awe)
        # measured machine rates (BASELINE.md): XLA streaming 623 GB/s,
        # Pallas block pipeline ~360 GB/s; v5e bf16 197 TFLOP/s MXU,
        # ~3.9 Tops/s VPU (8x128 x 4 ALUs x 940 MHz)
        m1_macs = B * T * Pp * 2048
        print(f"  analytic: DMA {dma / 1e9:.2f} GB "
              f"-> floor {dma / 623e9 * 1e3:.1f} (xla-rate) / "
              f"{dma / 360e9 * 1e3:.1f} ms (pallas-rate)")
        print(f"  analytic: matmul {macs * 2 / 1e12:.2f} TFLOP "
              f"(M=1 dot part {m1_macs * 2 / 1e12:.2f}) "
              f"-> MXU floor {macs * 2 / 197e9:.1f} ms at peak / "
              f"{macs * 2 / (197e9 * Gf / 128):.1f} ms at M={Gf} util")
        print(f"  analytic: VPU {vpu / 1e9:.1f} Gops "
              f"-> floor {vpu / 3.9e9:.1f} ms")

        fwd = lambda abl: tp._fwd_call(
            kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, span=S,
            num_pixels=196, img_tile=args.img_tile, interpret=False,
            save_awe=args.save_awe, ablate=abl)
        probes = [None, "noawe", "noe", "nogates", "nohproj", "noxin",
                  "skeleton"]
        for abl in probes:
            fwd(abl)  # compile
        # interleaved timing: round-robin the probes
        ms = {}
        for abl in probes:
            ms[abl] = timed(lambda a=abl: fwd(a))
        base = ms[None]
        print(f"  fwd full: {base:7.1f} ms")
        for abl in probes[1:]:
            print(f"  fwd {abl:8s}: {ms[abl]:7.1f} ms "
                  f"(component ~{base - ms[abl]:+6.1f} ms)")

    if "bwd" in what:
        h_all, c_all, alphas, awe_raw = tp._fwd_call(
            kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, span=S,
            num_pixels=196, img_tile=args.img_tile, interpret=False,
            save_awe=True)
        d_hall = jnp.ones((B, Tp, 512), dt) * 0.01
        d_alphas = jnp.zeros((B, Tp, alphas.shape[-1]), jnp.float32)
        bwd = lambda abl: tp._bwd_call(
            kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, h_all, c_all,
            alphas, awe_raw, d_hall, d_alphas, span=S, num_pixels=196,
            img_tile=args.img_tile, interpret=False, ablate=abl)
        probes = [None, "noatt", "nodalpha", "node", "nodea", "nowf"]
        for abl in probes:
            bwd(abl)
        ms = {}
        for abl in probes:
            ms[abl] = timed(lambda a=abl: bwd(a))
        base = ms[None]
        print(f"  bwd full: {base:7.1f} ms")
        for abl in probes[1:]:
            print(f"  bwd {abl:8s}: {ms[abl]:7.1f} ms "
                  f"(component ~{base - ms[abl]:+6.1f} ms)")


if __name__ == "__main__":
    main()
