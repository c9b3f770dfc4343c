#!/usr/bin/env python
"""Floor-probe the OUTSIDE-kernel caption train-step remainder
(VERDICT r4 #2): per-component measured time vs an analytic roofline
(max of MXU FLOP time and HBM byte time) at flagship b1024 bf16.

Components probed standalone (each its own jitted program, scalar-sync
timing), then compared against the full step:
  scan    — fused teacher-forcing scan fwd+bwd (kernel pair; floor-probed
            separately in r4 via exp_train_floor)
  head    — chunked CE head fwd+bwd (ops/vocab_head.py)
  embed   — embedding lookup fwd + matmul backward
  adam    — clamp + Adam update + apply_updates on decoder-sized grads
  full    — the whole production train step

Roofline constants: v5e 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
Reference anchor: the trained hot loop, /root/reference/models/
scn_cell.py:52-154 and trains/attention_scn.py:178-271.

Usage: python tools/exp_head_floor.py [--batch 1024] [--vocab 6763]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from indonesian_image_captioning_tpu.core import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from indonesian_image_captioning_tpu.core.config import (  # noqa: E402
    ModelConfig, TrainConfig)
from indonesian_image_captioning_tpu.core.prng import root_key  # noqa: E402
from indonesian_image_captioning_tpu.train import (  # noqa: E402
    caption as caption_train, steps)

PEAK_FLOPS = 197e12
HBM_BW = 819e9


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.time() - t0) / iters * 1e3


def line(name, ms, flops, bytes_):
    floor = max(flops / PEAK_FLOPS, bytes_ / HBM_BW) * 1e3
    print(json.dumps({
        "component": name, "ms": round(ms, 2),
        "gflop": round(flops / 1e9, 1), "gbytes": round(bytes_ / 1e9, 2),
        "floor_ms": round(floor, 2),
        "pct_of_floor": round(floor / ms * 100, 1) if ms else None,
    }), flush=True)
    return floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=6763)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--with-scan", action="store_true",
                    help="also compile+time the fused scan standalone "
                         "(very slow first compile)")
    a = ap.parse_args()
    B, V = a.batch, a.vocab
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V)
    T = cfg.max_caption_len - 1
    N = B * T
    D, E, A, S = (cfg.decoder_dim, cfg.encoder_dim, cfg.attention_dim,
                  cfg.semantic_dim)
    F4 = 4 * cfg.factored_dim
    P = cfg.num_pixels
    cdt = jnp.dtype(a.dtype)
    bs = 2 if cdt == jnp.bfloat16 else 4

    opt = steps.make_optimizer(4e-4, 5.0)
    state = jax.device_put(caption_train.init_state(root_key(0), cfg, opt))
    params = state["params"]
    tcfg = TrainConfig(batch_size=B, decoder_dtype=a.dtype)
    rng = np.random.default_rng(0)
    enc = jax.device_put((rng.standard_normal((B, 14, 14, E)) * 0.1
                          ).astype(np.float32))
    tags = jax.device_put(rng.random((B, S)).astype(np.float32))
    caps = jax.device_put(rng.integers(1, V, (B, T + 1)).astype(np.int32))
    caplens = jax.device_put(np.full((B,), 30, np.int32))
    key = jax.random.key(1)

    def progress(msg):
        print(json.dumps({"progress": msg}), flush=True)

    progress("full step")
    # ---- full step ----
    _, step = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)
    sub = {"params": params, "opt_state": state["opt_state"]}
    t_full = timeit(lambda: step(sub, enc, tags, caps, caplens, key)[1],
                    iters=5)

    print(json.dumps({"experiment": "head_floor", "batch": B, "vocab": V,
                      "dtype": a.dtype, "full_step_ms": round(t_full, 1)},),
          flush=True)

    progress("head")
    # ---- chunked head fwd+bwd ----
    from indonesian_image_captioning_tpu.ops.vocab_head import chunked_ce_topk
    h = jax.device_put((rng.standard_normal((B, T, D)) * 0.5).astype(cdt))
    fcc = jax.tree.map(lambda x: x.astype(cdt), params["fc"])
    tgt = caps[:, 1:]
    mask = jnp.ones((B, T), jnp.float32)

    def head_loss(fc, h):
        return chunked_ce_topk(fc, h, tgt, mask,
                               tile=tcfg.head_tile)[0]

    head_g = jax.jit(jax.value_and_grad(head_loss, argnums=(0, 1)))
    t_head = timeit(lambda: head_g(fcc, h)[0])
    # 5 logit-sized matmul passes (lse, counts, bwd-recompute, d_h, d_w)
    head_flops = 5 * 2 * N * D * V
    # operand traffic per pass: h (N*D) + w (D*V) + tile round-trips ~2x
    head_bytes = 5 * (N * D * bs + D * V * bs) + 3 * N * V * 4
    f_head = line("head_fwd_bwd_chunked", t_head, head_flops, head_bytes)

    progress("embed")
    # ---- embedding fwd+bwd ----
    from indonesian_image_captioning_tpu.models.decoders import embed_lookup
    embt = params["embedding"].astype(cdt)

    def emb_loss(table):
        return (embed_lookup(table, caps[:, :T]) * h[..., :cfg.embed_dim]
                ).sum()

    emb_g = jax.jit(jax.grad(emb_loss))
    t_emb = timeit(lambda: emb_g(embt))
    emb_flops = 2 * N * V * cfg.embed_dim      # one-hot contraction bwd
    emb_bytes = 2 * (N * cfg.embed_dim * bs) + 2 * V * cfg.embed_dim * bs \
        + N * V * bs                            # one-hot write/read
    f_emb = line("embed_fwd_bwd", t_emb, emb_flops, emb_bytes)

    progress("adam")
    # ---- Adam (clamp + inject + apply) ----
    grads = jax.tree.map(lambda x: (jnp.ones_like(x) * 1e-3), params)

    @jax.jit
    def adam_step(substate, grads):
        upd, new_opt = opt.update(grads, substate["opt_state"],
                                  substate["params"])
        import optax
        return {"params": optax.apply_updates(substate["params"], upd),
                "opt_state": new_opt}

    t_adam = timeit(lambda: adam_step(sub, grads))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # reads: p, g, mu, nu; writes: p, mu, nu  (all f32 masters)
    adam_bytes = n_params * 4 * 7
    adam_flops = n_params * 10
    f_adam = line("adam_update", t_adam, adam_flops, adam_bytes)

    progress("scan")
    # ---- fused scan fwd+bwd (cotangent-shaped backward) ----
    from indonesian_image_captioning_tpu.models import decoders
    proj = jax.device_put((rng.standard_normal((D,)) * 0.1).astype(cdt))

    def scan_loss(p):
        pc = jax.tree.map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
        out = decoders.teacher_forcing(
            pc, cfg, enc.astype(cdt), tags.astype(cdt), caps, caplens,
            dropout_rng=key, train=True, return_hidden=True)
        return (out["hidden"] * proj).sum().astype(jnp.float32), out["mask"]

    # scan matmul flops (fwd): per step/row — attention (E+D)@A + P@A,
    # cell x@(4F) with x = emb(512)+awe(2048), h@(4F), 8 factor-gate
    # products; 3x for fwd+bwd
    scan_mm = T * B * 2 * (E * A + D * A + P * A
                           + (cfg.embed_dim + E) * F4 + D * F4
                           + 8 * cfg.factored_dim * D)
    scan_flops = 3 * scan_mm
    scan_bytes = 3 * B * P * (E + A) * bs       # enc/enc_att stream x3
    if a.with_scan:
        # a projection-loss grad through the fused kernel pair is a NEW
        # autodiff structure whose Mosaic compile ran >30 min through the
        # remote tunnel (twice) — opt-in only; the kernels' own floors
        # are pinned by tools/exp_train_floor.py (r4)
        try:
            scan_g = jax.jit(jax.grad(lambda p: scan_loss(p)[0]))
            t_scan = timeit(lambda: scan_g(params), iters=5)
            f_scan = line("scan_fwd_bwd", t_scan, scan_flops, scan_bytes)
        except Exception as e:  # transient remote-compile tunnel failures
            print(json.dumps({"component": "scan_fwd_bwd",
                              "error": str(e)[:160]}), flush=True)
            a.with_scan = False
    if not a.with_scan:
        # residual attribution: full step minus the measured remainder
        # (the kernel pair's internal floors are exp_train_floor's job)
        t_scan = max(t_full - t_head - t_emb - t_adam, 0.0)
        f_scan = line("scan_fwd_bwd(residual)", t_scan, scan_flops,
                      scan_bytes)
    floor_sum = f_scan + f_head + f_emb + f_adam
    parts = t_scan + t_head + t_emb + t_adam
    print(json.dumps({
        "component": "TOTAL", "full_step_ms": round(t_full, 1),
        "sum_parts_ms": round(parts, 1),
        "unattributed_ms": round(t_full - parts, 1),
        "sum_floors_ms": round(floor_sum, 1),
        "step_pct_of_floor": round(floor_sum / t_full * 100, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
