"""Fused decode-STEP Pallas kernel: attention + cell + vocab head, one call.

Why this shape: the decode step is a serial chain (attend -> f_beta gate ->
SCN cell -> fc head -> top-k), and on this chip the attention part is ~89%
HBM DMA of the loop-invariant enc/enc_att (~3.0 ms/step at B=1024 bf16)
while everything else is MXU/VPU work (~1.5-2 ms).  Run as separate XLA
ops they SERIALIZE: a TPU core executes one op at a time, so the step pays
DMA + compute.  Inside one Pallas kernel gridded over image chunks, the
pipeline prefetches chunk i+1's encoder blocks WHILE chunk i computes the
cell/head — the step approaches max(DMA, compute) instead of the sum.

Unlike the full-decode megakernel (ops/decode_pallas.py, which keeps enc
resident across all 51 steps but pays unusable per-chunk utilisation at
G*K = 80 rows), this kernel holds NOTHING across steps: G=32 images per
chunk (R = 160 rows per matmul), weights fetched once per call via
constant blocks, and the beam engine keeps ALL bookkeeping — the kernel
slots into the existing sparse-head ``step_fn`` protocol by returning
per-lane top-K logit candidates + logsumexp alongside the new (h, c).

Per-step computation (reference attention_scn.py:217-260, scn_cell.py:
52-154):  dec = h @ Wda + b;  per image: att[p,k] = wf . relu(ea[p] +
dec[k]), alpha = softmax_p, awe = alpha^T enc (block-diagonal grouped
matmul);  gate = sigmoid(h @ Wfb + b);  SCN recurrence on
[emb; gate*awe];  logits = h' @ Wfc + b;  per-lane top-K of logits by
K argmax+mask rounds (lax.top_k first-occurrence order) + f32 logsumexp.

Exactness: matches the step-loop XLA path bit-for-beam at f32; at bf16
the candidate scores are f32 (logit - lse) where the XLA path rounds
log-softmax to bf16 — near-ties can resolve differently (same contract as
every serving-precision choice here, see ModelConfig.decode_impl).
Embedding lookup stays OUTSIDE (XLA gather is cheap); the kernel takes the
embedded rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _compiler_params, pad_pixels

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# VMEM budget for the G picker: just under the 114 MB scoped limit the
# kernels request (attention_pallas._VMEM_LIMIT; v5e has 128 MB total).
# The estimate below reproduces the compiler's own scoped-VMEM report to
# ~1% (the e2e f32 G=32 OOM: estimated 205 MB vs reported 202.5 MB).
_VMEM_BUDGET = 112 * 1024 * 1024


def _estimate_vmem(G, K, *, Pp, E, A, D, Emb, F4, Vp, isz, group=8,
                   isz_enc=None):
    """Estimated scoped-VMEM bytes for a (G, group) schedule at item size
    isz: double-buffered input windows (enc/enc_att chunks + row blocks),
    single-buffered constant weight blocks, outputs, scratch, and the f32
    logits / top-k work arrays the head materialises (incl. spill).
    isz_enc: item size of the enc/enc_att windows when they differ from
    isz (1 for the int8 serving mode, which adds two f32 scale columns)."""
    R = G * K
    m = min(group, G)
    while G % m:
        m -= 1
    enc_isz = isz if isz_enc is None else isz_enc
    scales = 8 if isz_enc is not None else 0          # two f32 scale cols
    win = 2 * G * Pp * ((E + A) * enc_isz + scales)   # enc + enc_att windows
    rows = 2 * R * (Emb + 2 * D + 2 * F4) * isz       # emb/h/c/semx/semh
    weights = (D * A + 2 * A + D * E + E + (Emb + E + D) * F4
               + 2 * F4 * D + 8 * D + D * Vp + Vp) * isz
    outs = 2 * R * (2 * D * isz + (2 * K + 1) * 4)
    scratch = (m * Pp * m * K + R * A + R * E) * isz
    logits = 3 * R * Vp * 4                           # lg + work + spill
    return win + rows + weights + outs + scratch + logits


def pick_step_tile(B: int, K: int, img_tile: int = 32, *, dims=None):
    """Largest image tile G <= img_tile with B % G == 0 and (G*K) % 8 == 0
    (Mosaic sublane rule for the (G*K, d) row blocks), or None — callers
    (decode/api.py "auto") then fall back to the step-loop engine.  Differs
    from decode_pallas.pick_img_tile in the default ceiling: with no VMEM
    residency across steps this kernel runs G=32 chunks.

    dims (optional): dict of the kernel dims (Pp, E, A, D, Emb, F4, Vp,
    isz) — G is then also capped so the estimated scoped VMEM fits the
    chip (f32 encoder state and COCO-scale vocabs need smaller tiles)."""
    for G in range(min(img_tile, B), 0, -1):
        if B % G == 0 and (G * K) % 8 == 0:
            if dims is not None and \
                    _estimate_vmem(G, K, **dims) > _VMEM_BUDGET:
                continue
            return G
    return None


def dims_for_cfg(cfg, itemsize: int, quant: bool = False):
    """Kernel-dimension dict for :func:`pick_step_tile`'s VMEM estimate.
    quant: int8 encoder state (32-multiple pixel pad, 1-byte windows)."""
    return dict(Pp=_round_up(cfg.num_pixels, 32 if quant else 16),
                E=cfg.encoder_dim,
                A=cfg.attention_dim, D=cfg.decoder_dim, Emb=cfg.embed_dim,
                F4=4 * cfg.factored_dim,
                Vp=_round_up(cfg.vocab_size, 128), isz=itemsize,
                isz_enc=1 if quant else None)


def _make_kernel(*, G, K, Pp, P, E, A, D, Emb, F, H, Vp, m, dt,
                 quant=False):
    R = G * K
    n_enc = 4 if quant else 2

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def sig(x):  # f32 transcendentals: Mosaic bf16 logistic bug workaround
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    def tnh(x):
        return jnp.tanh(x.astype(jnp.float32)).astype(dt)

    def kernel(*refs):
        # quant mode replaces (enc, ea) with (enc_q, enc_s, ea_q, ea_s):
        # int8 state + per-pixel f32 scales — half the per-step HBM bytes
        # (the dominant term).  Dequant math matches attend_quant_ref.
        enc_refs = refs[:n_enc]
        (emb_ref, h_ref, c_ref, semx_ref, semh_ref,
         wda_ref, bda_ref, wf_ref, wfb_ref, bfb_ref,
         wxe_ref, wxa_ref, wh_ref, wxp_ref, whp_ref, bx_ref, bh_ref,
         fcw_ref, fcb_ref,
         h_out, c_out, topv_ref, topi_ref, lse_ref,
         bd_scr, dec_scr, awe_scr) = refs[n_enc:]
        h = h_ref[:]
        c = c_ref[:]
        wf = wf_ref[:].astype(dt)

        # ---- attention (attend_fused_v3 schedule) ----
        dec_scr[:] = (dot(h, wda_ref[:]).astype(dt)
                      + bda_ref[:].astype(dt))              # (R, A)
        for base in range(0, G, m):
            bd_scr[:] = jnp.zeros_like(bd_scr)
            for j in range(m):
                g = base + j
                if quant:
                    _, encs_ref, ea_q_ref, eas_ref = enc_refs
                    ea = ea_q_ref[g].astype(dt) * eas_ref[g].astype(dt)
                else:
                    ea = enc_refs[1][g]                     # (Pp, A)
                dk = dec_scr[g * K:(g + 1) * K, :]
                cols = []
                for k in range(K):
                    e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                    cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
                att = jnp.concatenate(cols, axis=1).astype(jnp.float32)
                if P < Pp:
                    rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                    att = jnp.where(rows < P, att, float("-inf"))
                mx = jnp.max(att, axis=0, keepdims=True)
                ex = jnp.exp(att - mx)
                s = jnp.sum(ex, axis=0, keepdims=True)
                alpha = ex / s                              # (Pp, K) f32
                if quant:
                    # fold the enc dequant scale into alpha (one (Pp, K)
                    # multiply instead of a (Pp, E) dequant pass)
                    alpha = alpha * encs_ref[g]             # (Pp, 1) f32
                bd_scr[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                    alpha.astype(bd_scr.dtype)
            if quant:
                enc_grp = enc_refs[0][base:base + m] \
                    .reshape(m * Pp, E).astype(dt)
            else:
                enc_grp = enc_refs[0][base:base + m].reshape(m * Pp, E)
            awe_scr[base * K:(base + m) * K, :] = jax.lax.dot_general(
                bd_scr[:], enc_grp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
        gate = sig(dot(h, wfb_ref[:]).astype(dt) + bfb_ref[:].astype(dt))
        awe = gate * awe_scr[:]                             # (R, E)

        # ---- SCN recurrence (models/scn_cell.scn_step) ----
        xfac = (dot(emb_ref[:], wxe_ref[:]).astype(dt)
                + dot(awe, wxa_ref[:]).astype(dt)) * semx_ref[:]
        hfac = dot(h, wh_ref[:]).astype(dt) * semh_ref[:]
        pre = []
        for g4 in range(4):
            sl = slice(g4 * F, (g4 + 1) * F)
            slh = slice(g4 * H, (g4 + 1) * H)
            xg = dot(xfac[:, sl], wxp_ref[sl, :]) \
                + bx_ref[:, slh].astype(jnp.float32)
            hg = dot(hfac[:, sl], whp_ref[sl, :]) \
                + bh_ref[:, slh].astype(jnp.float32)
            pre.append((xg + hg).astype(dt))                # (R, H)
        i_g = sig(pre[0])
        f_g = sig(pre[1])
        o_g = sig(pre[2])
        c_t = tnh(pre[3])
        c_new = f_g * c + i_g * c_t
        h_new = o_g * tnh(c_new)
        h_out[:] = h_new
        c_out[:] = c_new

        # ---- vocab head: logits, f32 log-sum, per-lane top-K ----
        # Emitted values replicate log_softmax's float ops exactly: work
        # on the max-SHIFTED logits (x - m) and return log(sum(exp(·)))
        # WITHOUT folding the max back in, so the consumer's
        # ``topv - lse`` is bitwise  (x - m) - log s  — the same
        # association as jax.nn.log_softmax in the step engine.  (Raw
        # logits + (log s + m) differs by 1 ulp and flips near-ties.)
        logits = (dot(h_new, fcw_ref[:]).astype(dt)
                  + fcb_ref[:].astype(dt))                  # (R, Vp)
        lg = logits.astype(jnp.float32)
        mrow = jnp.max(lg, axis=1, keepdims=True)
        shifted = lg - mrow
        lse_ref[:] = jnp.log(jnp.sum(jnp.exp(shifted), axis=1,
                                     keepdims=True))
        cols_v = jax.lax.broadcasted_iota(jnp.int32, (R, Vp), 1)
        work = shifted
        for q in range(K):
            v = jnp.max(work, axis=1, keepdims=True)
            a = jnp.argmax(work, axis=1)[:, None]           # first occurrence
            topv_ref[:, q:q + 1] = v
            topi_ref[:, q:q + 1] = a
            work = jnp.where(cols_v == a, NEG, work)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_pixels", "img_tile", "group",
                              "interpret"))
def fused_decode_step(weights, enc_p, enc_att_p, emb_rows, h, c, semx, semh,
                      *, num_pixels: int, img_tile: int = 32,
                      group: int = 8, interpret=None):
    """One fused decode step over (B, K) beams chunked into image tiles.

    weights: dict from :func:`pack_step_weights`.
    enc_p/enc_att_p: (B, Pp, E|A) pre-padded loop invariants.
    emb_rows: (B*K, Emb) embedded previous words; h/c/semx/semh: (B*K, d).
    Returns (topv (B*K, K) f32 max-shifted logit values x - max_row,
    topi (B*K, K) i32, lse (B*K, 1) f32 log(sum(exp(x - max_row))) —
    so topv - lse is log_softmax bit-for-bit — and h_new, c_new).
    """
    return _fused_call(weights, (enc_p, enc_att_p), emb_rows, h, c,
                       semx, semh, num_pixels=num_pixels,
                       img_tile=img_tile, group=group, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("num_pixels", "img_tile", "group",
                              "interpret"))
def fused_decode_step_q(weights, enc_q, enc_s, ea_q, ea_s, emb_rows, h, c,
                        semx, semh, *, num_pixels: int, img_tile: int = 32,
                        group: int = 8, interpret=None):
    """int8 serving-mode variant of :func:`fused_decode_step`.

    enc_q/ea_q: (B, Pp, E|A) int8, enc_s/ea_s: (B, Pp, 1) f32 — from
    attention_pallas.quantize_pixels.  Half the per-step HBM bytes of the
    DMA-dominant encoder-state read; dequant math matches
    attend_quant_ref (enc scale folded into alpha).  Lossy vs the
    unquantized path (ModelConfig.enc_quant docs)."""
    return _fused_call(weights, (enc_q, enc_s, ea_q, ea_s), emb_rows, h, c,
                       semx, semh, num_pixels=num_pixels,
                       img_tile=img_tile, group=group, interpret=interpret)


def _fused_call(weights, enc_inputs, emb_rows, h, c, semx, semh, *,
                num_pixels, img_tile, group, interpret):
    quant = len(enc_inputs) == 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Pp, E = enc_inputs[0].shape
    A = enc_inputs[2 if quant else 1].shape[-1]
    R_total, D = h.shape
    K = R_total // B
    Emb = emb_rows.shape[-1]
    F4 = semx.shape[-1]
    F = F4 // 4
    H = D
    Vp = weights["fcw"].shape[-1]
    dt = h.dtype
    P = num_pixels

    G = pick_step_tile(B, K, img_tile, dims=dict(
        Pp=Pp, E=E, A=A, D=D, Emb=Emb, F4=F4, Vp=Vp,
        isz=jnp.dtype(dt).itemsize, group=group,
        isz_enc=1 if quant else None))
    if G is None:
        raise ValueError(f"no VMEM-feasible tile G divides B={B} "
                         f"with G*{K}%8==0")
    m = min(group, G)
    while G % m:
        m -= 1
    R = G * K

    kernel = _make_kernel(G=G, K=K, Pp=Pp, P=P, E=E, A=A, D=D, Emb=Emb,
                          F=F, H=H, Vp=Vp, m=m, dt=dt, quant=quant)

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    chunk3 = lambda d1, d2: pl.BlockSpec(
        (G, d1, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    rows2 = lambda d: pl.BlockSpec(
        (R, d), lambda b: (b, 0), memory_space=pltpu.VMEM)

    if quant:
        enc_specs = [chunk3(Pp, E), chunk3(Pp, 1),
                     chunk3(Pp, A), chunk3(Pp, 1)]
    else:
        enc_specs = [chunk3(Pp, E), chunk3(Pp, A)]

    w = weights
    h_new, c_new, topv, topi, lse = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=enc_specs + [
            rows2(Emb), rows2(D), rows2(D), rows2(F4), rows2(F4),
            const(D, A), const(1, A), const(1, A),
            const(D, E), const(1, E),
            const(Emb, F4), const(E, F4), const(D, F4),
            const(F4, H), const(F4, H),
            const(1, 4 * H), const(1, 4 * H),
            const(D, Vp), const(1, Vp),
        ],
        out_specs=(
            rows2(D), rows2(D), rows2(K), rows2(K), rows2(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R_total, D), dt),
            jax.ShapeDtypeStruct((R_total, D), dt),
            jax.ShapeDtypeStruct((R_total, K), jnp.float32),
            jax.ShapeDtypeStruct((R_total, K), jnp.int32),
            jax.ShapeDtypeStruct((R_total, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m * Pp, m * K), dt),
            pltpu.VMEM((R, A), dt), pltpu.VMEM((R, E), dt),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*enc_inputs, emb_rows, h, c, semx, semh,
      w["wda"], w["bda"], w["wf"], w["wfb"], w["bfb"],
      w["wxe"], w["wxa"], w["wh"], w["wxp"], w["whp"], w["bx"], w["bh"],
      w["fcw"], w["fcb"])
    return topv, topi, lse, h_new, c_new


def pack_step_weights(params, cfg, dt):
    """Flatten the attention_scn parameter tree into the kernel's layout
    (padded fc to a 128-multiple vocab; see beam_decode_records for the
    same packing in the full-decode kernel)."""
    cell = params["decode_step"]
    att = params["attention"]
    A, E = cfg.attention_dim, cfg.encoder_dim
    Emb, F, H = cfg.embed_dim, cfg.factored_dim, cfg.decoder_dim
    V = cfg.vocab_size
    Vp = _round_up(V, 128)
    return {
        "wda": att["decoder_att"]["w"].astype(dt),
        "bda": att["decoder_att"]["b"].reshape(1, A).astype(dt),
        "wf": att["full_att"]["w"].astype(jnp.float32).reshape(1, A),
        "wfb": params["f_beta"]["w"].astype(dt),
        "bfb": params["f_beta"]["b"].reshape(1, E).astype(dt),
        "wxe": cell["w_x"][:Emb].astype(dt),
        "wxa": cell["w_x"][Emb:].astype(dt),
        "wh": cell["w_h"].astype(dt),
        "wxp": cell["w_xp"].reshape(4 * F, H).astype(dt),
        "whp": cell["w_hp"].reshape(4 * F, H).astype(dt),
        "bx": cell["b_x"].reshape(1, 4 * H).astype(dt),
        "bh": cell["b_h"].reshape(1, 4 * H).astype(dt),
        "fcw": jnp.pad(params["fc"]["w"].astype(dt),
                       ((0, 0), (0, Vp - V))),
        "fcb": jnp.pad(params["fc"]["b"].astype(jnp.float32), (0, Vp - V),
                       constant_values=NEG).reshape(1, Vp).astype(dt),
    }
