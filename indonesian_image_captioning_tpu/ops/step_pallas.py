"""Fused decode-STEP Pallas kernel: attention + cell + vocab head, one call.

Why this shape: the decode step is a serial chain (attend -> f_beta gate ->
recurrence cell -> fc head -> top-k), and on this chip the attention part
is ~89% HBM DMA of the loop-invariant enc/enc_att (~3.0 ms/step at B=1024
bf16) while everything else is MXU/VPU work (~1.5-2 ms).  Run as separate
XLA ops they SERIALIZE: a TPU core executes one op at a time, so the step
pays DMA + compute.  Inside one Pallas kernel gridded over image chunks,
the pipeline prefetches chunk i+1's encoder blocks WHILE chunk i computes
the cell/head — the step approaches max(DMA, compute) instead of the sum.

Unlike the full-decode megakernel (ops/decode_pallas.py, which keeps enc
resident across all 51 steps but pays unusable per-chunk utilisation at
G*K = 80 rows), this kernel holds NOTHING across steps: G=32 images per
chunk (R = 160 rows per matmul), weights fetched once per call via
constant blocks, and the beam engine keeps ALL bookkeeping — the kernel
slots into the existing sparse-head ``step_fn`` protocol by returning
per-lane top-K candidates + log-sum alongside the new (h, c).

ONE named-ref kernel body serves all three reference decoder families
(loader.py:5-6 model registry):
  * attention_scn — attention + SCN cell (reference attention_scn.py:
    217-260, scn_cell.py:52-154)
  * pure_attention — attention + torch-order LSTM cell
    (pure_attention.py:228-266); the cell runs as one concat matmul with
    lstm_step's add association, so f32 decode is bit-exact with it
  * pure_scn — no attention stage (pure_scn.py:196-233): rows are
    chunked directly and the fusion win is cell + head + in-VMEM top-K
plus an int8 serving mode (enc_quant="int8") that reads quantized
encoder state with per-pixel scales folded into alpha.

Per-step computation (attention models):  dec = h @ Wda + b;  per image:
att[p,k] = wf . relu(ea[p] + dec[k]), alpha = softmax_p, awe = alpha^T
enc (block-diagonal grouped matmul);  gate = sigmoid(h @ Wfb + b);  cell
recurrence on [emb; gate*awe];  logits = h' @ Wfc + b;  per-lane top-K
of max-shifted logits by K argmax+mask rounds (lax.top_k
first-occurrence order) + f32 log-sum, so the consumer's ``topv - lse``
replicates log_softmax bit-for-bit.

Exactness: bit-for-beam with the step-loop engine at f32 under the same
attention backend (tests/test_step_fused.py); at bf16 the steps path
rounds log-softmax to bf16 and the TPU steps engine uses the pallas_mxu
attention's own FP ordering — near-ties can resolve differently between
the two exact paths (ModelConfig.decode_impl docs).  Embedding lookup
stays OUTSIDE (XLA gather is cheap); the kernel takes embedded rows.
Measured wins vs the steps engine are tabulated in BASELINE.md.

Window pipelining (``pipeline=``): "auto" lets Mosaic's block pipeline
stream the per-chunk enc/enc_att windows; "manual" keeps those two
inputs in HBM (``memory_space=ANY``) and the kernel double-buffers them
itself with ``pltpu.make_async_copy`` — chunk i+1's copies are issued
before chunk i's compute, one contiguous DMA per window per chunk.  The
compute body is shared, so both modes are bit-identical
(tests/test_step_fused.py::test_fused_step_manual_pipeline_bit_exact);
VMEM cost is the same (explicit 2-slot scratch replaces Mosaic's
double-buffered windows, so ``_estimate_vmem``'s ``win`` term stands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _compiler_params, _round_up

NEG = -1e30


# VMEM budget for the G picker: just under the 114 MB scoped limit the
# kernels request (attention_pallas._VMEM_LIMIT; v5e has 128 MB total).
# The estimate below reproduces the compiler's own scoped-VMEM report to
# ~1% (the e2e f32 G=32 OOM: estimated 205 MB vs reported 202.5 MB).
_VMEM_BUDGET = 112 * 1024 * 1024


def _estimate_vmem(G, K, *, Pp, E, A, D, Emb, F4, Vp, isz, group=8,
                   isz_enc=None, attention=True):
    """Estimated scoped-VMEM bytes for a (G, group) schedule at item size
    isz: double-buffered input windows (enc/enc_att chunks + row blocks),
    single-buffered constant weight blocks, outputs, scratch, and the f32
    logits / top-k work arrays the head materialises (incl. spill).
    isz_enc: item size of the enc/enc_att windows when they differ from
    isz (1 for the int8 serving mode, which adds two f32 scale columns).
    attention=False (pure_scn): no encoder windows, no attention scratch."""
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
    if not attention:
        win = scratch = 0
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


def dims_for_cfg(cfg, itemsize: int, quant: bool = False,
                 num_pixels=None):
    """Kernel-dimension dict for :func:`pick_step_tile`'s VMEM estimate.
    quant: int8 encoder state (32-multiple pixel pad, 1-byte windows).
    num_pixels: the ACTUAL pixel count of the encoding being decoded —
    pass it when available so the gate's estimate matches the kernel's
    own (callers may feed encodings larger than cfg.num_pixels)."""
    scn = cfg.model_type in ("pure_scn", "attention_scn")
    P = cfg.num_pixels if num_pixels is None else num_pixels
    return dict(Pp=_round_up(P, 32 if quant else 16),
                E=cfg.encoder_dim,
                A=cfg.attention_dim, D=cfg.decoder_dim, Emb=cfg.embed_dim,
                F4=4 * (cfg.factored_dim if scn else cfg.decoder_dim),
                Vp=_round_up(cfg.vocab_size, 128), isz=itemsize,
                isz_enc=1 if quant else None,
                attention=cfg.uses_attention)


def _make_kernel(*, names, G, K, topk, Pp, P, E, A, D, Emb, F, H, Vp, m, R,
                 dt, V=None, quant=False, cell="scn", attention=True,
                 ablate=None, manual=False):
    """Build the fused-step kernel body.

    names: ordered ref names (inputs + outputs + scratch) matching the
    pallas_call layout from :func:`_fused_call` — the body looks refs up
    by name so the three decoder families (attention_scn / pure_attention
    / pure_scn) share one implementation.
    cell: "scn" (factored semantic gates, order i,f,o,c — scn_cell.py) or
    "lstm" (torch nn.LSTMCell, order i,f,g,o — lstm_cell.py).
    attention: False drops the whole attention stage (pure_scn: the step
    reads no encoder state; R rows are chunked directly and K is unused).
    topk: head candidates per row (the beam size).
    ablate: INTERNAL, profiling only (tools/exp_step_parts.py) — None for
    production.  Strips one stage while keeping the DMA schedule intact so
    stage costs can be located under the pipeline's DMA/compute overlap:
    "dma" (no compute at all), "attend_const" (constant attention scores —
    skips the relu score passes, keeps softmax + weighted sum),
    "no_cell" (identity recurrence), "no_head" (skip logits + top-K)."""

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def sig(x):  # f32 transcendentals: Mosaic bf16 logistic bug workaround
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    def tnh(x):
        return jnp.tanh(x.astype(jnp.float32)).astype(dt)

    def kernel(*refs):
        r = dict(zip(names, refs))
        h = r["h"][:]
        c = r["c"][:]
        emb_ref = r["emb"]

        if manual:
            # Explicit double-buffered DMA of the big encoder-state
            # windows: enc/ea live in HBM (memory_space=ANY); chunk i+1's
            # copies are issued BEFORE chunk i's compute so the DMA
            # engines stream the next windows while the MXU/VPU work.
            i = pl.program_id(0)
            n = pl.num_programs(0)
            enc_buf, ea_buf, sem = r["enc_buf"], r["ea_buf"], r["sem"]

            def dmas(slot, chunk):
                return (
                    pltpu.make_async_copy(
                        r["enc"].at[pl.ds(chunk * G, G)],
                        enc_buf.at[slot], sem.at[slot, 0]),
                    pltpu.make_async_copy(
                        r["ea"].at[pl.ds(chunk * G, G)],
                        ea_buf.at[slot], sem.at[slot, 1]),
                )

            @pl.when(i == 0)
            def _():
                for d in dmas(0, 0):
                    d.start()

            @pl.when(i + 1 < n)
            def _():
                for d in dmas((i + 1) % 2, i + 1):
                    d.start()

            slot = i % 2
            for d in dmas(slot, i):
                d.wait()

            def enc_at(idx):
                return enc_buf[slot, idx]

            def ea_at(g):
                return ea_buf[slot, g]
        else:
            def enc_at(idx):
                return r["enc"][idx]

            def ea_at(g):
                return (r["ea_q"][g].astype(dt) * r["ea_s"][g].astype(dt)
                        if quant else r["ea"][g])

        if ablate == "dma":
            # Thin touches keep every input window live; no real compute.
            hx = h + emb_ref[:, 0:1]
            if attention:
                ea_ref = r["ea_q"] if quant else r["ea"]
                hx = hx + (r["enc"][0, 0:8, 0:1]
                           + ea_ref[0, 0:8, 0:1]).astype(dt) \
                    .sum(axis=0, keepdims=True)
            r["h_out"][:] = hx
            r["c_out"][:] = c
            r["topv"][:] = jnp.zeros_like(r["topv"])
            r["topi"][:] = jnp.zeros_like(r["topi"])
            r["lse"][:] = jnp.zeros_like(r["lse"])
            return

        if attention:
            # ---- attention (attend_fused_v3 schedule) ----
            # quant mode replaces (enc, ea) with (enc_q, enc_s, ea_q,
            # ea_s): int8 state + per-pixel f32 scales — half the
            # per-step HBM bytes.  Dequant math matches attend_quant_ref.
            wf = r["wf"][:].astype(dt)
            bd_scr, dec_scr, awe_scr = r["bd"], r["dec"], r["awe"]
            dec_scr[:] = (dot(h, r["wda"][:]).astype(dt)
                          + r["bda"][:].astype(dt))         # (R, A)
            for base in range(0, G, m):
                bd_scr[:] = jnp.zeros_like(bd_scr)
                for j in range(m):
                    g = base + j
                    ea = ea_at(g)                           # (Pp, A)
                    dk = dec_scr[g * K:(g + 1) * K, :]
                    if ablate == "attend_const":
                        att = jnp.broadcast_to(
                            jnp.sum(dk, axis=1)[None, :],
                            (Pp, K)).astype(jnp.float32)
                    else:
                        cols = []
                        for k in range(K):
                            e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                            cols.append(jnp.sum(e * wf, axis=1,
                                                keepdims=True))
                        att = jnp.concatenate(cols, axis=1) \
                            .astype(jnp.float32)
                    if P < Pp:
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (Pp, K), 0)
                        att = jnp.where(rows < P, att, float("-inf"))
                    mx = jnp.max(att, axis=0, keepdims=True)
                    ex = jnp.exp(att - mx)
                    s = jnp.sum(ex, axis=0, keepdims=True)
                    alpha = ex / s                          # (Pp, K) f32
                    if quant:
                        # fold the enc dequant scale into alpha (one
                        # (Pp, K) multiply, not a (Pp, E) dequant pass)
                        alpha = alpha * r["enc_s"][g]       # (Pp, 1) f32
                    bd_scr[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                        alpha.astype(bd_scr.dtype)
                enc_grp = enc_at(pl.ds(base, m)).reshape(m * Pp, E)
                if quant:
                    enc_grp = enc_grp.astype(dt)
                awe_scr[base * K:(base + m) * K, :] = jax.lax.dot_general(
                    bd_scr[:], enc_grp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)
            gate = sig(dot(h, r["wfb"][:]).astype(dt)
                       + r["bfb"][:].astype(dt))
            awe = gate * awe_scr[:]                         # (R, E)

        if ablate == "no_cell":
            h_new = h + awe[:, :1] if attention else h
            c_new = c
        elif cell == "scn":
            # ---- SCN recurrence (models/scn_cell.scn_step) ----
            xin = dot(emb_ref[:], r["wxe"][:]).astype(dt)
            if attention:
                xin = xin + dot(awe, r["wxa"][:]).astype(dt)
            xfac = xin * r["semx"][:]
            hfac = dot(h, r["wh"][:]).astype(dt) * r["semh"][:]
            pre = []
            for g4 in range(4):
                sl = slice(g4 * F, (g4 + 1) * F)
                slh = slice(g4 * H, (g4 + 1) * H)
                xg = dot(xfac[:, sl], r["wxp"][sl, :]) \
                    + r["bx"][:, slh].astype(jnp.float32)
                hg = dot(hfac[:, sl], r["whp"][sl, :]) \
                    + r["bh"][:, slh].astype(jnp.float32)
                pre.append((xg + hg).astype(dt))            # (R, H)
            i_g = sig(pre[0])
            f_g = sig(pre[1])
            o_g = sig(pre[2])
            c_t = tnh(pre[3])
        else:
            # ---- LSTM recurrence (models/lstm_cell.lstm_step, torch
            # gate order i, f, g, o).  One concat matmul + the same add
            # association as lstm_step so f32 is bit-exact with it. ----
            xcat = jnp.concatenate([emb_ref[:], awe], axis=1)
            pre_f = (dot(xcat, r["wih"][:])
                     + r["bx"][:].astype(jnp.float32)
                     + dot(h, r["wh"][:])
                     + r["bh"][:].astype(jnp.float32))      # (R, 4H) f32
            pre = [pre_f[:, g4 * H:(g4 + 1) * H].astype(dt)
                   for g4 in range(4)]
            i_g = sig(pre[0])
            f_g = sig(pre[1])
            c_t = tnh(pre[2])
            o_g = sig(pre[3])
        if ablate != "no_cell":
            c_new = f_g * c + i_g * c_t
            h_new = o_g * tnh(c_new)
        r["h_out"][:] = h_new
        r["c_out"][:] = c_new

        if ablate == "no_head":
            r["topv"][:] = h_new[:, :topk].astype(jnp.float32)
            r["topi"][:] = jnp.zeros_like(r["topi"])
            r["lse"][:] = h_new[:, :1].astype(jnp.float32)
            return

        # ---- vocab head: logits, f32 log-sum, per-lane top-K ----
        # Emitted values replicate log_softmax's float ops exactly: work
        # on the max-SHIFTED logits (x - m) and return log(sum(exp(·)))
        # WITHOUT folding the max back in, so the consumer's
        # ``topv - lse`` is bitwise  (x - m) - log s  — the same
        # association as jax.nn.log_softmax in the step engine.  (Raw
        # logits + (log s + m) differs by 1 ulp and flips near-ties.)
        logits = (dot(h_new, r["fcw"][:]).astype(dt)
                  + r["fcb"][:].astype(dt))                 # (R, Vp)
        lg = logits.astype(jnp.float32)
        cols_v = jax.lax.broadcasted_iota(jnp.int32, (R, Vp), 1)
        if V is not None and V < Vp:
            # -inf (not the finite NEG pad of fcb) so padded ids can never
            # win a top-K round even if real logits underflow below -1e30,
            # and so a pathological all-tiny row can't make a padded
            # column the row max (which would corrupt lse via exp(0))
            lg = jnp.where(cols_v < V, lg, float("-inf"))
        mrow = jnp.max(lg, axis=1, keepdims=True)
        shifted = lg - mrow
        r["lse"][:] = jnp.log(jnp.sum(jnp.exp(shifted), axis=1,
                                      keepdims=True))
        work = shifted
        for q in range(topk):
            v = jnp.max(work, axis=1, keepdims=True)
            a = jnp.argmax(work, axis=1)[:, None]           # first occurrence
            r["topv"][:, q:q + 1] = v
            r["topi"][:, q:q + 1] = a
            work = jnp.where(cols_v == a, NEG, work)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_pixels", "img_tile", "group",
                              "interpret", "cell", "vocab_size", "ablate",
                              "pipeline"))
def fused_decode_step(weights, enc_p, enc_att_p, emb_rows, h, c, semx, semh,
                      *, num_pixels: int, img_tile: int = 32,
                      group: int = 8, interpret=None, cell: str = "scn",
                      vocab_size=None, ablate=None, pipeline="auto"):
    """One fused decode step over (B, K) beams chunked into image tiles.

    weights: dict from :func:`pack_step_weights`.
    enc_p/enc_att_p: (B, Pp, E|A) pre-padded loop invariants.
    emb_rows: (B*K, Emb) embedded previous words; h/c/semx/semh: (B*K, d).
    Returns (topv (B*K, K) f32 max-shifted logit values x - max_row,
    topi (B*K, K) i32, lse (B*K, 1) f32 log(sum(exp(x - max_row))) —
    so topv - lse is log_softmax bit-for-bit — and h_new, c_new).
    """
    return _fused_call(weights, (enc_p, enc_att_p), emb_rows, h, c,
                       semx, semh, num_pixels=num_pixels, cell=cell,
                       img_tile=img_tile, group=group, interpret=interpret,
                       vocab_size=vocab_size, ablate=ablate,
                       pipeline=pipeline)


@functools.partial(
    jax.jit, static_argnames=("num_pixels", "img_tile", "group",
                              "interpret", "cell", "vocab_size"))
def fused_decode_step_q(weights, enc_q, enc_s, ea_q, ea_s, emb_rows, h, c,
                        semx, semh, *, num_pixels: int, img_tile: int = 32,
                        group: int = 8, interpret=None, cell: str = "scn",
                        vocab_size=None):
    """int8 serving-mode variant of :func:`fused_decode_step`.

    enc_q/ea_q: (B, Pp, E|A) int8, enc_s/ea_s: (B, Pp, 1) f32 — from
    attention_pallas.quantize_pixels.  Half the per-step HBM bytes of the
    DMA-dominant encoder-state read; dequant math matches
    attend_quant_ref (enc scale folded into alpha).  Lossy vs the
    unquantized path (ModelConfig.enc_quant docs)."""
    return _fused_call(weights, (enc_q, enc_s, ea_q, ea_s), emb_rows, h, c,
                       semx, semh, num_pixels=num_pixels, cell=cell,
                       img_tile=img_tile, group=group, interpret=interpret,
                       vocab_size=vocab_size)


@functools.partial(
    jax.jit, static_argnames=("beam_k", "row_tile", "interpret",
                              "vocab_size"))
def fused_decode_step_noattn(weights, emb_rows, h, c, semx, semh, *,
                             beam_k: int, row_tile: int = 256,
                             interpret=None, vocab_size=None):
    """pure_scn variant: no attention stage, no encoder state at all —
    the fusion win is the cell+head chain and the in-VMEM top-K (no
    (B*K, V) logit round-trip to HBM).  beam_k: per-lane candidate
    count (the beam size); rows are chunked row_tile at a time."""
    return _fused_call(weights, (), emb_rows, h, c, semx, semh,
                       num_pixels=0, cell="scn", img_tile=row_tile,
                       group=1, interpret=interpret, beam_k=beam_k,
                       vocab_size=vocab_size)


def _fused_call(weights, enc_inputs, emb_rows, h, c, semx, semh, *,
                num_pixels, img_tile, group, interpret, cell="scn",
                beam_k=None, vocab_size=None, ablate=None, pipeline="auto"):
    attention = len(enc_inputs) > 0
    quant = len(enc_inputs) == 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    manual = (pipeline == "manual" and attention and not quant
              and ablate is None)
    R_total, D = h.shape
    Emb = emb_rows.shape[-1]
    F4 = semx.shape[-1] if semx is not None else 4 * D
    F = F4 // 4
    H = D
    Vp = weights["fcw"].shape[-1]
    dt = h.dtype
    P = num_pixels

    if attention:
        B, Pp, E = enc_inputs[0].shape
        A = enc_inputs[2 if quant else 1].shape[-1]
        K = R_total // B                    # beam lanes per image
        topk = K
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
        grid = B // G
    else:
        # no image axis: chunk the (B*K) rows directly; the head still
        # emits beam_k candidates per row
        Pp = E = A = K = 0
        topk = beam_k
        G = pick_step_tile(R_total, 1, img_tile, dims=dict(
            Pp=0, E=0, A=0, D=D, Emb=Emb, F4=F4, Vp=Vp,
            isz=jnp.dtype(dt).itemsize, attention=False))
        if G is None:
            raise ValueError(f"no VMEM-feasible row tile for rows="
                             f"{R_total}")
        m = 1
        R = G
        grid = R_total // G

    const = lambda *shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    chunk3 = lambda d1, d2: pl.BlockSpec(
        (G, d1, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    rows2 = lambda d: pl.BlockSpec(
        (R, d), lambda b: (b, 0), memory_space=pltpu.VMEM)

    in_names, in_specs, inputs = [], [], []

    def add(name, arr, spec):
        in_names.append(name)
        in_specs.append(spec)
        inputs.append(arr)

    if quant:
        for nm, arr, d1 in (("enc", enc_inputs[0], E),
                            ("enc_s", enc_inputs[1], 1),
                            ("ea_q", enc_inputs[2], A),
                            ("ea_s", enc_inputs[3], 1)):
            add(nm, arr, chunk3(Pp, d1))
    elif attention and manual:
        # HBM-resident; the kernel double-buffers chunks itself
        add("enc", enc_inputs[0], pl.BlockSpec(memory_space=pl.ANY))
        add("ea", enc_inputs[1], pl.BlockSpec(memory_space=pl.ANY))
    elif attention:
        add("enc", enc_inputs[0], chunk3(Pp, E))
        add("ea", enc_inputs[1], chunk3(Pp, A))
    add("emb", emb_rows, rows2(Emb))
    add("h", h, rows2(D))
    add("c", c, rows2(D))
    if cell == "scn":
        add("semx", semx, rows2(F4))
        add("semh", semh, rows2(F4))
    for nm in _weight_names(cell=cell, attention=attention):
        arr = weights[nm]
        add(nm, arr, const(*arr.shape))

    out_names = ["h_out", "c_out", "topv", "topi", "lse"]
    scratch_names = ["bd", "dec", "awe"] if attention else []
    scratch_shapes = ([pltpu.VMEM((m * Pp, m * K), dt),
                       pltpu.VMEM((R, A), dt), pltpu.VMEM((R, E), dt)]
                      if attention else [])
    if manual:
        scratch_names += ["enc_buf", "ea_buf", "sem"]
        scratch_shapes += [pltpu.VMEM((2, G, Pp, E), dt),
                           pltpu.VMEM((2, G, Pp, A), dt),
                           pltpu.SemaphoreType.DMA((2, 2))]
    kernel = _make_kernel(
        names=tuple(in_names + out_names + scratch_names),
        G=G, K=K, topk=topk, Pp=Pp, P=P, E=E, A=A, D=D, Emb=Emb,
        F=F, H=H, Vp=Vp, m=m, R=R, dt=dt, V=vocab_size, quant=quant,
        cell=cell, attention=attention, ablate=ablate, manual=manual)

    h_new, c_new, topv, topi, lse = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(
            rows2(D), rows2(D), rows2(topk), rows2(topk), rows2(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R_total, D), dt),
            jax.ShapeDtypeStruct((R_total, D), dt),
            jax.ShapeDtypeStruct((R_total, topk), jnp.float32),
            jax.ShapeDtypeStruct((R_total, topk), jnp.int32),
            jax.ShapeDtypeStruct((R_total, 1), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*inputs)
    return topv, topi, lse, h_new, c_new


def _weight_names(*, cell: str, attention: bool):
    names = []
    if attention:
        names += ["wda", "bda", "wf", "wfb", "bfb"]
    if cell == "scn":
        names += ["wxe"]
        if attention:
            names += ["wxa"]
        names += ["wh", "wxp", "whp"]
    else:
        names += ["wih", "wh"]
    names += ["bx", "bh", "fcw", "fcb"]
    return names


def embedding_limbs(emb_tab, dt):
    """Stack an embedding table into exact bf16 limbs (L, Vp, Emb) for the
    in-kernel one-hot lookup of the span/full-decode kernels.

    The TPU's default f32 matmul precision is one bf16 pass, which would
    bf16-round the looked-up embedding rows at f32 eval precision.  A f32
    value splits exactly into 3 bf16 limbs (8+8+8 of the 24 mantissa
    bits), each residual exactly representable, and the f32 re-sum is
    exact because the limbs occupy disjoint bit ranges — so three
    default-precision bf16 dots + two f32 adds reproduce an exact f32
    gather at half the cost (and a third of the VMEM) of a
    Precision.HIGHEST dot against the f32 table.  At bf16 serving
    precision the table is already bf16 and one limb is exact."""
    if jnp.dtype(dt) == jnp.float32:
        t0 = emb_tab.astype(jnp.bfloat16)
        r1 = emb_tab - t0.astype(jnp.float32)
        t1 = r1.astype(jnp.bfloat16)
        t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.stack([t0, t1, t2])
    return emb_tab.astype(jnp.bfloat16)[None]


def pack_step_weights(params, cfg, dt):
    """Flatten a decoder parameter tree into the kernel's layout
    (padded fc to a 128-multiple vocab; see beam_decode_records for the
    same packing in the full-decode kernel).  Branches per model family:
    attention_scn (attention + SCN), pure_attention (attention + torch
    LSTM), pure_scn (SCN only)."""
    cell = params["decode_step"]
    A, E = cfg.attention_dim, cfg.encoder_dim
    Emb, F, H = cfg.embed_dim, cfg.factored_dim, cfg.decoder_dim
    V = cfg.vocab_size
    Vp = _round_up(V, 128)
    w = {
        "fcw": jnp.pad(params["fc"]["w"].astype(dt),
                       ((0, 0), (0, Vp - V))),
        "fcb": jnp.pad(params["fc"]["b"].astype(jnp.float32), (0, Vp - V),
                       constant_values=NEG).reshape(1, Vp).astype(dt),
    }
    if cfg.uses_attention:
        att = params["attention"]
        w.update({
            "wda": att["decoder_att"]["w"].astype(dt),
            "bda": att["decoder_att"]["b"].reshape(1, A).astype(dt),
            "wf": att["full_att"]["w"].astype(jnp.float32).reshape(1, A),
            "wfb": params["f_beta"]["w"].astype(dt),
            "bfb": params["f_beta"]["b"].reshape(1, E).astype(dt),
        })
    if cfg.model_type in ("pure_scn", "attention_scn"):
        w.update({
            "wxe": cell["w_x"][:Emb].astype(dt),
            "wh": cell["w_h"].astype(dt),
            "wxp": cell["w_xp"].reshape(4 * F, H).astype(dt),
            "whp": cell["w_hp"].reshape(4 * F, H).astype(dt),
            "bx": cell["b_x"].reshape(1, 4 * H).astype(dt),
            "bh": cell["b_h"].reshape(1, 4 * H).astype(dt),
        })
        if cfg.uses_attention:
            w["wxa"] = cell["w_x"][Emb:].astype(dt)
    else:                                   # pure_attention: torch LSTM
        w.update({
            "wih": cell["w_ih"].astype(dt),
            "wh": cell["w_hh"].astype(dt),
            "bx": cell["b_ih"].reshape(1, 4 * H).astype(dt),
            "bh": cell["b_hh"].reshape(1, 4 * H).astype(dt),
        })
    return w
