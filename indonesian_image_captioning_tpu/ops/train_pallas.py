"""Fused teacher-forcing SCAN kernels: the training-time analogue of the
span decode kernel (ops/span_pallas.py).

Why: the caption train step at batch 1024 spends ~80 ms in the forward
scan and ~130 ms in its backward — and a device trace shows both are
DMA-bound on the per-step re-read of the loop-invariant encoder state
(enc (B, P, E) + enc_att (B, P, A) ~= 1 GB at bench dims), exactly the
ceiling the decode kernels broke for inference.  XLA cannot hoist the
read out of ``lax.scan``: attention contracts fresh alphas against enc
every step.

Schedule: ONE pallas_call with grid (image chunks, time spans), spans
INNERMOST.  The enc/enc_att windows' block index depends only on the
chunk, so Mosaic keeps them VMEM-resident across every span of a chunk —
the whole scan reads the encoder state ONCE per chunk (the megakernel's
residency win) while the (h_all, c_all, alphas, emb_fac) slices stream
per span (the span kernel's pipelining win), and chunk i+1's windows
prefetch during chunk i's compute.  The (h, c) carry lives in VMEM
scratch, re-initialised per chunk; T is padded to a span multiple and
the padded steps' outputs are sliced off (their gradients are exact
zeros).

The pair is wired as one ``jax.custom_vjp``:

* forward kernel -> (h_all, c_all, alphas); residuals are exactly those
  three tensors (everything else is recomputed in-kernel from them —
  the ``jax.checkpoint(checkpoint_dots)`` policy of the XLA path, taken
  to its limit).
* backward kernel walks the spans in REVERSE over the same
  chunk-resident windows, recomputes each step's intermediates from
  (h_prev, c_prev, alpha), and emits: the (dh, dc) chain, per-step
  d_emb_fac, the d_enc_att accumulation (kept f32 across all T steps in
  the chunk-resident output block), and — instead of accumulating the
  big weight gradients in-kernel at G-row MXU utilisation — per-step
  ROW-FACTOR STREAMS (dpre/dhfr/dfb/ddec and the recomputed
  xfac/hfac/awe).  The weight gradients are then single (B·Tp)-row XLA
  matmuls outside the kernel, at full-batch MXU utilisation; dropping
  the ~35 MB of f32 accumulator blocks also lifts the backward image
  tile G 8 -> 16 at flagship dims.  Only the wf gradient stays
  in-kernel (it contracts against e, which never leaves VMEM).  d_enc
  is NOT produced (the frozen-encoder trainers stop_gradient enc;
  ``teacher_forcing(..., enc_grad=True)`` — the fine-tune path — keeps
  the XLA scan).

Reference semantics being trained (not ported): the length-sorted
shrinking-batch loop of /root/reference/models/decoders/attention_scn.py:95-158
with models/attention.py:6-44 and models/scn_cell.py:52-154 inside —
here a fixed-shape masked scan, bit-compatible with models/decoders.py
teacher_forcing up to float reassociation (see tests/test_train_fused.py
for the tolerance-based parity contract, forward AND gradients).

Both attention-bearing decoder families are covered via a ``cell``
branch compiled into the kernel pair: "scn" (attention_scn, factored
SCN recurrence) and "lstm" (pure_attention, torch nn.LSTMCell order
i,f,g,o per /root/reference/models/decoders/pure_attention.py:40,141-147
— pre = emb@w_ih[:Emb] + awe@w_ih[Emb:] + h@w_hh + b_ih + b_hh, the
concat split being exact).  The LSTM backward is simpler: pre's
cotangent IS the xin cotangent, so the dpre stream doubles as d_emb and
the xfac/hfac/dhfr streams disappear.  pure_scn is deliberately NOT
covered: its scan reads no encoder state and its head already runs
outside the scan, so there is no DMA floor to break (XLA is within
measurement noise of roofline there).

The full_att bias is omitted from the in-kernel score like the decode
kernels: softmax is shift-invariant, so alphas are identical and the
bias's gradient is exactly zero in the math (the kernel reports 0; XLA
reports the same up to roundoff).

Measured (b1024 bf16 flagship dims, v5e): forward 34.4 ms vs 90.4 XLA,
backward 74.6 ms vs ~130 XLA — 2.17x the forward where the FLOPs ratio
is ~2x (was 93.1 = 2.7x; 190 before the row-factor streams; 244 before
per-span stacking; the single biggest early step was giving d_alpha the
transposed window — the (M=Pp, N=1) layout burned ~63 ms in one MXU
column tile).  The 93 -> 74.6 restructure (2026-08-20): (1) pass-A
batched recomputes — every forward quantity that depends only on
streamed inputs (dec, f_beta gate, awe, xin, xfac/hfac, gate pre-acts)
is recomputed ONCE per span at M = G*S rows instead of per-step at
M = G, quadrupling MXU row utilisation for the recompute half of the
FLOPs; (2) the loop-invariant wf is factored out of the per-step
(G, Pp, A) d_e product — the accumulator keeps Σ d_att ⊙ relu-mask and
wf multiplies once per chunk, and the wf GRADIENT itself reduces to
ea ⊙ d_ea_raw once per chunk plus a (G, A) FMA per step (the per-step
(M=1, K=Pp) d_wf dots measured 6.7 ms of the old 92); (3) gate-pair
interleaved weights (wxhp): d_pre_g contracts against [wxp_g; whp_g] in
one (K=H, N=2F) dot instead of two.  Cached-epoch train step: 147.1 vs
257.7 ms XLA (+75%, 6,962 imgs/s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _VMEM_LIMIT, _round_up


def _params2d(limit=_VMEM_LIMIT):
    # both grid dims are sequential (spans carry state; chunks accumulate
    # into shared weight-grad blocks)
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=limit)


# The backward runs right at the edge of VMEM: its pass-A batched
# recomputes add ~4 MB of span-resident values on top of the windows,
# streams and the f32 d_ea accumulator, compiling to ~118 MB scoped at
# G=16 flagship dims.  v5e has 128 MB of VMEM; grant the backward the
# extra headroom instead of dropping to G=8 (which would halve the M
# dimension of every matmul in the kernel).
_VMEM_LIMIT_BWD = 123 * 1024 * 1024


def _limit(backward: bool) -> int:
    """Mosaic scoped-VMEM ceiling for the kernel compile (experiment
    override: IIC_TRAIN_{FWD,BWD}_LIMIT in MB; the chip has 128)."""
    import os
    env = os.environ.get("IIC_TRAIN_BWD_LIMIT" if backward
                         else "IIC_TRAIN_FWD_LIMIT")
    if env:
        return int(env) * 1024 * 1024
    return _VMEM_LIMIT_BWD if backward else _VMEM_LIMIT

# Separate budgets: the forward's big window tiles double-buffer and its
# e-tensor keeps extra live generations the estimate can't see (a G=32
# bf16 forward estimated ~101 MB compiled to 120.95 MB scoped), so its
# picker works against a tighter ceiling; the backward estimate tracked
# its compiles within a few MB.
_VMEM_BUDGET_FWD = 96 * 1024 * 1024
_VMEM_BUDGET_BWD = 112 * 1024 * 1024


def _weights_bytes(*, E, A, D, F4, H, isz, cell="scn"):
    # wda, bda, wf(f32), wfb, bfb, wxa, wh, [wxp, whp (scn)], bx, bh
    factored = 2 * F4 * H if cell == "scn" else 0
    return (D * A + A + D * E + E + E * F4 + D * F4
            + factored + 8 * H) * isz + A * 4


def _estimate_fwd_vmem(G, S, *, Pp, E, A, D, F4, isz, cell="scn"):
    H = D
    win = 2 * G * Pp * (E + A) * isz                   # chunk-resident + next
    # emb_fac in; h/c/alphas (+ awe_raw residual for the backward) out
    streams = 2 * G * S * (F4 + 2 * D + Pp + E) * isz
    rows = 2 * G * (2 * D + (2 * F4 if cell == "scn" else 0)) * isz
    scratch = 2 * G * D * isz
    e_tmp = 2 * G * Pp * A * isz + G * Pp * 4          # e generations + att
    return win + streams + rows + scratch + e_tmp + _weights_bytes(
        E=E, A=A, D=D, F4=F4, H=H, isz=isz, cell=cell)


def _estimate_bwd_vmem(G, S, *, Pp, E, A, D, F4, isz, cell="scn"):
    H = D
    # enc rides TRANSPOSED (G, E, Pp) so d_alpha is an (M=1, N=Pp) MXU
    # dot; the lane-minor Pp pads to a multiple of 128
    Pl = _round_up(Pp, 128)
    win = 2 * G * (E * Pl + Pp * A) * isz
    if cell == "scn":
        # in: h_prev/c_prev/c_all/alphas/emb_fac/d_hall/d_alphas/awe_raw
        # out: d_emb + row-factor streams dpre/dhfr/dfb/ddec/xfac/hfac/awe
        streams = 2 * G * S * (4 * D + 2 * Pp + 2 * F4 + E) * isz \
            + 2 * G * S * (4 * H + 2 * F4 + 2 * E + A) * isz
        rows = 2 * G * (2 * D + 2 * F4) * isz
        grads = G * (2 * D + 2 * F4) * 4 * 2           # dsem/dh0 blocks
    else:
        # out streams: dpre (doubles as d_emb) / dfb / ddec / awe
        streams = 2 * G * S * (4 * D + 2 * Pp + F4 + E) * isz \
            + 2 * G * S * (4 * H + 2 * E + A) * isz
        rows = 2 * G * 2 * D * isz
        grads = G * 2 * D * 4 * 2                      # dh0/dc0 blocks
    d_ea = 2 * G * Pp * A * 4                          # f32 chunk-resident
    scratch = 4 * G * D * 4
    e_tmp = 2 * G * Pp * A * (isz + 4) + 2 * G * Pp * 4
    # pass-A batched recomputes live across the whole span loop:
    # f32 gate/xfac/hfac_raw/hfac/pre×4/tc + dt dec/awe/xin
    if cell == "scn":
        # dt residents: dec A + awe E + xin/xfac/hfac 3·F4 (NOT 2E+2F4 —
        # that coincides only at E == F4, the flagship case; for F4 > E it
        # undercounted against the near-ceiling budget)
        pass_a = G * S * ((E + 3 * F4 + 4 * H + D) * 4
                          + (A + E + 3 * F4) * isz)
    else:
        pass_a = G * S * ((E + 4 * H + D) * 4
                          + (A + 2 * E + 2 * F4) * isz)
    return win + streams + rows + d_ea + grads + scratch + e_tmp + pass_a \
        + _weights_bytes(E=E, A=A, D=D, F4=F4, H=H, isz=isz, cell=cell)


def _budget(backward: bool) -> int:
    import os
    env = os.environ.get("IIC_TRAIN_BWD_VMEM" if backward
                         else "IIC_TRAIN_FWD_VMEM")
    if env:
        return int(env) * 1024 * 1024
    return _VMEM_BUDGET_BWD if backward else _VMEM_BUDGET_FWD


def pick_train_tile(B: int, S: int, *, dims, backward: bool,
                    img_tile: int = 32):
    """Largest G <= img_tile dividing B whose estimated scoped VMEM fits
    (multiples of 8 preferred for sublane-aligned rows), or None (callers
    fall back to XLA).  Per-image blocks ride as (B, 1, d) / (B, Pp, d)
    3-D layouts, so G itself is not sublane-constrained."""
    est = _estimate_bwd_vmem if backward else _estimate_fwd_vmem
    budget = _budget(backward)
    candidates = [G for G in range(min(img_tile, B), 0, -1) if B % G == 0]
    for G in ([g for g in candidates if g % 8 == 0]
              + [g for g in candidates if g % 8]):
        if est(G, S, **dims) <= budget:
            return G
    return None


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _mm(a, b):
    """(M, K) @ (K, N)."""
    return _dot(a, b, ((1,), (0,)))


def _make_fwd_kernel(*, names, G, S, Pp, P, E, A, D, F, H, F4, dt,
                     save_awe, cell="scn", ablate=None):
    """ablate (timing probes only, tools/exp_train_floor.py — values are
    wrong under any ablation): 'noawe' replaces the per-image M=1
    alpha@enc batched dot with a window slice; 'noe' replaces the
    (G, Pp, A) e-tensor relu/mul/reduce VPU pass with a slice; 'nogates'
    skips the 8 factor->hidden gate matmuls; 'nohproj' skips every h@W
    projection (dec, f_beta, hfac); 'noxin' skips the awe@wxa matmul;
    'skeleton' strips ALL of the above at once — what remains is stream
    DMA + softmax + cell elementwise + loop/issue overhead."""
    if ablate == "skeleton":
        ablate = {"noawe", "noe", "nogates", "nohproj", "noxin"}
    elif ablate == "skelmin":
        ablate = {"noawe", "noe", "nogates", "nohproj", "noxin",
                  "notrans", "nostore"}
    else:
        ablate = {ablate} if ablate else set()
    # A typoed probe token must fail loudly, not silently measure the
    # UN-ablated kernel and report it as an ablation result.
    known = {"noawe", "noe", "nogates", "nohproj", "noxin", "notrans",
             "nostore"}
    if ablate - known:
        raise ValueError(f"unknown fwd ablate token(s) {ablate - known}; "
                         f"known: {sorted(known)} + skeleton/skelmin")

    if "notrans" in ablate:
        # probe: transcendental cost — clamped affine stand-ins
        def sig(x):
            return jnp.clip(x.astype(jnp.float32) * 0.25 + 0.5,
                            0.0, 1.0).astype(dt)

        def tnh(x):
            return jnp.clip(x.astype(jnp.float32), -1.0, 1.0).astype(dt)
    else:
        def sig(x):  # f32 transcendentals (Mosaic bf16 logistic bug fix)
            return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

        def tnh(x):
            return jnp.tanh(x.astype(jnp.float32)).astype(dt)

    def kernel(*refs):
        r = dict(zip(names, refs))
        s_id = pl.program_id(1)

        @pl.when(s_id == 0)
        def _():
            r["h_scr"][:] = r["h0"][:, 0, :]
            r["c_scr"][:] = r["c0"][:, 0, :]

        h = r["h_scr"][:]
        c = r["c_scr"][:]
        ea = r["ea"][:]                                  # (G, Pp, A)
        enc = r["enc"][:]                                # (G, Pp, E)
        if cell == "scn":
            semx = r["semx"][:, 0, :]
            semh = r["semh"][:, 0, :]
        wf = r["wf"][:].astype(jnp.float32)              # (1, A)
        prow = jax.lax.broadcasted_iota(jnp.int32, (G, Pp), 1)

        for sub in range(S):
            # ---- every h@W projection (attention dec, f_beta gate, cell
            # recurrence) in ONE packed matmul: the step loop is
            # op-issue-latency-bound (exp_train_floor), so one wide dot
            # beats three narrow ones; slices at lane-aligned offsets ----
            # NOTE (accepted fwd/bwd rounding divergence, ADVICE r4): this
            # packed f32 formulation (one matmul + f32 bias adds, pre-
            # activations staying f32 into sig/tanh) rounds differently
            # from the backward's pass-A recompute, which re-derives
            # dec/gate/pre via separate dt-rounded matmuls with its own
            # bias association — gradients are therefore taken against
            # activations ~1 bf16 ulp from the forward's.  Pinned by
            # tests/test_train_fused.py::test_gradient_parity_bf16
            # (both cells, fused-vs-XLA grads within bf16 tolerance).
            if "nohproj" in ablate:
                hall = jnp.broadcast_to(r["bhcat"][:], (G, A + E + F4))
            else:
                hall = _mm(h, r["whcat"][:]) + r["bhcat"][:]  # f32
            dec = hall[:, :A].astype(dt)                 # (G, A)
            if "noe" in ablate:
                # a real reduce (not a slice of a possibly-broadcast dec):
                # Mosaic can't broadcast a (1,1) value in both dims
                att = ea[:, :, 0].astype(jnp.float32) + jnp.sum(
                    dec.astype(jnp.float32), axis=1, keepdims=True)
            else:
                e = jnp.maximum(ea + dec[:, None, :], 0)  # (G, Pp, A)
                # f32 ACCUMULATION without materialising an f32 copy of e
                # (13.6 MB/generation at G=32): products round to dt, the
                # reduce accumulates f32 — the bf16-mode XLA path rounds
                # the same way (its score matmul runs in bf16).
                att = jnp.sum(e * wf[None, :, :].astype(dt), axis=2,
                              dtype=jnp.float32)
            if P < Pp:
                att = jnp.where(prow < P, att, float("-inf"))
            mx = jnp.max(att, axis=1, keepdims=True)
            ex = jnp.exp(att - mx)
            alpha = ex / jnp.sum(ex, axis=1, keepdims=True)  # (G, Pp) f32
            if "nostore" not in ablate:
                r["alphas"][:, 0, sub, :] = alpha    # f32 ref
            if "noawe" in ablate:
                awe_raw = enc[:, 0, :] * alpha[:, :1].astype(dt)
            else:
                # batched contraction (G, Pp) x (G, Pp, E) -> (G, E)
                # rank-change BEFORE the dt cast: bf16 reshapes at the
                # lane-unaligned Pp width fail Mosaic layout inference
                awe_raw = jax.lax.dot_general(
                    alpha[:, None, :].astype(dt), enc,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :].astype(dt)
            if save_awe:
                # residual for the backward: saves it both the awe_raw
                # recompute and the untransposed enc window
                r["awe_raw"][:, 0, sub, :] = awe_raw
            gate = sig(hall[:, A:A + E])                 # f_beta (G, E)
            awe = gate * awe_raw                         # (G, E)

            if "noxin" in ablate:
                xin = r["emb_fac"][:, 0, sub, :] + awe[:, :F4]
            else:
                xin = (r["emb_fac"][:, 0, sub, :]
                       + _mm(awe, r["wxa"][:]).astype(dt))  # (G, F4)
            if cell == "scn":
                # ---- SCN recurrence (models/scn_cell.scn_step) ----
                xfac = xin * semx
                hfac = hall[:, A + E:].astype(dt) * semh  # bias seg is 0
                if "nogates" in ablate:
                    pre_full = (xfac + hfac).astype(jnp.float32) \
                        + r["bxh"][:]
                else:
                    pre_full = jnp.concatenate(
                        [_mm(xfac[:, g4 * F:(g4 + 1) * F],
                             r["wxp"][g4 * F:(g4 + 1) * F, :])
                         + _mm(hfac[:, g4 * F:(g4 + 1) * F],
                               r["whp"][g4 * F:(g4 + 1) * F, :])
                         for g4 in range(4)], axis=1) + r["bxh"][:]
                # gate order i, f, o, c: one sigmoid over the first 3H
                # lanes, one tanh over the last H — two transcendental
                # ops per step instead of four
                sg = sig(pre_full[:, :3 * H])
                i_g, f_g, o_g = (sg[:, :H], sg[:, H:2 * H], sg[:, 2 * H:])
                g_t = tnh(pre_full[:, 3 * H:])
            else:
                # ---- torch LSTM recurrence (models/lstm_cell.lstm_step,
                # gate order i, f, g, o) — xin already carries b-free
                # emb@w_ih[:Emb] + awe@w_ih[Emb:]; F4 == 4H here ----
                pre_all = (xin.astype(jnp.float32)
                           + hall[:, A + E:]            # h@w_hh, bias 0
                           + r["bxh"][:])
                sg = sig(jnp.concatenate(
                    [pre_all[:, :2 * H], pre_all[:, 3 * H:]], axis=1))
                i_g, f_g, o_g = (sg[:, :H], sg[:, H:2 * H], sg[:, 2 * H:])
                g_t = tnh(pre_all[:, 2 * H:3 * H])
            c = f_g * c + i_g * g_t
            h = o_g * tnh(c)
            if "nostore" not in ablate:
                r["h_all"][:, 0, sub, :] = h
                r["c_all"][:, 0, sub, :] = c

        if "nostore" in ablate:
            # probe: one block store per span instead of S sub-stores
            r["h_all"][:] = jnp.broadcast_to(h[:, None, None, :],
                                             (G, 1, S, D))
            r["c_all"][:] = jnp.broadcast_to(c[:, None, None, :],
                                             (G, 1, S, D))
            r["alphas"][:] = jnp.broadcast_to(
                alpha[:, None, None, :].astype(jnp.float32), (G, 1, S, Pp))
        r["h_scr"][:] = h
        r["c_scr"][:] = c

    return kernel


def _make_bwd_kernel(*, names, G, S, n_spans, Pp, P, E, A, D, F, H,
                     F4, dt, ablate=None, cell="scn"):
    if ablate not in (None, "noatt", "nodalpha", "node", "nodea", "nowf"):
        raise ValueError(f"unknown bwd ablate token {ablate!r}")
    f32 = jnp.float32

    def sigf(x):
        return jax.nn.sigmoid(x.astype(f32))

    def tnhf(x):
        return jnp.tanh(x.astype(f32))

    def kernel(*refs):
        r = dict(zip(names, refs))
        b_id = pl.program_id(0)
        s_id = pl.program_id(1)                      # 0 = LAST span (reverse)

        @pl.when(s_id == 0)
        def _():
            r["dh_scr"][:] = jnp.zeros_like(r["dh_scr"])
            r["dc_scr"][:] = jnp.zeros_like(r["dc_scr"])
            r["d_ea"][:] = jnp.zeros_like(r["d_ea"])
            if cell == "scn":
                r["d_semx"][:] = jnp.zeros_like(r["d_semx"])
                r["d_semh"][:] = jnp.zeros_like(r["d_semh"])

        @pl.when(jnp.logical_and(b_id == 0, s_id == 0))
        def _():
            r["d_wf"][:] = jnp.zeros_like(r["d_wf"])

        dh = r["dh_scr"][:]                              # (G, D) f32
        dc = r["dc_scr"][:]
        ea = r["ea"][:]
        enc_t = r["enc_t"][:]                            # (G, E, Pp)
        if cell == "scn":
            semx = r["semx"][:, 0, :].astype(f32)
            semh = r["semh"][:, 0, :].astype(f32)
        wf = r["wf"][:].astype(f32)                      # (1, A)

        # Only the wf gradient accumulates in-kernel (it contracts
        # against e, which never leaves VMEM); every other weight
        # gradient is a full-batch XLA matmul over the row-factor
        # streams written below (see _bwd_call).
        def add(name, contribution, idx=slice(None)):
            r["d_" + name][idx] = r["d_" + name][idx] + contribution

        if cell == "scn":
            d_semx_acc = jnp.zeros((G, F4), f32)
            d_semh_acc = jnp.zeros((G, F4), f32)

        # ---- pass A: batched recompute of every forward quantity that
        # depends only on streamed inputs (h_prev, awe_raw, emb_fac,
        # c_all).  These matmuls run once per span at M = G*S rows
        # instead of S times at M = G — the reverse-chain loop below is
        # inherently sequential, but the recompute half of the
        # backward's FLOPs is not.  dot_general flattens the (G, S)
        # leading dims into the MXU M dimension; each output row is the
        # same K-dot as the per-step matmul, so values are unchanged.
        def d3(x, w):                                    # (G, S, K) @ (K, N)
            g, s, k = x.shape
            return _mm(x.reshape(g * s, k), w).reshape(g, s, -1)
        hp3 = r["h_prev"][:, 0]                          # (G, S, D) dt
        awe_raw3 = r["awe_raw"][:, 0]                    # (G, S, E) dt
        dec_all = (d3(hp3, r["wda"][:]).astype(dt)
                   + r["bda"][:].astype(dt))             # (G, S, A) dt
        gate_all = sigf(d3(hp3, r["wfb"][:])
                        + r["bfb"][:].astype(f32))       # (G, S, E) f32
        awe_all = gate_all.astype(dt) * awe_raw3         # (G, S, E) dt
        xin_all = (r["emb_fac"][:, 0]
                   + d3(awe_all, r["wxa"][:]).astype(dt))  # (G, S, F4)
        tc_all = tnhf(r["c_all"][:, 0])                  # (G, S, D) f32
        if cell == "scn":
            # xfac/hfac are consumed only through .astype(dt) (the pre
            # matmuls and the dt stream writes), so the dt cast here is
            # bit-identical to the per-step path and halves their
            # span-resident footprint; hfac_raw stays f32 (d_semh needs
            # the f32 product).
            xfac_all = (xin_all.astype(f32)
                        * semx[:, None, :]).astype(dt)
            hfac_raw_all = d3(hp3, r["wh"][:])           # (G, S, F4) f32
            hfac_all = (hfac_raw_all * semh[:, None, :]).astype(dt)
            pre_all = []
            for g4 in range(4):
                sl = slice(g4 * F, (g4 + 1) * F)
                slh = slice(g4 * H, (g4 + 1) * H)
                xg = d3(xfac_all[:, :, sl],
                        r["wxhp"][2 * g4 * F:(2 * g4 + 1) * F, :]) \
                    + r["bx"][:, slh].astype(f32)
                hg = d3(hfac_all[:, :, sl],
                        r["wxhp"][(2 * g4 + 1) * F:(2 * g4 + 2) * F, :]) \
                    + r["bh"][:, slh].astype(f32)
                pre_all.append(xg + hg)                  # (G, S, H) f32
            i_all = sigf(pre_all[0])
            f_all = sigf(pre_all[1])
            o_all = sigf(pre_all[2])
            g_all = tnhf(pre_all[3])
        else:
            pre_cat = (xin_all.astype(f32) + d3(hp3, r["wh"][:])
                       + r["bx"][:].astype(f32)
                       + r["bh"][:].astype(f32))         # (G, S, 4H) f32
            i_all = sigf(pre_cat[:, :, :H])
            f_all = sigf(pre_cat[:, :, H:2 * H])
            g_all = tnhf(pre_cat[:, :, 2 * H:3 * H])
            o_all = sigf(pre_cat[:, :, 3 * H:])

        wfdec_acc = jnp.zeros((G, A), f32)
        for sub in reversed(range(S)):
            c_prev = r["c_prev"][:, 0, sub, :]
            alpha = r["alphas"][:, 0, sub, :].astype(f32)   # (G, Pp)

            dec = dec_all[:, sub]                        # (G, A) dt
            awe_raw = awe_raw3[:, sub]                   # (G, E) dt
            gate = gate_all[:, sub]                      # (G, E) f32
            awe = awe_all[:, sub]
            xin = xin_all[:, sub]
            dh_t = dh + r["d_hall"][:, 0, sub, :].astype(f32)
            tc = tc_all[:, sub]
            i_g, f_g, o_g, g_t = (i_all[:, sub], f_all[:, sub],
                                  o_all[:, sub], g_all[:, sub])

            if cell == "scn":
                xfac = xfac_all[:, sub]                  # (G, F4) f32
                hfac_raw = hfac_raw_all[:, sub]
                hfac = hfac_all[:, sub]

            # ---- cell backward (gates recomputed batched in pass A) ----
            d_o = dh_t * tc * o_g * (1.0 - o_g)
            dc_t = dc + dh_t * o_g * (1.0 - tc * tc)
            d_f = dc_t * c_prev.astype(f32) * f_g * (1.0 - f_g)
            d_i = dc_t * g_t * i_g * (1.0 - i_g)
            d_g = dc_t * i_g * (1.0 - g_t * g_t)
            dc = dc_t * f_g

            if cell == "scn":
                d_pre = [d_i, d_f, d_o, d_g]             # gate order i,f,o,c

                dh_new = jnp.zeros((G, D), f32)
                d_xfac = []
                d_hfac = []
                for g4 in range(4):
                    dp = d_pre[g4].astype(dt)            # (G, H)
                    # one (K=H, N=2F) dot against the interleaved
                    # [wxp_g; whp_g] pair instead of two N=F dots
                    db = _dot(dp, r["wxhp"][2 * g4 * F:(2 * g4 + 2) * F,
                                            :], ((1,), (1,)))  # (G, 2F)
                    d_xfac.append(db[:, :F])
                    d_hfac.append(db[:, F:])
                d_xfac = jnp.concatenate(d_xfac, axis=1)  # (G, F4) f32
                d_hfac = jnp.concatenate(d_hfac, axis=1)
                r["dpre"][:, 0, sub, :] = jnp.concatenate(
                    d_pre, axis=1).astype(dt)
                r["xfac"][:, 0, sub, :] = xfac.astype(dt)
                r["hfac"][:, 0, sub, :] = hfac.astype(dt)

                d_hfac_raw = d_hfac * semh
                d_semh_acc = d_semh_acc + d_hfac * hfac_raw
                r["dhfr"][:, 0, sub, :] = d_hfac_raw.astype(dt)
                dh_new = dh_new + _dot(d_hfac_raw.astype(dt), r["wh"][:],
                                       ((1,), (1,)))

                d_xin = d_xfac * semx                    # (G, F4) f32
                d_semx_acc = d_semx_acc + d_xfac * xin.astype(f32)
                r["d_emb"][:, 0, sub, :] = d_xin.astype(dt)
            else:
                # torch LSTM: pre = xin + h@w_hh + b_ih + b_hh, gate
                # order i, f, g, o — pre's cotangent IS xin's
                d_pre = jnp.concatenate([d_i, d_f, d_g, d_o],
                                        axis=1).astype(dt)  # (G, 4H)
                r["dpre"][:, 0, sub, :] = d_pre          # doubles as d_emb
                dh_new = _dot(d_pre, r["wh"][:], ((1,), (1,)))
                d_xin = d_pre                            # pre = xin + ...

            r["awe"][:, 0, sub, :] = awe
            d_awe = _dot(d_xin.astype(dt), r["wxa"][:], ((1,), (1,)))

            # ---- f_beta gate backward ----
            d_gate = d_awe * awe_raw.astype(f32)         # (G, E)
            d_awe_raw = d_awe * gate
            d_fb_pre = d_gate * gate * (1.0 - gate)
            r["dfb"][:, 0, sub, :] = d_fb_pre.astype(dt)
            dh_new = dh_new + _dot(d_fb_pre.astype(dt), r["wfb"][:],
                                   ((1,), (1,)))

            # ---- attention backward ----
            if ablate == "noatt":
                d_dec = jnp.zeros((G, A), dt)
                r["ddec"][:, 0, sub, :] = d_dec
                dh = dh_new + _dot(d_dec, r["wda"][:], ((1,), (1,)))
                continue
            # (M=1, K=E, N=Pp) against the TRANSPOSED window: the
            # (M=Pp, K=E, N=1) layout costs ~63 ms/step-total at
            # flagship dims (N=1 uses one MXU column tile)
            if ablate == "nodalpha":
                d_alpha = jnp.zeros((G, Pp), f32)
            else:
                d_alpha = jax.lax.dot_general(
                    d_awe_raw[:, None, :].astype(dt), enc_t,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32)[:, 0, :]  # (G, Pp)
            d_alpha = d_alpha + r["d_alphas"][:, 0, sub, :].astype(f32)
            inner = jnp.sum(d_alpha * alpha, axis=1, keepdims=True)
            d_att = alpha * (d_alpha - inner)            # (G, Pp) f32
            # bf16 vector comparisons are unsupported on this target —
            # the relu mask compares in f32
            # d_e = d_att ⊗ wf ⊙ relu-mask, but wf is loop-invariant: the
            # accumulator keeps the wf-FREE product Σ_t d_att_t ⊙ mask_t
            # and the single ⊗ wf broadcast happens once per chunk at
            # finalize — one (G, Pp, A) VPU pass per STEP becomes one
            # per CHUNK (the d_dec row reduce re-applies wf on its (G, A)
            # result, where it is ~Pp× cheaper).  No padded-row where is
            # needed: alpha at padded rows is exp(-inf) == exact 0 from
            # the forward softmax, so d_att (and with it d_m) is already
            # an exact 0 there.  The wf GRADIENT also leaves the step
            # loop: with e = mask ⊙ (ea + dec),
            #   Σ_t d_att_t ⊙ e_t = ea ⊙ Σ_t d_m_t  +  dec_t ⊙ Σ_p d_m_t
            # so it reduces to one ea ⊙ d_ea_raw contraction per CHUNK
            # plus a (G, A) FMA per step on the already-computed d_dec
            # row sums.
            if ablate == "node":
                mask_dt = jnp.zeros((G, Pp, A), dt)
            else:
                mask_dt = ((ea + dec[:, None, :]).astype(f32)
                           > 0.0).astype(dt)             # (G, Pp, A) 0/1
            if ablate != "nodea":
                # accumulate straight into the chunk-resident output
                # block: a second span-local (G, Pp, A) f32 generation
                # is exactly the VMEM that pushes G=16 over the limit
                r["d_ea"][:] = r["d_ea"][:] + d_att[:, :, None] \
                    * mask_dt.astype(f32)
            # Pp-reduce of d_att ⊙ mask via a batched dot (a plain
            # sum(axis=1) hits a Mosaic relayout bug on the (G, A)
            # result); contracting d_att against the 0/1 mask directly
            # skips materialising the d_m product in dt entirely
            d_dec_raw = jax.lax.dot_general(
                d_att[:, None, :].astype(dt), mask_dt,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)[:, 0, :]     # (G, A) f32
            if ablate != "nowf":
                wfdec_acc = wfdec_acc + d_dec_raw * dec.astype(f32)
            d_dec = (d_dec_raw * wf).astype(dt)          # (G, A)
            r["ddec"][:, 0, sub, :] = d_dec
            dh_new = dh_new + _dot(d_dec, r["wda"][:], ((1,), (1,)))
            dh = dh_new

        if cell == "scn":
            r["d_semx"][:, 0, :] = r["d_semx"][:, 0, :] + d_semx_acc
            r["d_semh"][:, 0, :] = r["d_semh"][:, 0, :] + d_semh_acc
        add("wf", jnp.sum(wfdec_acc, axis=0, keepdims=True))

        @pl.when(s_id == n_spans - 1)
        def _():
            d_ea_raw = r["d_ea"][:]
            ones_p = jnp.ones((G, 1, Pp), dt)
            # NOTE (ablations): under ablate='node'/'nodea' d_ea stays
            # zero, so this ea-half of the wf gradient is zero there too —
            # those probes time a wf-grad missing its ea term.  Guarded by
            # 'nowf' so the nowf probe drops BOTH halves consistently.
            if ablate != "nowf":
                ea_term = jax.lax.dot_general(            # Σ_p d_ea ⊙ ea
                    ones_p, (d_ea_raw * ea.astype(f32)).astype(dt),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32)[:, 0, :]  # (G, A) f32
                add("wf", jnp.sum(ea_term, axis=0, keepdims=True))
            r["d_ea"][:] = d_ea_raw * wf[None, :, :]
        r["dh_scr"][:] = dh
        r["dc_scr"][:] = dc

        @pl.when(s_id == n_spans - 1)
        def _():
            r["dh0"][:, 0, :] = dh
            r["dc0"][:, 0, :] = dc

    return kernel


_WEIGHT_NAMES_SCN = ("whcat", "bhcat", "wf", "wxa", "wxp", "whp", "bxh")
# the backward reads the gate-interleaved wxhp instead of wxp/whp
_WEIGHT_NAMES_SCN_BWD = ("wda", "bda", "wf", "wfb", "bfb", "wxa", "wh",
                         "wxhp", "bx", "bh")
_WEIGHT_NAMES_LSTM = ("whcat", "bhcat", "wf", "wxa", "bxh")
_WEIGHT_NAMES_LSTM_BWD = ("wda", "bda", "wf", "wfb", "bfb", "wxa", "wh",
                          "bx", "bh")


def _weight_names(cell_kind: str, backward: bool = False):
    if cell_kind != "scn":
        return _WEIGHT_NAMES_LSTM_BWD if backward else _WEIGHT_NAMES_LSTM
    return _WEIGHT_NAMES_SCN_BWD if backward else _WEIGHT_NAMES_SCN


def _cell_kind_of(kw) -> str:
    # the weight-dict structure is static under jit, so branching on key
    # presence at trace time is free
    return "scn" if "wxp" in kw else "lstm"


def pack_train_weights(params, cfg, dt):
    """Decoder params -> the kernel weight dict (differentiable ops only,
    so autodiff maps the kernel's weight cotangents back onto the tree)."""
    cell = params["decode_step"]
    att = params["attention"]
    A, E = cfg.attention_dim, cfg.encoder_dim
    Emb, F, H = cfg.embed_dim, cfg.factored_dim, cfg.decoder_dim
    kw = {
        "wda": att["decoder_att"]["w"].astype(dt),
        "bda": att["decoder_att"]["b"].reshape(1, A).astype(dt),
        "wf": att["full_att"]["w"].astype(jnp.float32).reshape(1, A),
        "wfb": params["f_beta"]["w"].astype(dt),
        "bfb": params["f_beta"]["b"].reshape(1, E).astype(dt),
    }

    def hpack(wh_like, width):
        # every per-step h@W projection (attention dec, f_beta gate, cell
        # recurrence) as ONE packed (D, A+E+width) matmul: the serial
        # step loop is op-issue-latency-bound (tools/exp_train_floor.py
        # — the no-matmul skeleton is ~13 of the 34 ms forward), so
        # fewer, wider ops per step beat three narrow ones.  The wh
        # segment's bias is zero, keeping that slice bit-identical to
        # the separate h@wh dot.  Cotangents flow through the separate
        # wda/wfb/wh entries; the packed copies' come back as exact 0.
        kw["whcat"] = jnp.concatenate(
            [kw["wda"], kw["wfb"], wh_like], axis=1)
        kw["bhcat"] = jnp.concatenate(
            [kw["bda"].astype(jnp.float32),
             kw["bfb"].astype(jnp.float32),
             jnp.zeros((1, width), jnp.float32)], axis=1)

    if cfg.model_type == "pure_attention":
        # torch LSTMCell: fused (in, 4H) weights; the embedding slab of
        # w_ih is projected outside the kernel (emb_fac)
        kw.update({
            "wxa": cell["w_ih"][Emb:].astype(dt),
            "wh": cell["w_hh"].astype(dt),
            "bx": cell["b_ih"].reshape(1, 4 * H).astype(dt),
            "bh": cell["b_hh"].reshape(1, 4 * H).astype(dt),
        })
        hpack(kw["wh"], 4 * H)
        kw["bxh"] = (cell["b_ih"].astype(jnp.float32)
                     + cell["b_hh"].astype(jnp.float32)).reshape(1, 4 * H)
        return kw
    wxp4 = cell["w_xp"].reshape(4, F, H)
    whp4 = cell["w_hp"].reshape(4, F, H)
    kw.update({
        "wxa": cell["w_x"][Emb:].astype(dt),
        "wh": cell["w_h"].astype(dt),
        "wxp": cell["w_xp"].reshape(4 * F, H).astype(dt),
        "whp": cell["w_hp"].reshape(4 * F, H).astype(dt),
        # gate-interleaved [wxp_g; whp_g] pairs: the backward contracts
        # d_pre_g against both factor projections in ONE (K=H, N=2F)
        # matmul per gate instead of two — the cotangent flows through
        # the separate wxp/whp entries (d_wxhp is returned as exact 0)
        "wxhp": jnp.stack([wxp4, whp4], axis=1).reshape(8 * F, H)
        .astype(dt),
        "bx": cell["b_x"].reshape(1, 4 * H).astype(dt),
        "bh": cell["b_h"].reshape(1, 4 * H).astype(dt),
    })
    hpack(kw["wh"], 4 * F)
    kw["bxh"] = (cell["b_x"].astype(jnp.float32)
                 + cell["b_h"].astype(jnp.float32)).reshape(1, 4 * H)
    return kw


def _span_pad(T: int, span: int) -> int:
    return -(-T // span) * span


@functools.partial(jax.jit, static_argnames=("span", "num_pixels",
                                             "img_tile", "interpret",
                                             "save_awe", "ablate"))
def _fwd_call(kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, *, span,
              num_pixels, img_tile, interpret, save_awe=False,
              ablate=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cell = _cell_kind_of(kw)
    B, Pp, E = enc_p.shape
    A = ea_p.shape[-1]
    D = h0.shape[-1]
    F4 = emb_fac.shape[-1]
    F, H = F4 // 4, D
    Tp = emb_fac.shape[1]
    S = span
    n_spans = Tp // S
    dt = h0.dtype
    isz = jnp.dtype(dt).itemsize
    G = pick_train_tile(B, S, dims=dict(Pp=Pp, E=E, A=A, D=D, F4=F4,
                                        isz=isz, cell=cell), backward=False,
                        img_tile=img_tile)
    if G is None:
        raise ValueError(f"no VMEM-feasible train tile for B={B}")

    win = lambda d: pl.BlockSpec((G, Pp, d), lambda b, s: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    # time-sliced tensors ride as (B, n_spans, S, d) so the (S, d) block
    # tail equals the array tail (Pallas TPU last-two-dims rule)
    span4 = lambda d: pl.BlockSpec((G, 1, S, d),
                                   lambda b, s: (b, s, 0, 0),
                                   memory_space=pltpu.VMEM)
    rows3 = lambda d: pl.BlockSpec((G, 1, d), lambda b, s: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * len(shape), memory_space=pltpu.VMEM)

    r3 = lambda x: x[:, None, :]
    in_names = ["enc", "ea", "emb_fac"]
    in_specs = [win(E), win(A), span4(F4)]
    inputs = [enc_p, ea_p, emb_fac.reshape(B, n_spans, S, F4)]
    if cell == "scn":
        in_names += ["semx", "semh"]
        in_specs += [rows3(F4), rows3(F4)]
        inputs += [r3(semx), r3(semh)]
    in_names += ["h0", "c0"]
    in_specs += [rows3(D), rows3(D)]
    inputs += [r3(h0), r3(c0)]
    for nm in _weight_names(cell):
        in_names.append(nm)
        in_specs.append(const(*kw[nm].shape))
        inputs.append(kw[nm])

    out_names = ["h_all", "c_all", "alphas"]
    # alphas ride f32: Pp is lane-unaligned (208 at flagship dims)
    # and bf16 rank-changing stores at that width fail Mosaic layout
    # inference; the extra bytes are the smallest stream here.
    out_specs = [span4(D), span4(D), span4(Pp)]
    out_shape = [jax.ShapeDtypeStruct((B, n_spans, S, D), dt),
                 jax.ShapeDtypeStruct((B, n_spans, S, D), dt),
                 jax.ShapeDtypeStruct((B, n_spans, S, Pp), jnp.float32)]
    if save_awe:
        out_names.append("awe_raw")
        out_specs.append(span4(E))
        out_shape.append(jax.ShapeDtypeStruct((B, n_spans, S, E), dt))
    scratch_names = ["h_scr", "c_scr"]
    kernel = _make_fwd_kernel(
        names=tuple(in_names + out_names + scratch_names),
        G=G, S=S, Pp=Pp, P=num_pixels, E=E, A=A, D=D, F=F, H=H, F4=F4,
        dt=dt, save_awe=save_awe, cell=cell, ablate=ablate)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G, n_spans),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((G, D), dt), pltpu.VMEM((G, D), dt)],
        interpret=interpret,
        compiler_params=None if interpret else _params2d(_limit(False)),
    )(*inputs)
    h_all, c_all, alphas = outs[:3]
    res = (h_all.reshape(B, Tp, D), c_all.reshape(B, Tp, D),
           alphas.reshape(B, Tp, Pp))
    if save_awe:
        res = res + (outs[3].reshape(B, Tp, E),)
    return res


@functools.partial(jax.jit, static_argnames=("span", "num_pixels",
                                             "img_tile", "interpret",
                                             "ablate"))
def _bwd_call(kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0,
              h_all, c_all, alphas, awe_raw, d_hall, d_alphas, *, span,
              num_pixels, img_tile, interpret, ablate=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cell = _cell_kind_of(kw)
    B, Pp, E = enc_p.shape
    A = ea_p.shape[-1]
    D = h0.shape[-1]
    F4 = emb_fac.shape[-1]
    F, H = F4 // 4, D
    Tp = emb_fac.shape[1]
    S = span
    n_spans = Tp // S
    dt = h0.dtype
    isz = jnp.dtype(dt).itemsize
    G = pick_train_tile(B, S, dims=dict(Pp=Pp, E=E, A=A, D=D, F4=F4,
                                        isz=isz, cell=cell), backward=True,
                        img_tile=img_tile)
    if G is None:
        raise ValueError(f"no VMEM-feasible train tile for B={B}")

    # previous-step states: h_prev[t] = h_{t-1} (h0 at t=0)
    h_prev = jnp.concatenate([h0[:, None, :], h_all[:, :-1, :]], axis=1)
    c_prev = jnp.concatenate([c0[:, None, :], c_all[:, :-1, :]], axis=1)

    rev = n_spans - 1
    win = lambda d: pl.BlockSpec((G, Pp, d), lambda b, s: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    span4r = lambda d: pl.BlockSpec((G, 1, S, d),
                                    lambda b, s: (b, rev - s, 0, 0),
                                    memory_space=pltpu.VMEM)
    rows3 = lambda d: pl.BlockSpec((G, 1, d), lambda b, s: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * len(shape), memory_space=pltpu.VMEM)

    sp = lambda x, d: x.reshape(B, n_spans, S, d)
    r3 = lambda x: x[:, None, :]
    # the encoder window rides TRANSPOSED: d_alpha contracts E with the
    # output minor dim on Pp (full lanes) instead of N=1
    enc_t = jnp.swapaxes(enc_p, 1, 2)                    # (B, E, Pp)
    win_t = pl.BlockSpec((G, E, Pp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    in_names = ["enc_t", "ea", "h_prev", "c_prev", "c_all", "alphas",
                "emb_fac", "d_hall", "d_alphas", "awe_raw"]
    in_specs = [win_t, win(A), span4r(D), span4r(D), span4r(D),
                span4r(Pp), span4r(F4), span4r(D), span4r(Pp),
                span4r(E)]
    inputs = [enc_t, ea_p, sp(h_prev, D), sp(c_prev, D), sp(c_all, D),
              sp(alphas, Pp), sp(emb_fac, F4), sp(d_hall, D),
              sp(d_alphas, Pp), sp(awe_raw, E)]
    if cell == "scn":
        in_names += ["semx", "semh"]
        in_specs += [rows3(F4), rows3(F4)]
        inputs += [r3(semx), r3(semh)]
    for nm in _weight_names(cell, backward=True):
        in_names.append(nm)
        in_specs.append(const(*kw[nm].shape))
        inputs.append(kw[nm])

    if cell == "scn":
        stream_d = {"dpre": 4 * H, "dhfr": F4, "dfb": E, "ddec": A,
                    "xfac": F4, "hfac": F4, "awe": E}
    else:
        # dpre doubles as the d_emb (xin) cotangent: pre = xin + h@wh + b
        stream_d = {"dpre": 4 * H, "dfb": E, "ddec": A, "awe": E}
    out_names = ["d_ea"]
    out_specs = [win(A)]
    out_shape = [jax.ShapeDtypeStruct((B, Pp, A), jnp.float32)]
    if cell == "scn":
        out_names += ["d_emb", "d_semx", "d_semh"]
        out_specs += [span4r(F4), rows3(F4), rows3(F4)]
        out_shape += [jax.ShapeDtypeStruct((B, n_spans, S, F4), dt),
                      jax.ShapeDtypeStruct((B, 1, F4), jnp.float32),
                      jax.ShapeDtypeStruct((B, 1, F4), jnp.float32)]
    out_names += ["dh0", "dc0", "d_wf"]
    out_specs += [rows3(D), rows3(D), const(*kw["wf"].shape)]
    out_shape += [jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
                  jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
                  jax.ShapeDtypeStruct(kw["wf"].shape, jnp.float32)]
    out_names += list(stream_d)
    for nm, d in stream_d.items():
        out_specs.append(span4r(d))
        out_shape.append(jax.ShapeDtypeStruct((B, n_spans, S, d), dt))

    scratch_names = ["dh_scr", "dc_scr"]
    kernel = _make_bwd_kernel(
        names=tuple(in_names + out_names + scratch_names),
        G=G, S=S, n_spans=n_spans, Pp=Pp, P=num_pixels, E=E, A=A, D=D,
        F=F, H=H, F4=F4, dt=dt, ablate=ablate, cell=cell)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G, n_spans),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((G, D), jnp.float32),
                        pltpu.VMEM((G, D), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else _params2d(_limit(True)),
    )(*inputs)
    outs = dict(zip(out_names, outs))
    d_ea, d_wf = outs["d_ea"], outs["d_wf"]
    dh0, dc0 = outs["dh0"], outs["dc0"]
    st = {nm: outs[nm].reshape(B * Tp, d) for nm, d in stream_d.items()}

    # ---- weight gradients: single (B*Tp)-row MXU matmuls over the
    # streamed row factors (padded steps contribute exact-zero dpre
    # rows).  Same numerics as in-kernel: dt products, f32 accumulate.
    hp = h_prev.reshape(B * Tp, D)
    gm = lambda a, b: _dot(a, b, ((0,), (0,)))           # a^T b, f32 out
    if cell == "scn":
        d_emb = outs["d_emb"]
        dxin = d_emb.reshape(B * Tp, F4)
        dpre4 = st["dpre"].reshape(-1, 4, H)
        d_kw = {
            "wxp": jnp.einsum("ngf,ngh->gfh", st["xfac"].reshape(-1, 4, F),
                              dpre4,
                              preferred_element_type=jnp.float32
                              ).reshape(4 * F, H),
            "whp": jnp.einsum("ngf,ngh->gfh", st["hfac"].reshape(-1, 4, F),
                              dpre4,
                              preferred_element_type=jnp.float32
                              ).reshape(4 * F, H),
            "wh": gm(hp, st["dhfr"]),
            "wxa": gm(st["awe"], dxin),
        }
        d_semx, d_semh = outs["d_semx"][:, 0], outs["d_semh"][:, 0]
    else:
        d_emb = outs["dpre"]                             # d_xin == d_pre
        dxin = st["dpre"]
        d_kw = {
            "wh": gm(hp, st["dpre"]),
            "wxa": gm(st["awe"], dxin),
        }
        d_semx = d_semh = None
    d_kw.update({
        "wfb": gm(hp, st["dfb"]),
        "wda": gm(hp, st["ddec"]),
        "wf": d_wf,
        "bx": jnp.sum(st["dpre"].astype(jnp.float32), axis=0,
                      keepdims=True),
        "bfb": jnp.sum(st["dfb"].astype(jnp.float32), axis=0,
                       keepdims=True),
        "bda": jnp.sum(st["ddec"].astype(jnp.float32), axis=0,
                       keepdims=True),
    })
    d_kw["bh"] = d_kw["bx"]
    if cell == "scn":
        # the interleaved pair is a packing of wxp/whp whose real
        # cotangents are returned above; autodiff through the stack in
        # pack_train_weights must contribute nothing extra
        d_kw["wxhp"] = jnp.zeros_like(kw["wxhp"])
    # same for the forward's packed h-projection weights/biases: the true
    # gradients are attributed to the separate wda/wfb/wh/... entries
    for nm in ("whcat", "bhcat", "bxh"):
        d_kw[nm] = jnp.zeros_like(kw[nm])
    return (d_ea, d_emb.reshape(B, Tp, F4), d_semx, d_semh,
            dh0[:, 0], dc0[:, 0], d_kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _train_scan(static, kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0):
    """(h_all (B, T, D), alphas (B, T, P)); differentiable in everything
    but enc_p (zero cotangent — frozen-encoder path only)."""
    span, num_pixels, T, img_tile, interpret = static
    h_all, _, alphas = _fwd_call(kw, enc_p, ea_p, emb_fac, semx, semh,
                                 h0, c0, span=span, num_pixels=num_pixels,
                                 img_tile=img_tile, interpret=interpret)
    return h_all[:, :T], alphas[:, :T, :num_pixels].astype(h_all.dtype)


def _train_scan_fwd(static, kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0):
    span, num_pixels, T, img_tile, interpret = static
    h_all, c_all, alphas, awe_raw = _fwd_call(
        kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, span=span,
        num_pixels=num_pixels, img_tile=img_tile, interpret=interpret,
        save_awe=True)
    res = (kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, h_all, c_all,
           alphas, awe_raw)
    return (h_all[:, :T],
            alphas[:, :T, :num_pixels].astype(h_all.dtype)), res


def _train_scan_bwd(static, res, cts):
    span, num_pixels, T, img_tile, interpret = static
    (kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, h_all, c_all, alphas,
     awe_raw) = res
    d_hall_sl, d_alphas_sl = cts
    B, Tp, D = h_all.shape
    Pp = alphas.shape[-1]
    dt = h_all.dtype
    d_hall = jnp.zeros((B, Tp, D), dt).at[:, :T].set(d_hall_sl.astype(dt))
    d_alphas = jnp.zeros((B, Tp, Pp), jnp.float32) \
        .at[:, :T, :num_pixels].set(d_alphas_sl.astype(jnp.float32))
    d_ea, d_emb, d_semx, d_semh, dh0, dc0, d_kw = _bwd_call(
        kw, enc_p, ea_p, emb_fac, semx, semh, h0, c0, h_all, c_all,
        alphas, awe_raw, d_hall, d_alphas, span=span,
        num_pixels=num_pixels, img_tile=img_tile, interpret=interpret)
    cast = lambda g, p: g.astype(p.dtype)
    return (jax.tree.map(cast, d_kw, kw),
            jnp.zeros_like(enc_p),                      # frozen encoder
            cast(d_ea, ea_p),
            cast(d_emb, emb_fac),
            jnp.zeros_like(semx) if d_semx is None else cast(d_semx, semx),
            jnp.zeros_like(semh) if d_semh is None else cast(d_semh, semh),
            cast(dh0, h0),
            cast(dc0, c0))


_train_scan.defvjp(_train_scan_fwd, _train_scan_bwd)


def feasible(cfg, B: int, dt, span: int = 4, img_tile: int = 32) -> bool:
    """Whether the fused training scan supports this configuration.

    Covers the two attention-bearing families — attention_scn (SCN cell)
    and pure_attention (torch LSTM cell) — whose XLA scans are DMA-bound
    on the per-step encoder re-read.  pure_scn is deliberately excluded:
    its scan carries no encoder state (the vocab head already runs
    outside the scan), so there is no DMA floor for a fused kernel to
    break there."""
    if cfg.model_type == "attention_scn":
        cell, F4 = "scn", 4 * cfg.factored_dim
    elif cfg.model_type == "pure_attention":
        cell, F4 = "lstm", 4 * cfg.decoder_dim
    else:
        return False
    Pp = _round_up(cfg.num_pixels, 16)
    dims = dict(Pp=Pp, E=cfg.encoder_dim, A=cfg.attention_dim,
                D=cfg.decoder_dim, F4=F4,
                isz=jnp.dtype(dt).itemsize, cell=cell)
    return (pick_train_tile(B, span, dims=dims, backward=False,
                            img_tile=img_tile) is not None
            and pick_train_tile(B, span, dims=dims, backward=True,
                                img_tile=img_tile) is not None)


def fused_teacher_forcing_scan(params, cfg, enc_flat, tags, emb, *,
                               span: int = 4, img_tile: int = 32,
                               interpret=None):
    """Run the teacher-forcing scan through the fused kernel pair.

    enc_flat: (B, P, E); tags: (B, S); emb: (B, T, Emb) embedded inputs.
    Returns (h_all (B, T, D), alphas (B, T, P)).  All surrounding ops
    (embedding projection, semantic projections, attention precompute,
    init state) stay in XLA so their parameter gradients flow through
    ordinary autodiff; the custom VJP covers exactly the scan.
    """
    from ..models import attention as attn
    from ..models import decoders, scn_cell
    from .attention_pallas import pad_pixels

    B, P, E = enc_flat.shape
    T = emb.shape[1]
    dt = enc_flat.dtype
    cell = params["decode_step"]

    enc_p = pad_pixels(enc_flat)
    ea_p = pad_pixels(attn.precompute(params["attention"], enc_flat))
    if cfg.model_type == "pure_attention":
        # dummy rows: the LSTM kernel reads no semantic state (their
        # cotangents come back as exact zeros)
        semx = semh = jnp.zeros((B, 1), dt)
        w_x_emb = cell["w_ih"][: cfg.embed_dim]          # (Emb, 4H)
    else:
        F4 = 4 * cfg.factored_dim
        sx, sh = scn_cell.semantic_projections(cell, tags)
        semx = sx.reshape(B, F4).astype(dt)
        semh = sh.reshape(B, F4).astype(dt)
        w_x_emb = cell["w_x"][: cfg.embed_dim]
    h0, c0 = decoders.init_hidden_state(params, enc_flat)
    h0 = h0.astype(dt)
    c0 = c0.astype(dt)
    Tp = _span_pad(T, span)
    emb_fac = (emb @ w_x_emb).astype(dt)                 # (B, T, F4|4H)
    emb_fac = jnp.pad(emb_fac, ((0, 0), (0, Tp - T), (0, 0)))
    kw = pack_train_weights(params, cfg, dt)
    static = (span, P, T, img_tile,
              interpret if interpret is not None
              else jax.default_backend() == "cpu")
    return _train_scan(static, kw, enc_p, ea_p, emb_fac, semx, semh,
                       h0, c0)
