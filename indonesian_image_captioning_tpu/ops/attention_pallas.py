"""Pallas TPU kernels: fused additive (Bahdanau) attention step.

The decode-time hot spot (reference models/attention.py:6-44 runs this per
beam step; models/decoders/attention_scn.py:217-290).

**Measured verdict (v5e, B=1024/2048, K=5, P=196, A=512, E=2048, bf16)**:
the round-1 in-loop step timings (XLA attend 2.4 ms vs attend_fused
5.7 ms) inverted once the vocab head stopped dominating the decode loop
(ops/topk_pallas.py): in FULL 51-step decodes the Pallas kernels now win —
B=2048: attend_fused 510.2 ms/batch, attend_fused_mxu 510.6, XLA (B,P,K,A)
layout 523.2, round-1 XLA layout ~560 (2026-08-16).  The MXU-contraction
kernel (:func:`attend_fused_mxu`, below) is the TPU default
(``ModelConfig.attention_impl="auto"``); the transposed-layout variant at
the bottom remains the one measured loser (~7.5 ms/step), kept as a
documented building block.

Each kernel computes the whole attention step per image tile in VMEM:

    att[k, p] = w_full . relu(enc_att[p] + dec[k]) + b_full
    alpha     = softmax_p(att)
    awe[k]    = sum_p alpha[k, p] * enc[p]

reading enc (P, E) and enc_att (P, A) exactly once per step and writing
only awe (K, E) and alpha (K, P).  Design notes:

  * the relu tensor never exists beyond one (P, A) slab per (image, lane):
    the K loop is unrolled (K = beam width <= 8), each iteration doing a
    VPU relu+mul+lane-reduce pass — (P, A) transient, ~0.4 MB;
  * the (P, K) att table is tiny, so the softmax is a plain two-pass over
    VMEM (no online/flash accumulation needed);
  * the weighted sum contracts on the MXU as (P, K)^T x (P, E);
  * all arithmetic in fp32 regardless of input dtype (exactness tests
    compare against the XLA path at fp32).

``dec`` is the decoder-side projection ``decoder_att(h) + b`` computed
outside (a (BK, D) x (D, A) MXU matmul XLA fuses with the rest of the
step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

# v5e has 128 MB of VMEM; Pallas' default 16 MB scoped limit capped the
# image tile at G=4.  Raising it lets the G sweep explore larger tiles
# (double-buffered inputs are the dominant term in the budget; the fused
# step kernel needs ~102 MB at G=32).
_VMEM_LIMIT = 114 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=_VMEM_LIMIT)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(G: int, K: int, P_actual: int):
    def kernel(enc_ref, enc_att_ref, dec_ref, wf_ref, awe_ref, alpha_ref):
        # ALL elementwise work (including the lane reduce) runs in the INPUT
        # dtype — bf16 is packed 2x on the VPU, and an f32 accumulator here
        # would upcast the whole (Pp, A) slab (measured 2x slower).  The
        # softmax below runs f32.
        wf = wf_ref[:].astype(enc_att_ref.dtype)           # (1, A)
        for g in range(G):
            ea = enc_att_ref[g]                            # (Pp, A)
            dk = dec_ref[g]                                # (K, A)
            cols = []
            for k in range(K):
                e = jnp.maximum(ea + dk[k:k + 1, :], 0)    # (Pp, A)
                cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
            att = jnp.concatenate(cols, axis=1).astype(jnp.float32)
            Pp = att.shape[0]
            if P_actual < Pp:
                rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                att = jnp.where(rows < P_actual, att, NEG_INF)
            m = jnp.max(att, axis=0, keepdims=True)        # (1, K)
            ex = jnp.exp(att - m)
            s = jnp.sum(ex, axis=0, keepdims=True)
            alpha = ex / s                                 # (Pp, K) f32
            awe = jax.lax.dot_general(
                alpha.astype(enc_ref.dtype), enc_ref[g],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (K, E) MXU
            awe_ref[g] = awe.astype(awe_ref.dtype)
            alpha_ref[g] = alpha.T.astype(alpha_ref.dtype)

    return kernel


def pad_pixels(x, multiple: int = 16):
    """Zero-pad the pixel axis of (..., P, E) to the sublane multiple.

    CALL ONCE PER DECODE on the loop-invariant enc / enc_att (see
    models/decoders.make_beam_step) and hand attend_fused ``p_actual``:
    a device trace showed the pads running INSIDE the beam while_loop cost
    64 ms per 20 steps at B=1024 — 2x the kernel itself.
    """
    P = x.shape[-2]
    Pp = _round_up(max(P, multiple), multiple)
    if Pp == P:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, Pp - P), (0, 0)]
    return jnp.pad(x, widths)


def attend_fused(att_params, enc, enc_att, h, *, p_actual=None,
                 interpret=None, img_tile: int = 0):
    """Drop-in for models.attention.attend on beam-shaped inputs.

    att_params: the attention param dict (encoder_att/decoder_att/full_att)
    enc:     (B, 1, P, E) or (B, P, E) encoder output
    enc_att: (B, 1, P, A) precomputed projection
    h:       (B, K, D) decoder hidden states
    p_actual: number of REAL pixels when enc/enc_att arrive pre-padded via
      :func:`pad_pixels` (the fast path — no per-step pads); None pads here.
    Returns (awe (B, K, E), alpha (B, K, p_actual)).

    img_tile=0 picks the largest image tile whose double-buffered inputs
    stay within ~8 MB of VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    enc3 = enc[:, 0] if enc.ndim == 4 else enc             # (B, Pp?, E)
    enc_att3 = enc_att[:, 0] if enc_att.ndim == 4 else enc_att
    E = enc3.shape[-1]
    A = enc_att3.shape[-1]
    if p_actual is None:
        P = enc3.shape[-2]
        enc3 = pad_pixels(enc3)
        enc_att3 = pad_pixels(enc_att3)
    else:
        P = p_actual
        if enc3.shape[-2] % 16:
            raise ValueError("pre-padded inputs must be 16-aligned; use "
                             "ops.attention_pallas.pad_pixels")
    Pp = enc3.shape[-2]

    if img_tile <= 0:
        # ~9 MB double-buffered input budget -> G=4 at bf16 flagship dims
        # (fastest in the G sweep, tools/profile_decode.py), G=2 at f32
        per_img = Pp * (E + A) * enc3.dtype.itemsize
        img_tile = max(1, (9 << 20) // (2 * per_img))
    G = img_tile
    while B % G:
        G -= 1

    # The attention bias b_full is a scalar added to every att entry — a
    # constant shift that softmax cancels, so it is dropped entirely (the
    # XLA path keeps it; alpha/awe are identical either way).
    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"])               # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32).reshape(1, A)

    kernel = _make_kernel(G, K, P)
    awe, alpha = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Pp, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, Pp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), enc3.dtype),
                   jax.ShapeDtypeStruct((B, K, Pp), enc3.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(enc3, enc_att3, dec.astype(enc3.dtype), wf)
    return awe, alpha[:, :, :P]


# ---------------------------------------------------------------------------
# MXU-contraction variant: the standard-layout kernel above spends its time
# in the per-beam cross-lane reduce `sum(e * wf, axis=1)` (a log-shuffle VPU
# pattern).  Here that contraction runs on the MXU as a (Pp, A) x (A, 1)
# matmul per beam — the relu slab is consumed straight out of registers and
# the VPU only does the add+relu.
# ---------------------------------------------------------------------------

def _make_kernel_mxu(G: int, K: int, P_actual: int):
    def kernel(enc_ref, enc_att_ref, dec_ref, wf_ref, awe_ref, alpha_ref):
        wf = wf_ref[:].astype(enc_att_ref.dtype)           # (A, 1)
        for g in range(G):
            ea = enc_att_ref[g]                            # (Pp, A)
            dk = dec_ref[g]                                # (K, A)
            cols = []
            for k in range(K):
                e = jnp.maximum(ea + dk[k:k + 1, :], 0)    # (Pp, A) VPU
                cols.append(jax.lax.dot_general(
                    e, wf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))   # (Pp, 1) MXU
            att = jnp.concatenate(cols, axis=1)            # (Pp, K) f32
            Pp = att.shape[0]
            if P_actual < Pp:
                rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                att = jnp.where(rows < P_actual, att, NEG_INF)
            m = jnp.max(att, axis=0, keepdims=True)        # (1, K)
            ex = jnp.exp(att - m)
            s = jnp.sum(ex, axis=0, keepdims=True)
            alpha = ex / s                                 # (Pp, K) f32
            awe = jax.lax.dot_general(
                alpha.astype(enc_ref.dtype), enc_ref[g],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (K, E) MXU
            awe_ref[g] = awe.astype(awe_ref.dtype)
            alpha_ref[g] = alpha.T.astype(alpha_ref.dtype)

    return kernel


def attend_fused_mxu(att_params, enc, enc_att, h, *, p_actual=None,
                     interpret=None, img_tile: int = 0):
    """attend_fused with the full_att contraction on the MXU.  Same
    signature/semantics as :func:`attend_fused`."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    enc3 = enc[:, 0] if enc.ndim == 4 else enc
    enc_att3 = enc_att[:, 0] if enc_att.ndim == 4 else enc_att
    E = enc3.shape[-1]
    A = enc_att3.shape[-1]
    if p_actual is None:
        P = enc3.shape[-2]
        enc3 = pad_pixels(enc3)
        enc_att3 = pad_pixels(enc_att3)
    else:
        P = p_actual
        if enc3.shape[-2] % 16:
            raise ValueError("pre-padded inputs must be 16-aligned; use "
                             "ops.attention_pallas.pad_pixels")
    Pp = enc3.shape[-2]

    if img_tile <= 0:
        # the compiler enforces a 16 MB scoped-VMEM limit per kernel; a
        # 9 MB double-buffered input budget -> G=4 at bf16 flagship dims
        # (G=8 overflows: measured "scoped allocation 16.31M > 16.00M")
        per_img = Pp * (E + A) * enc3.dtype.itemsize
        img_tile = max(1, (9 << 20) // (2 * per_img))
    G = img_tile
    while B % G:
        G -= 1

    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"])               # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32)   # (A, 1)

    kernel = _make_kernel_mxu(G, K, P)
    awe, alpha = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Pp, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, Pp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), enc3.dtype),
                   jax.ShapeDtypeStruct((B, K, Pp), enc3.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(enc3, enc_att3, dec.astype(enc3.dtype), wf)
    return awe, alpha[:, :, :P]


# ---------------------------------------------------------------------------
# v3: the per-image profile of the kernels above is dominated by MXU
# bubbles, not FLOPs — 5120 tiny (Pp, A) x (A, 1) score matmuls and 1024
# per-image (Pp, K)^T x (Pp, E) weighted sums per step are each
# weight-load/pipeline-bound at M = K = 5 rows.  v3 keeps the score
# contraction on the VPU (fused add+relu+mul+lane-reduce, no matmul) and
# batches the weighted sum of ``m`` images into ONE block-diagonal
# contraction: alpha_bd (m*Pp, m*K) x enc_group (m*Pp, E) -> (m*K, E).
# The zero blocks contribute exact +0.0 terms in accumulation order, so the
# result is bitwise identical to the per-image dot; the MXU gets m*K dense
# output rows instead of K.  ``with_alpha=False`` additionally skips the
# (Pp, K) -> (K, Pp) per-image transpose relayouts when the beam does not
# record alphas (bench/eval decode paths).
# ---------------------------------------------------------------------------

def _make_kernel_v3(G: int, K: int, P_actual: int, m: int, with_alpha: bool):
    def kernel(enc_ref, enc_att_ref, dec_ref, wf_ref, awe_ref, alpha_ref,
               bd_ref):
        Pp = enc_att_ref.shape[1]
        E = enc_ref.shape[2]
        wf = wf_ref[:].astype(enc_att_ref.dtype)           # (1, A)
        for base in range(0, G, m):
            bd_ref[:] = jnp.zeros_like(bd_ref)
            for j in range(m):
                g = base + j
                ea = enc_att_ref[g]                        # (Pp, A)
                dk = dec_ref[g]                            # (K, A)
                cols = []
                for k in range(K):
                    e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                    cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
                att = jnp.concatenate(cols, axis=1).astype(jnp.float32)
                if P_actual < Pp:
                    rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                    att = jnp.where(rows < P_actual, att, NEG_INF)
                mx = jnp.max(att, axis=0, keepdims=True)   # (1, K)
                ex = jnp.exp(att - mx)
                s = jnp.sum(ex, axis=0, keepdims=True)
                alpha = ex / s                             # (Pp, K) f32
                bd_ref[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                    alpha.astype(bd_ref.dtype)
                if with_alpha:
                    alpha_ref[g] = alpha.T.astype(alpha_ref.dtype)
            enc_grp = enc_ref[base:base + m].reshape(m * Pp, E)
            awe = jax.lax.dot_general(
                bd_ref[:], enc_grp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (m*K, E) MXU
            awe_ref[base:base + m] = awe.reshape(m, K, E).astype(
                awe_ref.dtype)

    return kernel


def attend_fused_v3(att_params, enc, enc_att, h, *, p_actual=None,
                    interpret=None, img_tile: int = 0, group: int = 8,
                    with_alpha: bool = True):
    """Fused attention step, VPU score + block-diagonal grouped awe.

    Same signature/semantics as :func:`attend_fused`, plus:
      group:      images per block-diagonal weighted-sum contraction
      with_alpha: when False the returned alpha is None (saves the
                  per-image (Pp, K) -> (K, Pp) relayout; decode paths that
                  do not record alphas should pass False)
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    enc3 = enc[:, 0] if enc.ndim == 4 else enc
    enc_att3 = enc_att[:, 0] if enc_att.ndim == 4 else enc_att
    E = enc3.shape[-1]
    A = enc_att3.shape[-1]
    if p_actual is None:
        P = enc3.shape[-2]
        enc3 = pad_pixels(enc3)
        enc_att3 = pad_pixels(enc_att3)
    else:
        P = p_actual
        if enc3.shape[-2] % 16:
            raise ValueError("pre-padded inputs must be 16-aligned; use "
                             "ops.attention_pallas.pad_pixels")
    Pp = enc3.shape[-2]

    if img_tile <= 0:
        # 40 MB double-buffered input budget under the raised VMEM limit
        # -> G=32 at bf16 flagship dims (fastest in the sweep)
        per_img = Pp * (E + A) * enc3.dtype.itemsize
        img_tile = max(1, (40 << 20) // (2 * per_img))
    G = img_tile
    while B % G:
        G -= 1
    m = min(group, G)
    while G % m:
        m -= 1

    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"])               # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32).reshape(1, A)

    kernel = _make_kernel_v3(G, K, P, m, with_alpha)
    awe, alpha = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Pp, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, Pp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), enc3.dtype),
                   jax.ShapeDtypeStruct((B, K, Pp), enc3.dtype)),
        scratch_shapes=[pltpu.VMEM((m * Pp, m * K), enc3.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(enc3, enc_att3, dec.astype(enc3.dtype), wf)
    return awe, (alpha[:, :, :P] if with_alpha else None)


# ---------------------------------------------------------------------------
# int8-quantized encoder state: the v3 kernel measured ~89% pure DMA
# (tools/exp_attend_parts.py: 3.02 ms DMA-only vs 3.40 ms full kernel at
# B=1024 bf16) — the decode-time attention step is bound by streaming
# enc (B, Pp, E) + enc_att (B, Pp, A) from HBM every step.  Storing both
# as int8 with per-(image, pixel) symmetric scales halves the bytes.
# Schedule identical to v3; the only additions are (a) a one-pass bf16
# dequant of the enc_att slab and (b) folding the per-pixel enc scale into
# alpha (the contraction ROW dimension), so the weighted-sum MXU operand
# is a pure int8 -> bf16 convert with no scale pass.
#
# This is a lossy SERVING mode (activation quantization, ~0.4% relative
# error per element): scores/awe change slightly, so beam picks can differ
# from the bf16 path in near-ties.  Exactness contract: the kernel matches
# :func:`attend_quant_ref` (the XLA emulation of the same quantized math),
# tested in tests/test_attention_quant.py.
# ---------------------------------------------------------------------------

def quantize_pixels(x, multiple: int = 32):
    """Per-(image, pixel) symmetric int8 quantization of (..., P, d).

    Pads P to `multiple` (the int8 VMEM sublane tile) and returns
    (q int8 (..., Pp, d), scale f32 (..., Pp, 1)) with x ~= q * scale.
    """
    xp = pad_pixels(x, multiple).astype(jnp.float32)
    s = jnp.max(jnp.abs(xp), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-30)
    q = jnp.round(xp / s).astype(jnp.int8)
    return q, s


def attend_quant_ref(att_params, enc_q, enc_s, ea_q, ea_s, h, *,
                     p_actual: int):
    """XLA emulation of :func:`attend_fused_q`'s quantized math — the
    numerics oracle for the kernel (NOT the unquantized attend)."""
    dt = h.dtype
    A = ea_q.shape[-1]
    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"]).astype(dt)    # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32).reshape(A)
    ea_deq = ea_q.astype(dt) * ea_s.astype(dt)             # (B, Pp, A)
    e = jnp.maximum(ea_deq[:, None] + dec[:, :, None, :], 0)
    # match the kernel: products in dt, lane-sum, then f32
    att = jnp.sum(e * wf.astype(dt), axis=-1).astype(jnp.float32)
    Pp = ea_q.shape[-2]
    if p_actual < Pp:
        mask = jnp.arange(Pp) < p_actual
        att = jnp.where(mask[None, None, :], att, NEG_INF)
    mx = jnp.max(att, axis=-1, keepdims=True)
    ex = jnp.exp(att - mx)
    alpha = ex / jnp.sum(ex, axis=-1, keepdims=True)       # (B, K, Pp) f32
    scaled = alpha * enc_s[:, None, :, 0]                  # fold enc scale
    awe = jnp.einsum("bkp,bpe->bke", scaled.astype(dt).astype(jnp.float32),
                     enc_q.astype(dt).astype(jnp.float32)).astype(dt)
    return awe, alpha[:, :, :p_actual].astype(dt)


def _make_kernel_q(G: int, K: int, P_actual: int, m: int, with_alpha: bool):
    def kernel(enc_q_ref, enc_s_ref, ea_q_ref, ea_s_ref, dec_ref, wf_ref,
               awe_ref, alpha_ref, bd_ref):
        Pp = ea_q_ref.shape[1]
        E = enc_q_ref.shape[2]
        dt = awe_ref.dtype
        wf = wf_ref[:].astype(dt)                          # (1, A)
        for base in range(0, G, m):
            bd_ref[:] = jnp.zeros_like(bd_ref)
            for j in range(m):
                g = base + j
                ea = ea_q_ref[g].astype(dt) * ea_s_ref[g].astype(dt)
                dk = dec_ref[g]                            # (K, A)
                cols = []
                for k in range(K):
                    e = jnp.maximum(ea + dk[k:k + 1, :], 0)
                    cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
                att = jnp.concatenate(cols, axis=1).astype(jnp.float32)
                if P_actual < Pp:
                    rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                    att = jnp.where(rows < P_actual, att, NEG_INF)
                mx = jnp.max(att, axis=0, keepdims=True)
                ex = jnp.exp(att - mx)
                s = jnp.sum(ex, axis=0, keepdims=True)
                alpha = ex / s                             # (Pp, K) f32
                bd_ref[j * Pp:(j + 1) * Pp, j * K:(j + 1) * K] = \
                    (alpha * enc_s_ref[g]).astype(bd_ref.dtype)
                if with_alpha:
                    alpha_ref[g] = alpha.T.astype(alpha_ref.dtype)
            enc_grp = enc_q_ref[base:base + m].reshape(m * Pp, E).astype(dt)
            awe = jax.lax.dot_general(
                bd_ref[:], enc_grp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (m*K, E) MXU
            awe_ref[base:base + m] = awe.reshape(m, K, E).astype(dt)

    return kernel


def attend_fused_q(att_params, enc_q, enc_s, ea_q, ea_s, h, *,
                   p_actual: int, interpret=None, img_tile: int = 0,
                   group: int = 8, with_alpha: bool = True):
    """int8-encoder-state fused attention step (serving mode).

    enc_q/ea_q: (B, Pp, E|A) int8 from :func:`quantize_pixels` (Pp is the
    32-aligned padded pixel count); enc_s/ea_s: (B, Pp, 1) f32 scales;
    h: (B, K, D).  Returns (awe (B, K, E) in h.dtype, alpha | None).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    dt = h.dtype
    E = enc_q.shape[-1]
    A = ea_q.shape[-1]
    Pp = enc_q.shape[-2]
    P = p_actual
    if Pp % 32:
        raise ValueError("quantized inputs must be 32-aligned; use "
                         "ops.attention_pallas.quantize_pixels")

    if img_tile <= 0:
        # int8 halves the per-image bytes -> bigger default tile
        per_img = Pp * (E + A) * 1 + Pp * 8
        img_tile = max(1, (40 << 20) // (2 * per_img))
    G = img_tile
    while B % G:
        G -= 1
    m = min(group, G)
    while G % m:
        m -= 1

    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"]).astype(dt)    # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32).reshape(1, A)

    kernel = _make_kernel_q(G, K, P, m, with_alpha)
    awe, alpha = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Pp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Pp, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Pp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, Pp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), dt),
                   jax.ShapeDtypeStruct((B, K, Pp), dt)),
        scratch_shapes=[pltpu.VMEM((m * Pp, m * K), dt)],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(enc_q, enc_s, ea_q, ea_s, dec, wf)
    return awe, (alpha[:, :, :P] if with_alpha else None)


# ---------------------------------------------------------------------------
# Transposed-layout variant: positions on LANES, attention dim on sublanes.
# The per-k reduction over A becomes a SUBLANE reduce (cheaper than the
# cross-lane reduce of the layout above), att/alpha are produced directly
# in their (K, P) output layout, and the weighted sum is a plain
# (K, Pp) x (Pp, E) MXU matmul.
# ---------------------------------------------------------------------------

def _make_kernel_t(G: int, K: int, P_actual: int):
    def kernel(enc_ref, ea_t_ref, dec_t_ref, wf_ref, awe_ref, alpha_ref):
        wf = wf_ref[:].astype(ea_t_ref.dtype)              # (A, 1)
        for g in range(G):
            ea_t = ea_t_ref[g]                             # (A, Pp)
            dec_t = dec_t_ref[g]                           # (A, K)
            rows = []
            for k in range(K):
                e = jnp.maximum(ea_t + dec_t[:, k:k + 1], 0)   # (A, Pp)
                rows.append(jnp.sum(e * wf, axis=0, keepdims=True,
                                    dtype=jnp.float32))    # (1, Pp)
            att = jnp.concatenate(rows, axis=0)            # (K, Pp) f32
            Pp = att.shape[1]
            if P_actual < Pp:
                cols = jax.lax.broadcasted_iota(jnp.int32, (K, Pp), 1)
                att = jnp.where(cols < P_actual, att, NEG_INF)
            m = jnp.max(att, axis=1, keepdims=True)        # (K, 1)
            ex = jnp.exp(att - m)
            s = jnp.sum(ex, axis=1, keepdims=True)
            alpha = ex / s                                 # (K, Pp) f32
            awe = jnp.dot(alpha.astype(enc_ref.dtype), enc_ref[g],
                          preferred_element_type=jnp.float32)  # (K, E)
            awe_ref[g] = awe.astype(awe_ref.dtype)
            alpha_ref[g] = alpha.astype(alpha_ref.dtype)

    return kernel


def precompute_transposed(att_params, enc_flat):
    """Loop-invariant (B, A, P) encoder projection for attend_fused_t —
    computed ONCE per decode outside the step (models/decoders.py)."""
    from ..models import attention as attn
    return jnp.swapaxes(attn.precompute(att_params, enc_flat), -1, -2)


def attend_fused_t(att_params, enc, enc_att_t, h, *, interpret=None,
                   img_tile: int = 0):
    """Transposed-layout fused attention step.

    enc:       (B, 1, P, E) or (B, P, E) encoder output
    enc_att_t: (B, A, P) from :func:`precompute_transposed`
    h:         (B, K, D)
    Returns (awe (B, K, E), alpha (B, K, P)).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    enc3 = enc[:, 0] if enc.ndim == 4 else enc             # (B, P, E)
    P, E = enc3.shape[-2:]
    A = enc_att_t.shape[-2]
    Pp = _round_up(max(P, 128), 128)                       # lane-align

    if img_tile <= 0:
        per_img = Pp * (E + A) * enc3.dtype.itemsize
        img_tile = max(1, (8 << 20) // (2 * per_img))
    G = img_tile
    while B % G:
        G -= 1

    dec_t = jnp.swapaxes(
        h @ att_params["decoder_att"]["w"]
        + att_params["decoder_att"]["b"], -1, -2)          # (B, A, K)
    wf = att_params["full_att"]["w"].astype(jnp.float32)   # (A, 1)

    if Pp != P:
        enc3 = jnp.pad(enc3, ((0, 0), (0, Pp - P), (0, 0)))
        enc_att_t = jnp.pad(enc_att_t, ((0, 0), (0, 0), (0, Pp - P)))

    kernel = _make_kernel_t(G, K, P)
    awe, alpha = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Pp, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A, Pp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, A, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, Pp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), enc3.dtype),
                   jax.ShapeDtypeStruct((B, K, Pp), enc3.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(enc3, enc_att_t.astype(enc3.dtype), dec_t.astype(enc3.dtype), wf)
    return awe, alpha[:, :, :P]
