"""Pallas TPU kernel: fused additive (Bahdanau) attention step.

The decode-time hot spot (reference models/attention.py:6-44 runs this per
beam step; models/decoders/attention_scn.py:217-290): XLA materialises the
(B, K, P, A) relu pre-activation in HBM — at bench dims (B=1024, K=5,
P=196, A=512, bf16) that is ~1 GB written + re-read EVERY decode step, plus
a second full read of the (B, P, E) encoder output for the weighted sum.

This kernel computes the whole attention step per image tile in VMEM:

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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(G: int, K: int, P_actual: int):
    def kernel(enc_ref, enc_att_ref, dec_ref, wf_ref, awe_ref, alpha_ref):
        wf = wf_ref[:]                                     # (1, A) f32
        for g in range(G):
            ea = enc_att_ref[g].astype(jnp.float32)        # (Pp, A)
            dk = dec_ref[g].astype(jnp.float32)            # (K, A)
            cols = []
            for k in range(K):
                e = jnp.maximum(ea + dk[k:k + 1, :], 0.0)  # (Pp, A)
                cols.append(jnp.sum(e * wf, axis=1, keepdims=True))
            att = jnp.concatenate(cols, axis=1)            # (Pp, K)
            Pp = att.shape[0]
            if P_actual < Pp:
                rows = jax.lax.broadcasted_iota(jnp.int32, (Pp, K), 0)
                att = jnp.where(rows < P_actual, att, NEG_INF)
            m = jnp.max(att, axis=0, keepdims=True)        # (1, K)
            ex = jnp.exp(att - m)
            s = jnp.sum(ex, axis=0, keepdims=True)
            alpha = ex / s                                 # (Pp, K) f32
            enc_g = enc_ref[g].astype(jnp.float32)         # (Pp, E)
            awe = jax.lax.dot_general(
                alpha, enc_g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (K, E) MXU
            awe_ref[g] = awe.astype(awe_ref.dtype)
            alpha_ref[g] = alpha.T.astype(alpha_ref.dtype)

    return kernel


def attend_fused(att_params, enc, enc_att, h, *, interpret=None,
                 img_tile: int = 0):
    """Drop-in for models.attention.attend on beam-shaped inputs.

    att_params: the attention param dict (encoder_att/decoder_att/full_att)
    enc:     (B, 1, P, E) or (B, K, P, E) encoder output
    enc_att: (B, 1, P, A) precomputed projection
    h:       (B, K, D) decoder hidden states
    Returns (awe (B, K, E), alpha (B, K, P)).

    img_tile=0 picks the largest image tile whose double-buffered inputs
    stay within ~8 MB of VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    enc3 = enc[:, 0] if enc.ndim == 4 else enc             # (B, P, E)
    enc_att3 = enc_att[:, 0] if enc_att.ndim == 4 else enc_att
    P, E = enc3.shape[-2:]
    A = enc_att3.shape[-1]
    Pp = _round_up(max(P, 16), 16)                         # sublane-align

    if img_tile <= 0:
        per_img = Pp * (E + A) * enc3.dtype.itemsize
        img_tile = max(1, (8 << 20) // (2 * per_img))
    G = img_tile
    while B % G:
        G -= 1

    # The attention bias b_full is a scalar added to every att entry — a
    # constant shift that softmax cancels, so it is dropped entirely (the
    # XLA path keeps it; alpha/awe are identical either way).
    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"])               # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32).reshape(1, A)

    if Pp != P:
        pad = ((0, 0), (0, Pp - P), (0, 0))
        enc3 = jnp.pad(enc3, pad)
        enc_att3 = jnp.pad(enc_att3, pad)

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
    )(enc3, enc_att3, dec.astype(enc3.dtype), wf)
    return awe, alpha[:, :, :P]
