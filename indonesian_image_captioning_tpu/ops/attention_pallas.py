"""Pallas TPU kernel: fused additive (Bahdanau) attention step.

Decode-time profile (bench ablation, B=256, beam 5): the additive attention
step is the dominant decode cost — XLA materialises the (B, K, P, A) relu
pre-activation tensor in HBM.  This kernel computes, per image, the whole
attention step in VMEM:

    e[k, p]  = w_full . relu(enc_att[p] + dec[k]) + b_full
    alpha    = softmax_p(e)
    awe[k]   = sum_p alpha[k, p] * enc[p]

reading enc (P, E) and enc_att (P, A) exactly once per step and writing
only awe (K, E) and alpha (K, P).  At P=196, A=512, K=5 everything fits
comfortably (<2 MB per program, one grid program per image).

Measured (v5e, B=256, beam 5): XLA 86 ms/batch vs this kernel 119 ms —
the per-image grid (256 programs x 51 steps) costs more in program
overhead than the avoided HBM intermediate saves at these shapes, so the
XLA path remains the default (``ModelConfig.fused_attention=False``).
The kernel stays as the scaling path: per-program cost is flat in P, so
larger feature maps / beam widths shift the balance toward it.

``dec`` is the decoder-side projection ``decoder_att(h)`` computed outside
(a tiny (BK, D)x(D, A) matmul that XLA fuses with the rest of the step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(enc_ref, enc_att_ref, dec_ref, wf_ref, bf_ref,
                      awe_ref, alpha_ref):
    """One image: enc (1,P,E), enc_att (1,P,A), dec (1,K,A), wf (A,1),
    bf (1,1) -> awe (1,K,E), alpha (1,K,P)."""
    enc_att = enc_att_ref[0]                       # (P, A)
    dec = dec_ref[0]                               # (K, A)
    e = jax.nn.relu(enc_att[None, :, :] + dec[:, None, :])   # (K, P, A)
    K, P, A = e.shape
    # VPU reduction over A (a (KP, A) x (A, 1) matvec wastes 127/128 MXU
    # columns)
    wf = wf_ref[:].reshape(1, 1, A)
    att = jnp.sum(e.astype(jnp.float32) * wf, axis=-1) + bf_ref[0, 0]
    alpha = jax.nn.softmax(att, axis=-1)           # (K, P) fp32
    awe = jnp.dot(alpha, enc_ref[0].astype(jnp.float32),
                  preferred_element_type=jnp.float32)        # (K, E)
    awe_ref[0] = awe.astype(awe_ref.dtype)
    alpha_ref[0] = alpha.astype(alpha_ref.dtype)


def attend_fused(att_params, enc, enc_att, h, *, interpret=None):
    """Drop-in for models.attention.attend on beam-shaped inputs.

    att_params: the attention param dict (encoder_att/decoder_att/full_att)
    enc:     (B, 1, P, E) or (B, K, P, E) encoder output
    enc_att: (B, 1, P, A) precomputed projection
    h:       (B, K, D) decoder hidden states
    Returns (awe (B, K, E), alpha (B, K, P)).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, K, _ = h.shape
    enc3 = enc[:, 0] if enc.ndim == 4 else enc     # (B, P, E)
    enc_att3 = enc_att[:, 0] if enc_att.ndim == 4 else enc_att
    P, E = enc3.shape[-2:]
    A = enc_att3.shape[-1]

    dec = (h @ att_params["decoder_att"]["w"]
           + att_params["decoder_att"]["b"])       # (B, K, A)
    wf = att_params["full_att"]["w"].astype(jnp.float32)     # (A, 1)
    bf = att_params["full_att"]["b"].reshape(1, 1).astype(jnp.float32)

    awe, alpha = pl.pallas_call(
        _attention_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), enc3.dtype),
                   jax.ShapeDtypeStruct((B, K, P), enc3.dtype)),
        interpret=interpret,
    )(enc3, enc_att3, dec.astype(enc3.dtype), wf, bf)
    return awe, alpha
