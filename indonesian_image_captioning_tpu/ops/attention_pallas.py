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

Measured (v5e, beam 5): B=256 XLA 86 ms/batch vs kernel 119 ms; B=1024
with 4-image grid tiles XLA 300 ms vs kernel 390 ms — the VPU reduction
over A inside the kernel costs more than the avoided HBM intermediate
saves (XLA keeps the contraction on the MXU), so the XLA path remains the
default (``ModelConfig.fused_attention=False``).  The kernel is exact and
remains the base for an MXU-contraction variant.

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
    """A tile of images: enc (G,P,E), enc_att (G,P,A), dec (G,K,A),
    wf (A,1), bf (1,1) -> awe (G,K,E), alpha (G,K,P)."""
    enc_att = enc_att_ref[:]                       # (G, P, A)
    dec = dec_ref[:]                               # (G, K, A)
    e = jax.nn.relu(enc_att[:, None, :, :] + dec[:, :, None, :])  # (G,K,P,A)
    G, K, P, A = e.shape
    # VPU reduction over A (a (GKP, A) x (A, 1) matvec wastes 127/128 MXU
    # columns)
    wf = wf_ref[:].reshape(1, 1, 1, A)
    att = jnp.sum(e.astype(jnp.float32) * wf, axis=-1) + bf_ref[0, 0]
    alpha = jax.nn.softmax(att, axis=-1)           # (G, K, P) fp32
    awe = jnp.einsum("gkp,gpe->gke", alpha,
                     enc_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)      # (G, K, E)
    awe_ref[:] = awe.astype(awe_ref.dtype)
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)


def attend_fused(att_params, enc, enc_att, h, *, interpret=None,
                 img_tile: int = 4):
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
    G = img_tile
    while B % G:
        G //= 2
    G = max(G, 1)
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
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, P, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, P, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, K, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, K, E), enc3.dtype),
                   jax.ShapeDtypeStruct((B, K, P), enc3.dtype)),
        interpret=interpret,
    )(enc3, enc_att3, dec.astype(enc3.dtype), wf, bf)
    return awe, alpha
