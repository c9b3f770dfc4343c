"""Additive (Bahdanau-style) soft attention over image positions.

Parity: reference models/attention.py:6-44 —
    att   = full_att(relu(enc_att(enc) + dec_att(h)[:, None, :]))
    alpha = softmax(att over positions)
    awe   = sum_p alpha_p * enc_p

TPU-first twist: ``enc_att(enc)`` is loop-invariant across decode steps (the
image encoding never changes), so it is hoisted via :func:`precompute` and
passed into every step — removing a (B, 196, 2048) x (2048, 512) matmul from
the hot loop.  The remaining per-step work is one (B, D)x(D, A) matmul, a
(B, P, A)->(B, P) contraction and the weighted sum, all fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import init_linear, linear


def init_attention(key, encoder_dim: int, decoder_dim: int,
                   attention_dim: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder_att": init_linear(k1, encoder_dim, attention_dim, dtype),
        "decoder_att": init_linear(k2, decoder_dim, attention_dim, dtype),
        "full_att": init_linear(k3, attention_dim, 1, dtype),
    }


def precompute(params, enc):
    """Loop-invariant encoder projection: (..., P, E) -> (..., P, A)."""
    return linear(params["encoder_att"], enc)


def attend_pk(params, enc, enc_att, h):
    """:func:`attend` with the relu pre-activation laid out (B, P, K, A)
    instead of (B, K, P, A), so a fused consumer iterates beams innermost
    and re-reads each enc_att row from registers rather than HBM.  Same
    math; reduction orders (and hence low bits) can differ from attend.

    enc/enc_att: (B, 1, P, ·) or (B, P, ·);  h: (B, K, D).
    Returns (awe (B, K, E), alpha (B, K, P)).
    """
    enc3 = enc[:, 0] if enc.ndim == 4 else enc                # (B, P, E)
    ea3 = enc_att[:, 0] if enc_att.ndim == 4 else enc_att     # (B, P, A)
    dec = linear(params["decoder_att"], h)                    # (B, K, A)
    e = jax.nn.relu(ea3[:, :, None, :] + dec[:, None, :, :])  # (B, P, K, A)
    att = jnp.squeeze(linear(params["full_att"], e), -1)      # (B, P, K)
    alpha = jax.nn.softmax(att, axis=1)
    awe = jnp.einsum("bpk,bpe->bke", alpha, enc3)
    return awe, jnp.swapaxes(alpha, 1, 2)


def attend(params, enc, enc_att, h):
    """One attention step.

    enc:     (..., P, E) encoder output
    enc_att: (..., P, A) from :func:`precompute`
    h:       (..., D)    decoder hidden state
    Returns (awe (..., E), alpha (..., P)).
    """
    dec = linear(params["decoder_att"], h)                    # (..., A)
    e = jax.nn.relu(enc_att + dec[..., None, :])              # (..., P, A)
    att = jnp.squeeze(linear(params["full_att"], e), -1)      # (..., P)
    alpha = jax.nn.softmax(att, axis=-1)
    awe = jnp.einsum("...pe,...p->...e", enc, alpha)
    return awe, alpha
