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
