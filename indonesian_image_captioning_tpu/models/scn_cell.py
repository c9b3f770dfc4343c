"""Semantic Compositional Network cell — the core novel op, TPU-first.

The SCN cell (Gan et al., "Semantic Compositional Networks for Visual
Captioning") is a factored LSTM whose input and recurrent paths are each
rank-factorised and modulated elementwise by a semantic tag vector, per gate
g in {i, f, o, c}:

    x_g      = ((x @ ia_g) * (s @ ib_g)) @ ic_g^T + b_ig
    preact_g = ((h @ ha_g) * (s @ hb_g)) @ hc_g^T + x_g + b_hg

Reference semantics: /root/reference/models/scn_cell.py:52-154, which issues
24 small (B, 512)-ish matmuls per token per step — the prime fusion target
identified in SURVEY.md §3.5.

TPU-native redesign (same math, different schedule):

  * The four per-gate projections of each path are ONE matmul against the
    fused (dim, 4*factor) weight, then a (B, 4, F) reshape — MXU-sized
    instead of four skinny matmuls.
  * The semantic projections ``s @ Wib`` and ``s @ Whb`` are loop
    invariants (tags are constant over a caption) — they are hoisted out of
    the scan/while_loop entirely via :func:`semantic_projections` and
    computed once per sequence, eliminating 8 of the reference's 24
    per-step matmuls.
  * The per-gate output projections ic_g^T / hc_g^T become a single
    batched-gate einsum ``(B,4,F) x (4,F,H) -> (B,4,H)`` which XLA tiles
    onto the MXU as 4 parallel matmuls with shared input staging.
  * For teacher-forced training the input path ``x @ Wia`` of the WHOLE
    sequence is computed in one (B*T, In) matmul before the scan
    (:func:`input_factor` maps over arbitrary leading dims).

An equivalent fused Pallas kernel lives in ops/scn_pallas.py; this module is
the XLA-lowered baseline and the numerics oracle.

Canonical parameter layout (converters to/from the reference torch layout at
the bottom; gate order i, f, o, c as in the reference):

    w_x  : (input,    4*factor)   <- torch weight_ia
    w_xs : (semantic, 4*factor)   <- torch weight_ib
    w_xp : (4, factor, hidden)    <- torch weight_ic (hidden, 4*factor)
    w_h  : (hidden,   4*factor)   <- torch weight_ha
    w_hs : (semantic, 4*factor)   <- torch weight_hb
    w_hp : (4, factor, hidden)    <- torch weight_hc
    b_x  : (4, hidden)            <- torch bias_ih (4*hidden)
    b_h  : (4, hidden)            <- torch bias_hh (4*hidden)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import uniform


def init_scn_cell(key, input_size: int, hidden_size: int, semantic_size: int,
                  factor_size: int, dtype=jnp.float32):
    """Uniform(-1/sqrt(hidden), +1/sqrt(hidden)) for every parameter,
    matching reference reset_parameters (models/scn_cell.py:156-159)."""
    ks = jax.random.split(key, 8)
    bound = 1.0 / (hidden_size ** 0.5)
    f4 = 4 * factor_size
    return {
        "w_x": uniform(ks[0], (input_size, f4), bound, dtype),
        "w_xs": uniform(ks[1], (semantic_size, f4), bound, dtype),
        "w_xp": uniform(ks[2], (4, factor_size, hidden_size), bound, dtype),
        "w_h": uniform(ks[3], (hidden_size, f4), bound, dtype),
        "w_hs": uniform(ks[4], (semantic_size, f4), bound, dtype),
        "w_hp": uniform(ks[5], (4, factor_size, hidden_size), bound, dtype),
        "b_x": uniform(ks[6], (4, hidden_size), bound, dtype),
        "b_h": uniform(ks[7], (4, hidden_size), bound, dtype),
    }


def _factor(x, w):
    """(..., D) @ (D, 4F) -> (..., 4, F)."""
    y = x @ w
    return y.reshape(*y.shape[:-1], 4, w.shape[-1] // 4)


def semantic_projections(params, sem):
    """Hoistable tag projections: (..., S) -> ((..., 4, F), (..., 4, F)).

    Loop-invariant over decode steps; compute ONCE per sequence and pass the
    result to every :func:`scn_step` call.
    """
    return _factor(sem, params["w_xs"]), _factor(sem, params["w_hs"])


def input_factor(params, x):
    """Input-path factor projection: (..., In) -> (..., 4, F).

    For teacher forcing call this on the full (B, T, In) embedding tensor
    before the scan — one big MXU matmul instead of T small ones.
    """
    return _factor(x, params["w_x"])


def scn_step(params, x_fac, sem_x, sem_h, h, c):
    """One SCN recurrence given precomputed factors.

    x_fac:        (..., 4, F)  input-path factor  (input_factor)
    sem_x, sem_h: (..., 4, F)  semantic factors   (semantic_projections)
    h, c:         (..., H)     previous hidden / cell state
    Returns (h_next, c_next).
    """
    acc = jnp.float32
    # Input path: ((x@ia_g) * (s@ib_g)) @ ic_g^T + b_ig — all four gates at once.
    xg = jnp.einsum("...gf,gfh->...gh", x_fac * sem_x, params["w_xp"],
                    preferred_element_type=acc) + params["b_x"]
    # Recurrent path.
    h_fac = _factor(h, params["w_h"]) * sem_h
    hg = jnp.einsum("...gf,gfh->...gh", h_fac, params["w_hp"],
                    preferred_element_type=acc) + params["b_h"]
    pre = (xg + hg).astype(h.dtype)
    i = jax.nn.sigmoid(pre[..., 0, :])
    f = jax.nn.sigmoid(pre[..., 1, :])
    o = jax.nn.sigmoid(pre[..., 2, :])
    g = jnp.tanh(pre[..., 3, :])
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def scn_cell_apply(params, x, sem, h, c):
    """Convenience single-step API mirroring the reference forward()
    (models/scn_cell.py:52-110): no precomputation, direct (x, s, h, c)."""
    sem_x, sem_h = semantic_projections(params, sem)
    return scn_step(params, input_factor(params, x), sem_x, sem_h, h, c)


# ---------------------------------------------------------------------------
# Reference (torch) layout converters — for checkpoint interop and oracles.
# ---------------------------------------------------------------------------

def from_torch_layout(weight_ia, weight_ib, weight_ic, weight_ha, weight_hb,
                      weight_hc, bias_ih, bias_hh):
    """Convert reference SCNCell tensors (models/scn_cell.py:29-45) to the
    canonical layout.  Accepts numpy/jnp arrays (already detached)."""
    def proj(w):  # (H, 4F) -> (4, F, H)
        w = jnp.asarray(w)
        hidden = w.shape[0]
        return w.reshape(hidden, 4, -1).transpose(1, 2, 0)

    def bias(b):  # (4H,) -> (4, H)
        return jnp.asarray(b).reshape(4, -1)

    return {
        "w_x": jnp.asarray(weight_ia),
        "w_xs": jnp.asarray(weight_ib),
        "w_xp": proj(weight_ic),
        "w_h": jnp.asarray(weight_ha),
        "w_hs": jnp.asarray(weight_hb),
        "w_hp": proj(weight_hc),
        "b_x": bias(bias_ih),
        "b_h": bias(bias_hh),
    }


def to_torch_layout(params):
    """Inverse of :func:`from_torch_layout` (for exporting checkpoints)."""
    def proj(w):  # (4, F, H) -> (H, 4F)
        g, f, h = w.shape
        return w.transpose(2, 0, 1).reshape(h, g * f)

    return {
        "weight_ia": params["w_x"],
        "weight_ib": params["w_xs"],
        "weight_ic": proj(params["w_xp"]),
        "weight_ha": params["w_h"],
        "weight_hb": params["w_hs"],
        "weight_hc": proj(params["w_hp"]),
        "bias_ih": params["b_x"].reshape(-1),
        "bias_hh": params["b_h"].reshape(-1),
    }
