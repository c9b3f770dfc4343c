"""Plain LSTM cell (torch ``nn.LSTMCell``-compatible semantics).

Used by the pure_attention decoder (reference models/decoders/
pure_attention.py:40 uses ``nn.LSTMCell(embed+2048, 512)``).  Gate order in
the fused weights follows torch: (i, f, g, o) with g = cell candidate —
NOTE this differs from the SCN cell's (i, f, o, c) order.

Canonical layout keeps the fused (in, 4H) weights so the step is two MXU
matmuls; torch stores (4H, in) so converters transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import uniform


def init_lstm_cell(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """torch nn.LSTMCell default: all params uniform(+-1/sqrt(hidden))."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / (hidden_size ** 0.5)
    return {
        "w_ih": uniform(ks[0], (input_size, 4 * hidden_size), bound, dtype),
        "w_hh": uniform(ks[1], (hidden_size, 4 * hidden_size), bound, dtype),
        "b_ih": uniform(ks[2], (4 * hidden_size,), bound, dtype),
        "b_hh": uniform(ks[3], (4 * hidden_size,), bound, dtype),
    }


def lstm_step(params, x, h, c):
    """One LSTM step: x (..., In), h/c (..., H) -> (h_next, c_next)."""
    hidden = h.shape[-1]
    pre = (x @ params["w_ih"] + params["b_ih"]
           + h @ params["w_hh"] + params["b_hh"])
    i, f, g, o = (pre[..., k * hidden:(k + 1) * hidden] for k in range(4))
    c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
    return h_next, c_next


def from_torch_layout(weight_ih, weight_hh, bias_ih, bias_hh):
    """torch LSTMCell stores weight_ih (4H, In); transpose into (In, 4H)."""
    return {
        "w_ih": jnp.asarray(weight_ih).T,
        "w_hh": jnp.asarray(weight_hh).T,
        "b_ih": jnp.asarray(bias_ih),
        "b_hh": jnp.asarray(bias_hh),
    }


def to_torch_layout(params):
    return {
        "weight_ih": params["w_ih"].T,
        "weight_hh": params["w_hh"].T,
        "bias_ih": params["b_ih"],
        "bias_hh": params["b_hh"],
    }
