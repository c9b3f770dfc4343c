"""Shared parameter initialisers and tiny layer primitives.

Parameters are plain nested dicts of jnp arrays (pytrees) — no module
framework.  Initialisation reproduces torch defaults so that converted
reference checkpoints and fresh runs share a distribution family:
``nn.Linear`` initialises weight and bias uniform(-1/sqrt(fan_in),
+1/sqrt(fan_in)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch nn.Linear default init; weight stored (in, out) for x @ w."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    return {
        "w": uniform(kw, (in_dim, out_dim), bound, dtype),
        "b": uniform(kb, (out_dim,), bound, dtype),
    }


def linear(p, x):
    return x @ p["w"] + p["b"]


def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout (matches torch semantics: scale by 1/(1-rate))."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def linear_from_torch(weight, bias):
    """torch Linear stores weight (out, in); convert to (in, out)."""
    return {"w": jnp.asarray(weight).T, "b": jnp.asarray(bias)}
