"""PRNG discipline.

All randomness flows from a single root ``jax.random.key``; named streams are
derived with ``fold_in`` so adding a consumer never perturbs other streams.
The reference's only seeding is ``random.seed(123)`` in preprocessing
(utils/dataset.py:326) — training randomness (dropout, shuffling, init) was
unseeded there; here it is fully deterministic.
"""

from __future__ import annotations

import hashlib

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def _tag(name: str) -> int:
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")


def stream(key: jax.Array, name: str) -> jax.Array:
    """A named substream, stable across program changes."""
    return jax.random.fold_in(key, _tag(name))


def per_step(key: jax.Array, step) -> jax.Array:
    """Per-train-step key (step may be a traced int)."""
    return jax.random.fold_in(key, step)
