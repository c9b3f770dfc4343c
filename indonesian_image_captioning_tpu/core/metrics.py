"""Metrics: running meters and jitted accuracy functions.

Parity targets: reference utils/metric.py (AverageMeter :4-22, top-k accuracy
:25-39, binary_accuracy :42-47).  The accuracy functions here are pure JAX so
they fuse into the jitted train/eval steps instead of running on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class AverageMeter:
    """Keeps most recent value, running average, sum and count.

    Host-side utility with the same interface as the reference AverageMeter
    (utils/metric.py:4-22), used for console progress lines.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def topk_accuracy(scores: jax.Array, targets: jax.Array, k: int,
                  mask: jax.Array | None = None) -> jax.Array:
    """Top-k accuracy in percent.

    scores: (N, vocab) logits; targets: (N,) int ids; mask: optional (N,)
    validity mask (1 = count this token).  With mask=None this matches the
    reference utils/metric.py:25-39 exactly; the mask generalises it to the
    fixed-shape masked-scan training path where padded steps must not count.
    """
    _, ind = jax.lax.top_k(scores, k)                      # (N, k)
    correct = (ind == targets[:, None]).any(axis=1)        # (N,)
    if mask is None:
        return jnp.mean(correct.astype(jnp.float32)) * 100.0
    mask = mask.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (correct.astype(jnp.float32) * mask).sum() / denom * 100.0


def binary_accuracy(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean agreement of thresholded scores vs thresholded targets, percent.

    Parity: reference utils/metric.py:42-47 (both sides thresholded at 0.5).
    """
    pred = scores >= 0.5
    true = targets >= 0.5
    return jnp.mean((pred == true).astype(jnp.float32)) * 100.0
