"""Adaptive average pooling as two matmuls (TPU-friendly).

torch's ``AdaptiveAvgPool2d((o, o))`` maps input bin i to
``[floor(i*n/o), ceil((i+1)*n/o))`` and averages.  The reference encoder
pools the ResNet-152 8x8 feature map UP to 14x14 with overlapping windows
(models/encoders/caption.py:25-26; SURVEY.md §7 "hard parts").  Gather-based
pooling is scalar-unfriendly on TPU; instead we precompute a dense (out, in)
averaging matrix per axis and contract:

    y[b, i, j, c] = sum_{h,w} P[i, h] * P[j, w] * x[b, h, w, c]

— two small matmuls the MXU eats for free, exact to torch semantics.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) row-stochastic averaging matrix."""
    P = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = math.ceil((i + 1) * n_in / n_out)
        P[i, start:end] = 1.0 / (end - start)
    return P


def adaptive_avg_pool2d(x, out_hw):
    """x: (..., H, W, C) NHWC -> (..., out_h, out_w, C), torch-exact."""
    out_h, out_w = out_hw
    H, W = x.shape[-3], x.shape[-2]
    Ph = jnp.asarray(_pool_matrix(H, out_h))
    Pw = jnp.asarray(_pool_matrix(W, out_w))
    y = jnp.einsum("...hwc,oh->...owc", x, Ph)
    return jnp.einsum("...owc,pw->...opc", y, Pw)
