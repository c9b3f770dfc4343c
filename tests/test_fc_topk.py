"""Fused fc+topk kernel vs the XLA reference computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.ops.fc_topk_pallas import fc_topk


@pytest.mark.parametrize("R,D,V,k", [
    (7, 16, 40, 5),       # odd rows, V not tile-multiple
    (16, 32, 100, 3),
    (8, 8, 513, 5),       # crosses a vocab tile boundary (v_tile=512)
])
def test_fc_topk_matches_xla(rng, R, D, V, k):
    h = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V)), jnp.float32) * 0.3
    b = jnp.asarray(rng.normal(size=(V,)), jnp.float32)

    logits = h @ w + b
    ref_v, ref_i = jax.lax.top_k(logits, k)
    ref_lse = jax.scipy.special.logsumexp(logits, axis=1)

    tv, ti, lse = fc_topk(h, w, b, k, interpret=True)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(ref_v), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=1e-5, atol=1e-5)


def test_fc_topk_tie_order(rng):
    """Equal logits: first-occurrence (lowest index) wins, like lax.top_k."""
    R, D = 8, 4
    h = jnp.zeros((R, D))
    w = jnp.zeros((D, 20))
    b = jnp.zeros((20,))  # all logits equal
    tv, ti, lse = fc_topk(h, w, b, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(ti),
                                  np.tile(np.arange(4), (R, 1)))


def test_fc_topk_multiple_row_tiles(rng):
    R, D, V, k = 24, 16, 60, 5
    h = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V)), jnp.float32)
    b = jnp.zeros((V,))
    tv, ti, _ = fc_topk(h, w, b, k, interpret=True, r_tile=8)
    ref_v, ref_i = jax.lax.top_k(h @ w + b, k)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(ref_v), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ref_i))
