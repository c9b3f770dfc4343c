"""Pallas embedding-gradient scatter-accumulate (ops/embed_grad_pallas.py)
vs a host scatter-add, and its wiring into embed_lookup's backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.ops.embed_grad_pallas import (
    embed_grad_scatter, feasible)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n,v,e,chunk", [(50, 37, 16, 16), (128, 40, 8, 64)])
def test_scatter_matches_host(dtype, n, v, e, chunk):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, v, (n,)).astype(np.int32)
    g = rng.standard_normal((n, e)).astype(np.float32)
    out = embed_grad_scatter(jnp.asarray(ids), jnp.asarray(g, dtype),
                             vocab=v, chunk=chunk, interpret=True)
    expect = np.zeros((v, e), np.float32)
    np.add.at(expect, ids, np.asarray(jnp.asarray(g, dtype),
                                      np.float32))
    assert out.shape == (v, e) and out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), expect,
                               rtol=1e-5, atol=1e-5)


def test_duplicate_heavy_ids():
    """All tokens hit two rows — the accumulate chain must not lose
    updates (the failure mode of a vectorised scatter)."""
    rng = np.random.default_rng(1)
    n, v, e = 200, 10, 8
    ids = (np.arange(n) % 2).astype(np.int32) * 7
    g = rng.standard_normal((n, e)).astype(np.float32)
    out = embed_grad_scatter(jnp.asarray(ids), jnp.asarray(g), vocab=v,
                             chunk=64, interpret=True)
    expect = np.zeros((v, e), np.float32)
    np.add.at(expect, ids, g)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                               atol=1e-5)


def test_feasible_budget():
    assert feasible(52224, 6763, 512, 2)
    assert feasible(52224, 38732, 512, 2)
    assert not feasible(52224, 200_000, 512, 2)


def test_embed_lookup_kernel_backward_wiring():
    """embed_lookup_kernel (decoders) must produce the same gradient as
    the default one-hot-contraction embed_lookup."""
    from indonesian_image_captioning_tpu.models.decoders import (
        embed_lookup, embed_lookup_kernel)

    rng = np.random.default_rng(2)
    V, E, B, T = 53, 8, 4, 6
    table = jnp.asarray(rng.standard_normal((V, E)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)

    d0 = jax.grad(lambda t: (embed_lookup(t, ids) * g).sum())(table)
    d1 = jax.grad(lambda t: (
        embed_lookup_kernel(t, ids, interpret=True) * g).sum())(table)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-5, atol=1e-6)
