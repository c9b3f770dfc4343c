"""Exactness of the fast per-row top-k backends vs jax.lax.top_k.

The beam's sparse vocab head replaces lax.top_k's sort-style lowering with
these (ops/topk_pallas.py); bit-for-beam parity (tests/test_beam.py,
tests/test_reference_parity.py) requires value AND tie-order equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.ops.topk_pallas import (
    row_topk_iterative, row_topk_pallas)

BACKENDS = {
    "pallas": lambda x, k: row_topk_pallas(x, k),
    "pallas_smalltile": lambda x, k: row_topk_pallas(
        x, k, r_tile=8, v_tile=128),
    "iterative": row_topk_iterative,
}


def _check(x, k):
    ref_v, ref_i = jax.lax.top_k(x, k)
    for name, fn in BACKENDS.items():
        v, i = fn(x, k)
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(ref_v), err_msg=f"{name} values")
        np.testing.assert_array_equal(
            np.asarray(i), np.asarray(ref_i), err_msg=f"{name} indices")


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("shape,k", [((7, 300), 5), ((16, 1031), 3),
                                     ((3, 130), 1), ((40, 257), 8)])
def test_matches_lax_topk(shape, k, dtype):
    x = jax.random.normal(jax.random.key(0), shape, jnp.dtype(dtype))
    _check(x, k)


def test_tie_order_matches_lax_topk():
    # heavy ties straddling tile boundaries: only 4 distinct values over
    # V=520 columns -> winners decided purely by first-occurrence order
    key = jax.random.key(1)
    vals = jnp.asarray([0.5, 1.0, 2.0, 3.0], jnp.float32)
    x = vals[jax.random.randint(key, (9, 520), 0, 4)]
    _check(x, 6)


def test_all_equal_rows():
    x = jnp.ones((5, 260), jnp.float32)
    _check(x, 4)


def test_logprob_range_and_unpadded_rows():
    # realistic vocab-head inputs: log-softmax rows, V not a tile multiple
    logits = jax.random.normal(jax.random.key(2), (11, 963)) * 4.0
    x = jax.nn.log_softmax(logits, axis=-1)
    _check(x, 5)
