"""SCN cell numerics vs an independent NumPy oracle.

The oracle transcribes the MATH of the reference cell
(/root/reference/models/scn_cell.py:52-154) gate by gate from the paper's
factorisation — it is deliberately written in the reference's torch weight
layout so it also validates the layout converters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.models import scn_cell


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_step(tw, x, s, h, c, factor):
    """Reference-layout SCN step. tw: torch-layout dict of numpy arrays."""
    def split2(w):  # (D, 4F) -> four (D, F)
        return [w[:, i * factor:(i + 1) * factor] for i in range(4)]

    def split1(b):  # (4H,) -> four (H,)
        hid = b.shape[0] // 4
        return [b[i * hid:(i + 1) * hid] for i in range(4)]

    ia, ib, ic = split2(tw["weight_ia"]), split2(tw["weight_ib"]), split2(tw["weight_ic"])
    ha, hb, hc = split2(tw["weight_ha"]), split2(tw["weight_hb"]), split2(tw["weight_hc"])
    bi, bh = split1(tw["bias_ih"]), split1(tw["bias_hh"])

    gates = []
    for g in range(4):
        x_g = ((x @ ia[g]) * (s @ ib[g])) @ ic[g].T + bi[g]
        pre_g = ((h @ ha[g]) * (s @ hb[g])) @ hc[g].T + x_g + bh[g]
        gates.append(pre_g)
    i, f, o, g = sigmoid(gates[0]), sigmoid(gates[1]), sigmoid(gates[2]), np.tanh(gates[3])
    c_next = f * c + i * g
    h_next = o * np.tanh(c_next)
    return h_next, c_next


def make_torch_layout_weights(rng, inp, hid, sem, fac):
    r = lambda *shape: rng.normal(size=shape).astype(np.float32) * 0.1
    return {
        "weight_ia": r(inp, 4 * fac), "weight_ib": r(sem, 4 * fac),
        "weight_ic": r(hid, 4 * fac), "weight_ha": r(hid, 4 * fac),
        "weight_hb": r(sem, 4 * fac), "weight_hc": r(hid, 4 * fac),
        "bias_ih": r(4 * hid), "bias_hh": r(4 * hid),
    }


@pytest.mark.parametrize("inp,hid,sem,fac", [
    (16, 24, 10, 12),      # factor != hidden != input — dims kept distinct
    (32, 32, 20, 32),      # the reference's all-equal configuration
])
def test_step_matches_oracle(rng, inp, hid, sem, fac):
    B = 5
    tw = make_torch_layout_weights(rng, inp, hid, sem, fac)
    params = scn_cell.from_torch_layout(**tw)

    x = rng.normal(size=(B, inp)).astype(np.float32)
    s = rng.uniform(size=(B, sem)).astype(np.float32)
    h = rng.normal(size=(B, hid)).astype(np.float32)
    c = rng.normal(size=(B, hid)).astype(np.float32)

    h2, c2 = scn_cell.scn_cell_apply(params, jnp.array(x), jnp.array(s),
                                     jnp.array(h), jnp.array(c))
    h_ref, c_ref = oracle_step(tw, x, s, h, c, fac)
    np.testing.assert_allclose(np.asarray(h2), h_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), c_ref, rtol=1e-5, atol=1e-5)


def test_torch_layout_roundtrip(rng):
    tw = make_torch_layout_weights(rng, 8, 12, 6, 10)
    params = scn_cell.from_torch_layout(**tw)
    back = scn_cell.to_torch_layout(params)
    for k in tw:
        np.testing.assert_allclose(np.asarray(back[k]), tw[k], rtol=0, atol=0)


def test_hoisted_projections_match_direct(rng):
    """semantic_projections + input_factor + scn_step == scn_cell_apply."""
    key = jax.random.key(1)
    params = scn_cell.init_scn_cell(key, 16, 24, 10, 12)
    B = 3
    x = jnp.asarray(rng.normal(size=(B, 16)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 10)), jnp.float32)
    h = jnp.zeros((B, 24))
    c = jnp.zeros((B, 24))

    direct = scn_cell.scn_cell_apply(params, x, s, h, c)
    sem_x, sem_h = scn_cell.semantic_projections(params, s)
    hoisted = scn_cell.scn_step(params, scn_cell.input_factor(params, x),
                                sem_x, sem_h, h, c)
    for a, b in zip(direct, hoisted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_beam_shaped_batch(rng):
    """Step works with (B, K, ...) leading shapes (beam search layout)."""
    params = scn_cell.init_scn_cell(jax.random.key(0), 16, 24, 10, 12)
    B, K = 2, 5
    x = jnp.asarray(rng.normal(size=(B, K, 16)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=(B, 1, 10)), jnp.float32)
    sem_x, sem_h = scn_cell.semantic_projections(params, s)
    h = jnp.zeros((B, K, 24))
    c = jnp.zeros((B, K, 24))
    h2, c2 = scn_cell.scn_step(params, scn_cell.input_factor(params, x),
                               sem_x, sem_h, h, c)
    assert h2.shape == (B, K, 24) and c2.shape == (B, K, 24)
    # lane independence: lane j equals a solo run of lane j
    for j in range(K):
        hj, cj = scn_cell.scn_cell_apply(
            params, x[:, j], jnp.broadcast_to(s[:, 0], (B, 10)),
            h[:, j], c[:, j])
        np.testing.assert_allclose(np.asarray(h2[:, j]), np.asarray(hj),
                                   rtol=1e-5, atol=1e-6)
