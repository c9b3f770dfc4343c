"""Loss regression tests, especially padded-row semantics.

The reference never sees padded batch rows (its shrinking batch drops rows
as captions finish and the loader never pads, trains/attention_scn.py:143);
our fixed-shape loader pads the final partial batch with caplens=0 rows
(data/loader.py).  Every loss term must be invariant to those rows.
"""

import jax.numpy as jnp
import numpy as np

from indonesian_image_captioning_tpu.ops import losses


def _fake_outputs(rng, B, T, P, V, caplens):
    logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    alphas = jnp.asarray(rng.uniform(size=(B, T, P)), jnp.float32)
    alphas = alphas / alphas.sum(-1, keepdims=True)
    # decode mask: step t valid while t < caplen - 1 (targets exclude <start>)
    mask = (np.arange(T)[None, :] < (np.asarray(caplens)[:, None] - 1))
    return {"predictions": logits, "alphas": alphas,
            "mask": jnp.asarray(mask, jnp.float32)}


def test_alpha_penalty_ignores_padded_rows():
    """A padded partial batch must give the SAME loss as the unpadded one."""
    rng = np.random.default_rng(0)
    B, T, P, V = 3, 6, 4, 11
    caplens = np.array([5, 4, 6], np.int32)
    caps = jnp.asarray(rng.integers(1, V, (B, T + 1)), jnp.int32)
    out = _fake_outputs(rng, B, T, P, V, caplens)
    loss, aux = losses.caption_loss(out, caps, alpha_c=1.0)

    # pad to B=5 with two all-invalid rows (caplens 0 -> empty mask)
    pad = 2
    caplens_p = np.concatenate([caplens, np.zeros(pad, np.int32)])
    caps_p = jnp.concatenate([caps, jnp.zeros((pad, T + 1), jnp.int32)])
    out_p = {
        "predictions": jnp.concatenate(
            [out["predictions"], jnp.zeros((pad, T, V))]),
        "alphas": jnp.concatenate([out["alphas"],
                                   jnp.full((pad, T, P), 1.0 / P)]),
        "mask": jnp.concatenate([out["mask"], jnp.zeros((pad, T))]),
    }
    loss_p, aux_p = losses.caption_loss(out_p, caps_p, alpha_c=1.0)
    np.testing.assert_allclose(float(loss_p), float(loss), rtol=1e-6)
    np.testing.assert_allclose(float(aux_p["alpha_penalty"]),
                               float(aux["alpha_penalty"]), rtol=1e-6)
    np.testing.assert_allclose(float(aux_p["ce"]), float(aux["ce"]),
                               rtol=1e-6)


def test_alpha_penalty_matches_reference_hand_case():
    """alpha_c * mean((1 - sum_t alpha)^2) over valid rows, by hand."""
    # 2 valid rows, T=2, P=2; alphas chosen so sums are easy
    alphas = jnp.asarray([[[0.5, 0.5], [0.25, 0.75]],
                          [[1.0, 0.0], [0.0, 1.0]]], jnp.float32)
    mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0]], jnp.float32)
    # row 0: total = (0.75, 1.25) -> (0.0625 + 0.0625)/2 = 0.0625
    # row 1 (only step 0 valid): total = (1.0, 0.0) -> (0 + 1)/2 = 0.5
    want = 2.0 * (0.0625 + 0.5) / 2.0
    got = losses.doubly_stochastic_penalty(alphas, mask, alpha_c=2.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_alpha_penalty_none_and_zero_coeff():
    assert float(losses.doubly_stochastic_penalty(None, None, 1.0)) == 0.0
    alphas = jnp.ones((2, 3, 4)) / 4
    mask = jnp.ones((2, 3))
    assert float(losses.doubly_stochastic_penalty(alphas, mask, 0.0)) == 0.0


def test_bce_ignores_padded_rows():
    rng = np.random.default_rng(1)
    probs = jnp.asarray(rng.uniform(0.05, 0.95, (3, 7)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 2, (3, 7)), jnp.float32)
    base = losses.bce_loss(probs, targets,
                           row_valid=jnp.ones((3,), jnp.float32))
    np.testing.assert_allclose(float(base),
                               float(losses.bce_loss(probs, targets)),
                               rtol=1e-6)
    probs_p = jnp.concatenate([probs, jnp.full((2, 7), 0.5)])
    targets_p = jnp.concatenate([targets, jnp.zeros((2, 7))])
    valid = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
    padded = losses.bce_loss(probs_p, targets_p, row_valid=valid)
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-6)


def test_binary_accuracy_ignores_padded_rows():
    from indonesian_image_captioning_tpu.train.steps import _binary_accuracy
    rng = np.random.default_rng(2)
    probs = jnp.asarray(rng.uniform(size=(3, 5)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 2, (3, 5)), jnp.float32)
    base = _binary_accuracy(probs, targets)
    probs_p = jnp.concatenate([probs, jnp.zeros((2, 5))])
    targets_p = jnp.concatenate([targets, jnp.zeros((2, 5))])
    valid = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
    np.testing.assert_allclose(
        float(_binary_accuracy(probs_p, targets_p, row_valid=valid)),
        float(base), rtol=1e-6)


def test_topk_hit_matches_lax_top_k():
    """topk_hit's rank-membership formulation must agree with lax.top_k's
    stable first-occurrence semantics, ties included — it replaces the
    top_k (a full TPU sort, 242 ms/step at train dims) in the accuracy
    metrics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from indonesian_image_captioning_tpu.core.metrics import topk_hit

    key = jax.random.key(0)
    # quantized scores force plenty of exact ties
    scores = jnp.round(jax.random.normal(key, (64, 37)) * 3) / 3
    targets = jax.random.randint(jax.random.key(1), (64,), 0, 37)
    for k in (1, 3, 5):
        _, ind = jax.lax.top_k(scores, k)
        ref = (ind == targets[:, None]).any(axis=1)
        got = topk_hit(scores, targets, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # 3-d (B, T, V) shape as used by masked_topk_accuracy
    s3 = jnp.round(jax.random.normal(jax.random.key(2), (4, 6, 23)) * 2) / 2
    t3 = jax.random.randint(jax.random.key(3), (4, 6), 0, 23)
    _, ind = jax.lax.top_k(s3, 5)
    ref = (ind == t3[..., None]).any(axis=-1)
    got = topk_hit(s3, t3, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
