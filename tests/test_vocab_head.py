"""Chunked vocab CE head (ops/vocab_head.py) vs the dense reference path.

Equivalence contract (VERDICT r4 #1 "done" criterion): CE value and the
(fc, hidden) gradients match the materialised log_softmax path to <=2e-3
relative; top-k accuracy and argmax predictions match; the head composes
with the full train step (auto policy) and with vocab padding (V not a
tile multiple).  Reference semantics anchor: the packed CE + top-5 of
/root/reference/trains/attention_scn.py:219-255.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.core.metrics import topk_accuracy
from indonesian_image_captioning_tpu.ops import losses
from indonesian_image_captioning_tpu.ops.vocab_head import (
    chunked_ce_topk, chunked_eval_head)


def _case(seed=0, B=4, T=7, D=32, V=301, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    fc = {"w": jnp.asarray(rng.standard_normal((D, V)) * 0.2, dtype),
          "b": jnp.asarray(rng.standard_normal((V,)) * 0.1, dtype)}
    hidden = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, dtype)
    targets = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    lens = rng.integers(2, T + 1, (B,))
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    return fc, hidden, targets, mask


def _dense(fc, hidden, targets, mask, k=5):
    logits = (hidden @ fc["w"] + fc["b"]).astype(jnp.float32)
    ce = losses.masked_cross_entropy(logits, targets, mask)
    top = topk_accuracy(logits.reshape(-1, logits.shape[-1]),
                        targets.reshape(-1), k, mask.reshape(-1))
    return ce, top, logits


@pytest.mark.parametrize("tile", [64, 128, 512])
def test_value_parity_f32(tile):
    fc, hidden, targets, mask = _case()
    ce_d, top_d, logits = _dense(fc, hidden, targets, mask)
    ce_c, top_c, n = chunked_ce_topk(fc, hidden, targets, mask, tile=tile)
    assert np.allclose(float(ce_c), float(ce_d), rtol=1e-5)
    assert np.allclose(float(top_c), float(top_d), atol=1e-4)
    assert float(n) == float(mask.sum())


def test_single_tile_smaller_than_v():
    fc, hidden, targets, mask = _case(V=37)
    ce_d, top_d, _ = _dense(fc, hidden, targets, mask)
    ce_c, top_c, _ = chunked_ce_topk(fc, hidden, targets, mask, tile=64)
    assert np.allclose(float(ce_c), float(ce_d), rtol=1e-5)
    assert np.allclose(float(top_c), float(top_d), atol=1e-4)


def test_grad_parity_f32():
    fc, hidden, targets, mask = _case(seed=1)

    def loss_dense(fc, hidden):
        logits = (hidden @ fc["w"] + fc["b"]).astype(jnp.float32)
        return losses.masked_cross_entropy(logits, targets, mask)

    def loss_chunk(fc, hidden):
        return chunked_ce_topk(fc, hidden, targets, mask, tile=64)[0]

    gd = jax.grad(loss_dense, argnums=(0, 1))(fc, hidden)
    gc = jax.grad(loss_chunk, argnums=(0, 1))(fc, hidden)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)

    assert rel(gc[0]["w"], gd[0]["w"]) < 2e-3
    assert rel(gc[0]["b"], gd[0]["b"]) < 2e-3
    assert rel(gc[1], gd[1]) < 2e-3


def test_grad_parity_bf16():
    """Mixed-precision contract: bf16 inputs, f32 accumulators; gradients
    come back bf16 (the dense path's dtype) and match dense within bf16
    reassociation noise."""
    fc, hidden, targets, mask = _case(seed=2, dtype=jnp.bfloat16)

    def loss_dense(fc, hidden):
        logits = (hidden @ fc["w"] + fc["b"]).astype(jnp.float32)
        return losses.masked_cross_entropy(logits, targets, mask)

    def loss_chunk(fc, hidden):
        return chunked_ce_topk(fc, hidden, targets, mask, tile=64)[0]

    ce_d = loss_dense(fc, hidden)
    ce_c = loss_chunk(fc, hidden)
    assert np.allclose(float(ce_c), float(ce_d), rtol=5e-3)

    gd = jax.grad(loss_dense, argnums=(0, 1))(fc, hidden)
    gc = jax.grad(loss_chunk, argnums=(0, 1))(fc, hidden)
    assert gc[1].dtype == jnp.bfloat16

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)

    assert rel(gc[0]["w"], gd[0]["w"]) < 3e-2
    assert rel(gc[1], gd[1]) < 3e-2


def test_all_rows_padded_safe():
    fc, hidden, targets, _ = _case(seed=3)
    mask = jnp.zeros(targets.shape, jnp.float32)
    ce, top, n = chunked_ce_topk(fc, hidden, targets, mask, tile=64)
    assert float(n) == 0.0 and np.isfinite(float(ce)) and float(ce) == 0.0


def test_eval_head_argmax_and_metrics():
    fc, hidden, targets, mask = _case(seed=4)
    ce_d, top_d, logits = _dense(fc, hidden, targets, mask)
    ce, top, n, preds = chunked_eval_head(fc, hidden, targets, mask,
                                          tile=64)
    assert np.allclose(float(ce), float(ce_d), rtol=1e-5)
    assert np.allclose(float(top), float(top_d), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_train_step_head_impls_match():
    """Full caption train step: head_impl='chunked' must reproduce the
    dense step's loss/metrics and updated params (CPU, f32)."""
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    cfg = ModelConfig(model_type="attention_scn", vocab_size=97,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=16, semantic_dim=10, encoder_dim=24,
                      enc_image_size=2, max_caption_len=9,
                      encoder_arch="resnet50", dropout=0.0)
    rng = np.random.default_rng(0)
    B = 6
    enc = jnp.asarray(rng.standard_normal((B, 2, 2, 24)), jnp.float32)
    tags = jnp.asarray(rng.random((B, 10)), jnp.float32)
    caps = jnp.asarray(rng.integers(1, 96, (B, 9)), jnp.int32)
    caplens = jnp.asarray(rng.integers(3, 9, (B,)), jnp.int32)
    key = jax.random.key(7)

    results = {}
    for impl in ("dense", "chunked"):
        tcfg = TrainConfig(batch_size=B, head_impl=impl, head_tile=32,
                           alpha_c=1.0)
        opt = steps.make_optimizer(4e-4, 5.0)
        state = ct.init_state(jax.random.key(0), cfg, opt)
        sub = {"params": state["params"], "opt_state": state["opt_state"]}
        _, step = steps.make_caption_train_step(cfg, tcfg, opt,
                                                donate=False)
        new_sub, metrics = step(sub, enc, tags, caps, caplens, key)
        results[impl] = (new_sub, metrics)

    md, mc = results["dense"][1], results["chunked"][1]
    assert np.allclose(float(mc["loss"]), float(md["loss"]), rtol=1e-5)
    assert np.allclose(float(mc["ce"]), float(md["ce"]), rtol=1e-5)
    assert np.allclose(float(mc["top5"]), float(md["top5"]), atol=1e-3)
    fd = results["dense"][0]["params"]["fc"]["w"]
    fcw = results["chunked"][0]["params"]["fc"]["w"]
    assert np.allclose(np.asarray(fcw), np.asarray(fd), atol=2e-6)


def test_eval_step_head_impls_match():
    from indonesian_image_captioning_tpu.core.config import (
        ModelConfig, TrainConfig)
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    cfg = ModelConfig(model_type="attention_scn", vocab_size=97,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=16, semantic_dim=10, encoder_dim=24,
                      enc_image_size=2, max_caption_len=9,
                      encoder_arch="resnet50", dropout=0.0)
    rng = np.random.default_rng(1)
    B = 5
    enc = jnp.asarray(rng.standard_normal((B, 2, 2, 24)), jnp.float32)
    tags = jnp.asarray(rng.random((B, 10)), jnp.float32)
    caps = jnp.asarray(rng.integers(1, 96, (B, 9)), jnp.int32)
    caplens = jnp.asarray(rng.integers(3, 9, (B,)), jnp.int32)
    opt = steps.make_optimizer(4e-4, 5.0)
    params = ct.init_state(jax.random.key(0), cfg, opt)["params"]

    outs = {}
    for impl in ("dense", "chunked"):
        tcfg = TrainConfig(batch_size=B, head_impl=impl, head_tile=32)
        _, estep = steps.make_caption_eval_step(cfg, tcfg)
        outs[impl] = estep(params, enc, tags, caps, caplens)
    d, c = outs["dense"], outs["chunked"]
    assert np.allclose(float(c["loss"]), float(d["loss"]), rtol=1e-5)
    assert np.allclose(float(c["top5"]), float(d["top5"]), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(c["preds"]),
                                  np.asarray(d["preds"]))


def test_tiled_embed_lookup_bwd():
    """Large-vocab embed_lookup backward takes the vocab-tiled path (no
    (N, V) one-hot); gradients must equal a host scatter-add."""
    from indonesian_image_captioning_tpu.models.decoders import embed_lookup

    rng = np.random.default_rng(5)
    V, E = 40_000, 8
    N = 27_000                           # N*V > 2^30 -> tiled path
    table = jnp.asarray(rng.standard_normal((V, E)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (N,)), jnp.int32)
    g = rng.standard_normal((N, E)).astype(np.float32)

    def f(t):
        return (embed_lookup(t, ids) * jnp.asarray(g)).sum()

    dtable = np.asarray(jax.grad(f)(table))
    expect = np.zeros((V, E), np.float32)
    np.add.at(expect, np.asarray(ids), g)
    np.testing.assert_allclose(dtable, expect, rtol=1e-5, atol=1e-5)


def test_tp_island_grads_match_plain():
    """Vocab-parallel island gradients must match the single-device
    chunked head ELEMENTWISE (adaptive optimizers normalise away scale
    errors, so a direct grad check is required: a x1/model-axis factor on
    d_fc from the replicated-scalar shard_map transpose was caught only
    by this)."""
    from indonesian_image_captioning_tpu.core.meshes import make_mesh
    from indonesian_image_captioning_tpu.train.steps import (
        make_chunked_head_island)

    rng = np.random.default_rng(0)
    B, T, D, V = 8, 7, 16, 64
    fc = {"w": jnp.asarray(rng.standard_normal((D, V)) * 0.2, jnp.float32),
          "b": jnp.asarray(rng.standard_normal((V,)) * 0.1, jnp.float32)}
    hidden = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    mask = jnp.asarray((np.arange(T)[None, :]
                        < rng.integers(2, T + 1, (B,))[:, None])
                       .astype(np.float32))

    def lplain(fc, hidden):
        return chunked_ce_topk(fc, hidden, targets, mask, tile=16)[0]

    v0, g0 = jax.value_and_grad(lplain, argnums=(0, 1))(fc, hidden)

    mesh = make_mesh((4, 2))
    for tile in (16, 2048):              # 2048 > V/m: padded cols alias
        island = make_chunked_head_island(mesh, tile=tile)

        def lisl(fc, hidden):
            return island(fc, hidden, targets, mask)[0]

        v, g = jax.jit(jax.value_and_grad(lisl, argnums=(0, 1)))(fc, hidden)
        assert abs(float(v) - float(v0)) < 1e-5
        np.testing.assert_allclose(np.asarray(g[0]["w"]),
                                   np.asarray(g0[0]["w"]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[0]["b"]),
                                   np.asarray(g0[0]["b"]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g0[1]),
                                   rtol=1e-4, atol=1e-6)
