"""Multi-device tests on the 8-device CPU mesh (SURVEY.md §4e).

DP: the parallel train step must produce the SAME update as the
single-device step.  TP: vocab sharding of fc/embedding must not change the
numerics.  Also exercises __graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.core.config import ModelConfig, TrainConfig
from indonesian_image_captioning_tpu.core.meshes import make_mesh
from indonesian_image_captioning_tpu.core.prng import root_key
from indonesian_image_captioning_tpu.parallel import sharding as sh
from indonesian_image_captioning_tpu.parallel.train_step import (
    make_parallel_caption_train_step)
from indonesian_image_captioning_tpu.train import caption as ct
from indonesian_image_captioning_tpu.train import steps


def _setup(vocab=64, B=8):
    cfg = ModelConfig(model_type="attention_scn", vocab_size=vocab,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=8, semantic_dim=4, enc_image_size=2,
                      max_caption_len=10, encoder_arch="resnet50")
    tcfg = TrainConfig(batch_size=B)
    opt = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    state = ct.init_state(root_key(0), cfg, opt)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.normal(size=(B, 4, cfg.encoder_dim)),
                          jnp.float32) * 0.1
    tags = jnp.asarray(rng.uniform(size=(B, cfg.semantic_dim)), jnp.float32)
    caps = jnp.asarray(rng.integers(1, vocab, (B, cfg.max_caption_len)),
                       jnp.int32)
    caplens = jnp.asarray(rng.integers(4, cfg.max_caption_len, B), jnp.int32)
    return cfg, tcfg, opt, state, enc_out, tags, caps, caplens


@pytest.mark.parametrize("mesh_shape,shard_vocab", [
    ((8, 1), False),   # pure DP
    ((4, 2), True),    # DP x TP with vocab sharding
])
def test_parallel_step_matches_single_device(mesh_shape, shard_vocab):
    cfg, tcfg, opt, state, enc_out, tags, caps, caplens = _setup()
    sub = {"params": state["params"], "opt_state": state["opt_state"]}

    _, single = steps.make_caption_train_step(cfg, tcfg, opt, donate=False)
    rng = jax.random.key(7)
    ref_sub, ref_m = single(jax.tree.map(jnp.copy, sub), enc_out, tags,
                            caps, caplens, rng)

    mesh = make_mesh(mesh_shape)
    step = make_parallel_caption_train_step(cfg, tcfg, opt, mesh, sub,
                                            shard_vocab=shard_vocab)
    full_sh = sh.state_sharding(mesh, sub, shard_vocab)
    psub = jax.device_put(sub, {"params": full_sh["params"],
                                "opt_state": full_sh["opt_state"]})
    data = sh.batch_sharding_tree(mesh, {"enc": enc_out, "tags": tags,
                                         "caps": caps, "lens": caplens})
    enc_p = jax.device_put(enc_out, data["enc"])
    tags_p = jax.device_put(tags, data["tags"])
    caps_p = jax.device_put(caps, data["caps"])
    lens_p = jax.device_put(caplens, data["lens"])

    new_sub, m = step(psub, enc_p, tags_p, caps_p, lens_p, rng)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    flat_ref = jax.tree.leaves(ref_sub["params"])
    flat_got = jax.tree.leaves(jax.device_get(new_sub["params"]))
    for a, b in zip(flat_got, flat_ref):
        # distributed psum reorders float reductions; Adam's rsqrt amplifies
        # tiny grad diffs near init — tolerance reflects that, not a bug
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=2e-5)


def test_state_sharding_tree_structure():
    cfg, tcfg, opt, state, *_ = _setup()
    mesh = make_mesh((4, 2))
    tree = sh.state_sharding(mesh, state, shard_vocab=True)
    assert tree["params"]["fc"]["w"].spec == jax.sharding.PartitionSpec(
        None, "model")
    assert tree["params"]["embedding"].spec == jax.sharding.PartitionSpec(
        "model", None)
    # moments follow params
    from indonesian_image_captioning_tpu.train.steps import is_inject_state
    inject = [s for s in tree["opt_state"] if is_inject_state(s)][0]
    adam = [s for s in inject.inner_state if hasattr(s, "mu")][0]
    assert adam.mu["fc"]["w"].spec == jax.sharding.PartitionSpec(None, "model")


def test_graft_entry_dryrun():
    """4 devices -> a (2, 2) mesh, covering both the DP and TP axes in one
    compile.  The driver separately runs dryrun_multichip(8); repeating it
    here cost 10 minutes of single-CPU XLA compilation for no extra
    coverage."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_parallel_tagger_step_runs():
    from indonesian_image_captioning_tpu.core.config import (
        TaggerConfig, tagger_train_config)
    from indonesian_image_captioning_tpu.models import encoders
    from indonesian_image_captioning_tpu.parallel.train_step import (
        make_parallel_tagger_train_step)

    tcfg = tagger_train_config(batch_size=8)
    opt = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    params, stats = encoders.init_encoder_tagger(
        jax.random.key(0), TaggerConfig(semantic_size=4), arch="resnet50")
    state = {"params": params, "stats": stats, "opt_state": opt.init(params)}
    batch = {"images": np.zeros((8, 3, 32, 32), np.uint8),
             "tags": np.ones((8, 4), np.float32),
             "valid": np.ones(8, np.float32)}
    mesh = make_mesh((8, 1))
    step = make_parallel_tagger_train_step(tcfg, opt, mesh, state, batch,
                                           arch="resnet50")
    state_p = jax.device_put(state, jax.tree.map(
        lambda _: sh.replicated(mesh), state))
    batch_p = sh.place_batch(mesh, batch)
    new_state, m = step(state_p, batch_p, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["acc"]) <= 100.0


def test_greedy_decode_api():
    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.decode.greedy import caption_greedy
    from indonesian_image_captioning_tpu.models import decoders as dec

    cfg = ModelConfig(model_type="pure_scn", vocab_size=30, embed_dim=16,
                      decoder_dim=16, factored_dim=8, semantic_dim=4,
                      enc_image_size=2, max_caption_len=10)
    params = dec.init_decoder(jax.random.key(0), cfg)
    enc = jnp.zeros((2, 2, 2, cfg.encoder_dim))
    tags = jnp.zeros((2, cfg.semantic_dim))
    out = caption_greedy(params, cfg, enc, tags, start_id=28, end_id=29,
                         max_steps=9)
    assert out["sequences"].shape == (2, 10)
    assert (np.asarray(out["sequences"][:, 0]) == 28).all()
