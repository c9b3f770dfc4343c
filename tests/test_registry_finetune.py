"""Decoder registry, embedding controls, converter roundtrip, fine-tune step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.core.config import ModelConfig, TrainConfig
from indonesian_image_captioning_tpu.models import convert, decoders, registry


def test_registry_sets():
    assert registry.scn_based_model == {"pure_scn", "attention_scn"}
    assert registry.att_based_model == {"pure_attention", "attention_scn"}
    with pytest.raises(ValueError):
        registry.make_config("bogus", 10)


@pytest.mark.parametrize("model_type", decoders.MODEL_TYPES)
def test_decoder_torch_roundtrip(model_type):
    """params -> torch serve state_dict -> params is the identity, and
    load_decoder consumes the exported dict."""
    cfg = ModelConfig(model_type=model_type, vocab_size=40, embed_dim=16,
                      attention_dim=12, decoder_dim=16, factored_dim=8,
                      semantic_dim=6)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    sd = convert.decoder_to_torch(params, cfg)
    back = convert.decoder_from_torch(sd, cfg)
    ref_leaves, ref_def = jax.tree.flatten(params)
    got_leaves, got_def = jax.tree.flatten(back)
    assert ref_def == got_def
    for a, b in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    loaded, cfg2 = registry.load_decoder(
        model_type, sd, vocab_size=40, embed_dim=16, attention_dim=12,
        decoder_dim=16, factored_dim=8, semantic_dim=6)
    np.testing.assert_allclose(np.asarray(loaded["embedding"]),
                               np.asarray(params["embedding"]))


def test_pretrained_embeddings_and_mask():
    cfg = ModelConfig(model_type="pure_scn", vocab_size=10, embed_dim=4,
                      decoder_dim=8, factored_dim=4, semantic_dim=3)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    emb = np.arange(40, dtype=np.float32).reshape(10, 4)
    params2 = decoders.load_pretrained_embeddings(params, emb)
    np.testing.assert_array_equal(np.asarray(params2["embedding"]), emb)
    with pytest.raises(ValueError):
        decoders.load_pretrained_embeddings(params, np.zeros((3, 4)))
    mask = decoders.trainable_mask(params, fine_tune_embeddings=False)
    assert mask["embedding"] is False
    assert jax.tree.leaves(mask["fc"]) == [True, True]


def test_finetune_step_updates_encoder_stages(rng):
    from indonesian_image_captioning_tpu.core.prng import root_key
    from indonesian_image_captioning_tpu.train import caption as ct
    from indonesian_image_captioning_tpu.train import steps

    cfg = ModelConfig(model_type="attention_scn", vocab_size=30,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=8, semantic_dim=4, enc_image_size=2,
                      max_caption_len=8, encoder_arch="resnet50")
    tcfg = TrainConfig(batch_size=2, fine_tune_encoder=True)
    dec_opt = steps.make_optimizer(tcfg.decoder_lr, tcfg.grad_clip)
    enc_opt = steps.make_optimizer(tcfg.encoder_lr, tcfg.grad_clip)
    state = ct.init_state(root_key(0), cfg, dec_opt)
    state["enc_opt_state"] = enc_opt.init(state["encoder"])
    state = {k: state[k] for k in ("params", "opt_state", "encoder",
                                   "encoder_stats", "enc_opt_state",
                                   "tagger", "tagger_stats")}

    tagger_fn, step = steps.make_caption_finetune_train_step(
        cfg, tcfg, dec_opt, enc_opt, donate=False)
    images = rng.integers(0, 256, (2, 3, 32, 32)).astype(np.uint8)
    batch = {"images": images}
    tags = tagger_fn(state, batch)
    caps = jnp.asarray(rng.integers(1, 30, (2, 8)), jnp.int32)
    caplens = jnp.asarray([6, 8], jnp.int32)

    new_state, m = step(state, images, tags, caps, caplens,
                        jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    # frozen stage: conv1 unchanged; tunable stage: layer4 changed
    np.testing.assert_array_equal(
        np.asarray(new_state["encoder"]["resnet"]["conv1"]),
        np.asarray(state["encoder"]["resnet"]["conv1"]))
    l4_new = jax.tree.leaves(new_state["encoder"]["resnet"]["layer4"])
    l4_old = jax.tree.leaves(state["encoder"]["resnet"]["layer4"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l4_new, l4_old))
    # BN running stats updated (train-mode encoder)
    bn_new = np.asarray(new_state["encoder_stats"]["resnet"]["bn1"]["mean"])
    bn_old = np.asarray(state["encoder_stats"]["resnet"]["bn1"]["mean"])
    assert not np.array_equal(bn_new, bn_old)


def test_lr_decay_actually_decays():
    from indonesian_image_captioning_tpu.train import steps
    opt = steps.make_optimizer(1e-3, 5.0)
    st = opt.init({"w": jnp.zeros(3)})
    assert abs(steps.current_learning_rate(st) - 1e-3) < 1e-9
    st2 = steps.decay_learning_rate(st, 0.8)
    assert abs(steps.current_learning_rate(st2) - 8e-4) < 1e-9
