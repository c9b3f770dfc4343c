"""Fused additive-attention kernel vs the XLA implementation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from indonesian_image_captioning_tpu.models import attention as attn
from indonesian_image_captioning_tpu.ops.attention_pallas import attend_fused


def test_attend_fused_matches_xla(rng):
    B, K, P, E, D, A = 3, 5, 12, 32, 16, 24
    params = attn.init_attention(jax.random.key(0), E, D, A)
    enc = jnp.asarray(rng.normal(size=(B, 1, P, E)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    enc_att = attn.precompute(params, enc)
    awe_ref, alpha_ref = attn.attend(params, enc, enc_att, h)
    awe, alpha = attend_fused(params, enc, enc_att, h, interpret=True)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(awe), np.asarray(awe_ref),
                               rtol=1e-4, atol=1e-4)


def test_beam_decode_fused_attention_matches(rng):
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    cfg = ModelConfig(model_type="attention_scn", vocab_size=40,
                      embed_dim=32, attention_dim=16, decoder_dim=32,
                      factored_dim=16, semantic_dim=8, enc_image_size=2,
                      max_caption_len=10)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    enc = jnp.asarray(rng.normal(size=(2, 2, 2, cfg.encoder_dim)),
                      jnp.float32) * 0.1
    tags = jnp.asarray(rng.uniform(size=(2, cfg.semantic_dim)), jnp.float32)
    bc = BeamConfig(beam_size=3, max_steps=9)
    out_x = caption_beam_search(params, cfg, enc, tags, start_id=38,
                                end_id=39, beam_cfg=bc, record_alphas=True)
    for impl in ("pallas", "pallas_mxu", "xla_pk"):
        cfg_f = dataclasses.replace(cfg, attention_impl=impl)
        out_f = caption_beam_search(params, cfg_f, enc, tags, start_id=38,
                                    end_id=39, beam_cfg=bc,
                                    record_alphas=True)
        np.testing.assert_array_equal(np.asarray(out_x["sequences"]),
                                      np.asarray(out_f["sequences"]),
                                      err_msg=impl)
        np.testing.assert_allclose(np.asarray(out_x["alpha"]),
                                   np.asarray(out_f["alpha"]), rtol=1e-4,
                                   atol=1e-5, err_msg=impl)


def test_attend_fused_mxu_matches_xla(rng):
    from indonesian_image_captioning_tpu.ops.attention_pallas import (
        attend_fused_mxu)
    B, K, P, E, D, A = 4, 5, 12, 32, 16, 24
    params = attn.init_attention(jax.random.key(1), E, D, A)
    enc = jnp.asarray(rng.normal(size=(B, 1, P, E)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    enc_att = attn.precompute(params, enc)
    awe_ref, alpha_ref = attn.attend(params, enc, enc_att, h)
    for g in (1, 2, 4):
        awe, alpha = attend_fused_mxu(params, enc, enc_att, h,
                                      interpret=True, img_tile=g)
        np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(awe), np.asarray(awe_ref),
                                   rtol=1e-4, atol=1e-4)


def test_attend_pk_matches_attend(rng):
    B, K, P, E, D, A = 3, 4, 9, 32, 16, 24
    params = attn.init_attention(jax.random.key(2), E, D, A)
    enc = jnp.asarray(rng.normal(size=(B, 1, P, E)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    enc_att = attn.precompute(params, enc)
    awe_ref, alpha_ref = attn.attend(params, enc, enc_att, h)
    awe, alpha = attn.attend_pk(params, enc, enc_att, h)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(awe), np.asarray(awe_ref),
                               rtol=1e-5, atol=1e-5)
