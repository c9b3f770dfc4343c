"""Fused Pallas SCN step vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.models import scn_cell
from indonesian_image_captioning_tpu.ops.scn_pallas import scn_step_fused


@pytest.mark.parametrize("lead,inp,hid,fac,sem", [
    ((5,), 48, 64, 32, 16),        # odd row count -> padding path
    ((2, 5), 80, 64, 64, 16),      # beam-shaped (B, K)
    ((8,), 64, 128, 128, 24),
])
def test_fused_matches_xla(rng, lead, inp, hid, fac, sem):
    params = scn_cell.init_scn_cell(jax.random.key(0), inp, hid, sem, fac)
    x = jnp.asarray(rng.normal(size=lead + (inp,)), jnp.float32)
    s = jnp.asarray(rng.uniform(size=lead + (sem,)), jnp.float32)
    h = jnp.asarray(rng.normal(size=lead + (hid,)), jnp.float32)
    c = jnp.asarray(rng.normal(size=lead + (hid,)), jnp.float32)

    sem_x, sem_h = scn_cell.semantic_projections(params, s)
    x_fac = scn_cell.input_factor(params, x)
    h_ref, c_ref = scn_cell.scn_step(params, x_fac, sem_x, sem_h, h, c)
    h_got, c_got = scn_step_fused(params, x, sem_x, sem_h, h, c,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)


def test_beam_decode_fused_matches_xla(rng):
    """End-to-end beam decode with fused_cell on/off must agree."""
    import dataclasses
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
                                end_id=39, beam_cfg=bc)
    cfg_f = dataclasses.replace(cfg, fused_cell=True)
    out_f = caption_beam_search(params, cfg_f, enc, tags, start_id=38,
                                end_id=39, beam_cfg=bc)
    np.testing.assert_array_equal(np.asarray(out_x["sequences"]),
                                  np.asarray(out_f["sequences"]))
    np.testing.assert_allclose(np.asarray(out_x["scores"]),
                               np.asarray(out_f["scores"]), rtol=1e-4)
