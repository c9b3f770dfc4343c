"""Sparse beam head (per-lane top-k candidates) vs the dense logprob path.

The sparse merge must be EXACT — same sequences, scores, lengths and
alphas as the dense (B, K, V) flat top-k, for every model type and for
degenerate beams.  See decode/beam.py module docstring for the argument.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.core.config import BeamConfig, ModelConfig
from indonesian_image_captioning_tpu.decode.api import caption_beam_search
from indonesian_image_captioning_tpu.models import decoders


def _make(model_type, vocab=40, seed=0):
    cfg = ModelConfig(model_type=model_type, vocab_size=vocab,
                      embed_dim=24, attention_dim=16, decoder_dim=24,
                      factored_dim=12, semantic_dim=6, enc_image_size=2,
                      max_caption_len=10)
    params = decoders.init_decoder(jax.random.key(seed), cfg)
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(rng.normal(size=(3, 2, 2, cfg.encoder_dim)),
                      jnp.float32) * 0.1
    tags = jnp.asarray(rng.uniform(size=(3, cfg.semantic_dim)), jnp.float32)
    return cfg, params, enc, tags


@pytest.mark.parametrize("model_type", ["pure_scn", "pure_attention",
                                        "attention_scn"])
@pytest.mark.parametrize("beam", [1, 3, 5])
def test_sparse_head_matches_dense(model_type, beam):
    cfg, params, enc, tags = _make(model_type)
    bc = BeamConfig(beam_size=beam, max_steps=9)
    kw = dict(start_id=cfg.vocab_size - 2, end_id=cfg.vocab_size - 1,
              beam_cfg=bc, record_alphas=cfg.uses_attention)
    out_s = caption_beam_search(params, dataclasses.replace(
        cfg, sparse_head=True), enc, tags, **kw)
    out_d = caption_beam_search(params, dataclasses.replace(
        cfg, sparse_head=False), enc, tags, **kw)
    np.testing.assert_array_equal(np.asarray(out_s["sequences"]),
                                  np.asarray(out_d["sequences"]))
    np.testing.assert_array_equal(np.asarray(out_s["lengths"]),
                                  np.asarray(out_d["lengths"]))
    np.testing.assert_allclose(np.asarray(out_s["scores"]),
                               np.asarray(out_d["scores"]), rtol=1e-6)
    if cfg.uses_attention:
        np.testing.assert_allclose(np.asarray(out_s["alpha"]),
                                   np.asarray(out_d["alpha"]), rtol=1e-5,
                                   atol=1e-6)


def test_sparse_head_candidate_values_match_log_softmax():
    """The shifted candidate values must be bitwise log_softmax gathers."""
    cfg, params, enc, tags = _make("attention_scn")
    enc_flat = decoders.flatten_encoding(enc, cfg.encoder_dim)
    init_fn, step_sparse = decoders.make_beam_step(
        params, dataclasses.replace(cfg, sparse_head=True), enc_flat, tags)
    _, step_dense = decoders.make_beam_step(
        params, dataclasses.replace(cfg, sparse_head=False), enc_flat, tags)
    state = init_fn(4)
    prev = jnp.full((3, 4), cfg.vocab_size - 2, jnp.int32)
    (vals, ids), _, _ = step_sparse(state, prev)
    dense, _, _ = step_dense(state, prev)
    gathered = jnp.take_along_axis(dense, ids, axis=-1)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(gathered))
