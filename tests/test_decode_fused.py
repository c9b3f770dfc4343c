"""Fused full-decode kernel (ops/decode_pallas.py) vs the step-loop engine.

The fused kernel + replay must reproduce the XLA beam engine exactly at f32
(same sequences/lengths/pools; scores to reduction-order tolerance).  Runs
in interpret mode on the CPU mesh; the TPU compiled path is exercised by
tools/profile_fused_decode.py and the verify skill.
"""

import jax
import jax.numpy as jnp
import pytest

from indonesian_image_captioning_tpu.core.config import BeamConfig, ModelConfig
from indonesian_image_captioning_tpu.decode.api import caption_beam_search
from indonesian_image_captioning_tpu.decode.replay import replay_beam_records
from indonesian_image_captioning_tpu.models import decoders
from indonesian_image_captioning_tpu.ops.decode_pallas import (
    beam_decode_records)


def tiny_cfg(vocab=50):
    return ModelConfig(model_type="attention_scn", vocab_size=vocab,
                       embed_dim=10, attention_dim=8, decoder_dim=12,
                       factored_dim=8, semantic_dim=11, encoder_dim=16,
                       enc_image_size=3)


def run_both(cfg, params, enc, tags, K, T, img_tile=8, group=4):
    V = cfg.vocab_size
    ref = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                              end_id=V - 1,
                              beam_cfg=BeamConfig(beam_size=K, max_steps=T))
    rec = beam_decode_records(params, cfg, enc, tags, beam_size=K,
                              start_id=V - 2, end_id=V - 1, max_steps=T,
                              img_tile=img_tile, group=group, interpret=True)
    out = replay_beam_records(rec, start_id=V - 2, end_id=V - 1,
                              seq_len=T + 1)
    return ref, out


def assert_match(ref, out, score_tol=1e-5):
    assert (ref["sequences"] == out["sequences"]).all()
    assert (ref["lengths"] == out["lengths"]).all()
    assert (ref["completed_count"] == out["completed_count"]).all()
    assert jnp.allclose(ref["scores"], out["scores"], atol=score_tol)
    assert (ref["completed_lengths"] == out["completed_lengths"]).all()


def test_fused_matches_engine_no_completions():
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(0), cfg)
    enc = jax.random.normal(jax.random.key(1), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(2), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=8)
    assert_match(ref, out)
    # the worst case actually ran the full window
    assert int(ref["lengths"][0]) == 9


def test_fused_matches_engine_with_retirement():
    """Bias the head toward <end> so beams retire at differing steps,
    exercising the completion pools, alive shrinkage and row freezing."""
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(3), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.5)
    enc = jax.random.normal(jax.random.key(4), (8, 9, 16)) * 0.5
    tags = jax.random.uniform(jax.random.key(5), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=10)
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_fused_matches_engine_all_end_early():
    """Strong <end> bias: every row finishes well before the cap — the
    kernel's whole-chunk skip and the replay's trailing no-op steps."""
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(6), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(6.0)
    enc = jax.random.normal(jax.random.key(7), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(8), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=12)
    assert int(ref["completed_count"].min()) == 3  # every beam retired
    assert_match(ref, out)


def test_fused_beam5_multi_chunk():
    """K=5 (bench beam), two chunks (G=8 over B=16), group m=4."""
    cfg = tiny_cfg(vocab=64)
    params = decoders.init_decoder(jax.random.key(9), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(10), (16, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(11), (16, 11))
    ref, out = run_both(cfg, params, enc, tags, K=5, T=9, img_tile=8,
                        group=4)
    assert_match(ref, out)


def test_fused_rejects_unsupported_model():
    cfg = ModelConfig(model_type="pure_scn", vocab_size=50)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    enc = jnp.zeros((8, 196, 2048))
    tags = jnp.zeros((8, 1000))
    with pytest.raises(NotImplementedError):
        beam_decode_records(params, cfg, enc, tags, beam_size=5,
                            start_id=1, end_id=2, interpret=True)
