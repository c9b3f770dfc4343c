"""The vectorized replay must reproduce the verbatim-scan replay exactly.

replay_beam_records (production, scatter-free backtrace formulation) vs
replay_beam_records_scan (the reference: beam._apply_selection applied
per step — the engine's own bookkeeping).  Cases cover: normal decodes,
rows that freeze (all lanes retire), overflowing pools (more than K
retirements, mode='drop'), nothing-ever-completes rows (live fallback),
rank >= alive_count end-words (must be discarded), and real records from
the span-records engine.
"""

import numpy as np
import pytest

NEG = -1e30


def _finite_cmp(a, b):
    np.testing.assert_array_equal(np.asarray(a["sequences"]),
                                  np.asarray(b["sequences"]))
    np.testing.assert_array_equal(np.asarray(a["lengths"]),
                                  np.asarray(b["lengths"]))
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(a["completed_count"]),
                                  np.asarray(b["completed_count"]))
    np.testing.assert_allclose(np.asarray(a["completed_scores"]),
                               np.asarray(b["completed_scores"]),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(a["completed_lengths"]),
                                  np.asarray(b["completed_lengths"]))
    np.testing.assert_array_equal(np.asarray(a["completed_sequences"]),
                                  np.asarray(b["completed_sequences"]))


def _random_records(rng, B, T, K, V, end_id, end_rate):
    """Adversarial synthetic records: random words/parents, strictly
    decreasing-ish scores, random end emissions, some rows ending early,
    some never."""
    words = rng.integers(0, V, (B, T, K)).astype(np.int32)
    # random end placements
    end_mask = rng.random((B, T, K)) < end_rate
    words = np.where(end_mask, end_id, words)
    # row 0: never completes (live fallback); row 1: ends everywhere
    # (freeze + overflow the pool)
    if B > 1:
        words[0] = np.where(words[0] == end_id, 0, words[0])
    if B > 2:
        words[1] = end_id
    parents = rng.integers(0, K, (B, T, K)).astype(np.int32)
    vals = (-rng.random((B, T, K)).astype(np.float32)
            * np.arange(1, T + 1)[None, :, None])
    # sprinkle NEG lanes (dead-lane candidates)
    vals = np.where(rng.random((B, T, K)) < 0.15, NEG, vals)
    return {"words": words, "parents": parents,
            "vals": vals.astype(np.float32)}


@pytest.mark.parametrize("end_rate", [0.0, 0.05, 0.35])
def test_fast_replay_matches_scan_replay(end_rate):
    import jax.numpy as jnp

    from indonesian_image_captioning_tpu.decode.replay import (
        replay_beam_records, replay_beam_records_scan)

    rng = np.random.default_rng(int(end_rate * 100) + 3)
    B, T, K, V = 8, 12, 5, 40
    recs = _random_records(rng, B, T, K, V, end_id=V - 1,
                           end_rate=end_rate)
    recs = {k: jnp.asarray(v) for k, v in recs.items()}
    kw = dict(start_id=V - 2, end_id=V - 1, seq_len=T + 1)
    _finite_cmp(replay_beam_records(recs, **kw),
                replay_beam_records_scan(recs, **kw))


def test_fast_replay_matches_on_real_engine_records():
    import jax
    import jax.numpy as jnp

    from indonesian_image_captioning_tpu.core.config import ModelConfig
    from indonesian_image_captioning_tpu.models import decoders
    from indonesian_image_captioning_tpu.ops.span_pallas import (
        beam_decode_span_records)
    from indonesian_image_captioning_tpu.decode.replay import (
        replay_beam_records, replay_beam_records_scan)

    V = 50
    cfg = ModelConfig(model_type="attention_scn", vocab_size=V,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=12, semantic_dim=10, encoder_dim=32,
                      enc_image_size=3, max_caption_len=13)
    params = decoders.init_decoder(jax.random.key(0), cfg)
    B = 8
    enc = jax.random.normal(jax.random.key(1), (B, 9, 32)) * 0.1
    tags = jax.random.uniform(jax.random.key(2), (B, 10))
    recs = beam_decode_span_records(
        params, cfg, enc, tags, beam_size=5, start_id=V - 2,
        end_id=V - 1, max_steps=12, span=4)
    kw = dict(start_id=V - 2, end_id=V - 1, seq_len=13)
    _finite_cmp(replay_beam_records(recs, **kw),
                replay_beam_records_scan(recs, **kw))
