"""Micro-batching serving engine (serve/engine.py).

Bucket-padded batched serving must return exactly the captions the
single-image path returns (rows are independent through BN-eval encoders,
the adaptive pool, and the fixed-shape beam engine), and the async front
must actually coalesce concurrent requests into one device call.
"""

from concurrent.futures import Future

import numpy as np
import pytest

import jax

from indonesian_image_captioning_tpu.core.config import (ModelConfig,
                                                         TaggerConfig)
from indonesian_image_captioning_tpu.models import decoders, encoders
from indonesian_image_captioning_tpu.serve import CaptionEngine, ServeConfig


def _tiny_word_map(vocab=40):
    wm = {"<pad>": 0}
    for i in range(1, vocab - 3):
        wm[f"w{i}"] = i
    wm["<unk>"], wm["<start>"], wm["<end>"] = vocab - 3, vocab - 2, vocab - 1
    return wm


@pytest.fixture(scope="module")
def engine_parts():
    cfg = ModelConfig(model_type="attention_scn", vocab_size=40,
                      embed_dim=16, attention_dim=16, decoder_dim=16,
                      factored_dim=8, semantic_dim=8, enc_image_size=2,
                      max_caption_len=10, encoder_arch="resnet50")
    params = decoders.init_decoder(jax.random.key(0), cfg)
    enc_p, enc_s = encoders.init_encoder_caption(jax.random.key(1),
                                                 arch="resnet50")
    tag_p, tag_s = encoders.init_encoder_tagger(
        jax.random.key(2), TaggerConfig(semantic_size=cfg.semantic_dim),
        arch="resnet50")
    state = {"params": params, "encoder": enc_p, "encoder_stats": enc_s,
             "tagger": tag_p, "tagger_stats": tag_s}
    images = np.asarray(
        jax.random.randint(jax.random.key(3), (5, 3, 64, 64), 0, 256),
        np.uint8)
    return cfg, state, _tiny_word_map(), images


def test_bucketed_batch_matches_single_image(engine_parts):
    cfg, state, wm, images = engine_parts
    eng = CaptionEngine(state, cfg, wm,
                        ServeConfig(batch_buckets=(1, 2, 8), beam_size=3))
    singles = [eng.caption_batch(images[i:i + 1])[0] for i in range(5)]
    assert all(isinstance(c, str) and c for c in singles)
    eng.stats.batches.clear()
    batched = eng.caption_batch(images)      # 5 -> one padded bucket-8 call
    assert batched == singles
    assert eng.stats.batches == [5]


def test_oversize_batch_splits_across_buckets(engine_parts):
    cfg, state, wm, images = engine_parts
    eng = CaptionEngine(state, cfg, wm,
                        ServeConfig(batch_buckets=(1, 2), beam_size=3))
    caps = eng.caption_batch(images)         # 5 -> 2 + 2 + 1
    assert len(caps) == 5
    assert eng.stats.batches == [2, 2, 1]
    one = eng.caption_batch(images[:1])
    assert one[0] == caps[0]


def test_async_front_coalesces_requests(engine_parts):
    cfg, state, wm, images = engine_parts
    eng = CaptionEngine(state, cfg, wm,
                        ServeConfig(batch_buckets=(1, 2, 8), beam_size=3,
                                    max_wait_ms=500.0))
    expected = eng.caption_batch(images)
    eng.warmup(image_size=64)
    eng.start()
    try:
        futs = [eng.submit(images[i]) for i in range(5)]
        got = [f.result(timeout=120) for f in futs]
    finally:
        eng.stop()
    assert got == expected
    # concurrent submissions must have shared at least one device call
    assert any(b > 1 for b in eng.stats.batches), eng.stats.batches
    assert sum(eng.stats.batches) == 5


def test_rejects_bad_buckets_and_unstarted_submit(engine_parts):
    cfg, state, wm, images = engine_parts
    with pytest.raises(ValueError):
        CaptionEngine(state, cfg, wm, ServeConfig(batch_buckets=(8, 2)))
    eng = CaptionEngine(state, cfg, wm, ServeConfig(batch_buckets=(1,)))
    with pytest.raises(RuntimeError):
        eng.submit(images[0])


def test_submit_rejects_bad_shape_and_loop_survives(engine_parts):
    """A mis-shaped request must not kill the serve loop (ADVICE r2)."""
    cfg, state, wm, images = engine_parts
    eng = CaptionEngine(state, cfg, wm,
                        ServeConfig(batch_buckets=(1, 2), beam_size=3))
    expected = eng.caption_batch(images[:1])[0]
    eng.start()
    try:
        with pytest.raises(ValueError):       # caught at submit time
            eng.submit(np.zeros((64, 64, 3), np.uint8))
        with pytest.raises(ValueError):
            eng.submit(np.zeros((64,), np.uint8))
        # engine still serves after the rejected submissions
        assert eng.submit(images[0]).result(timeout=300) == expected
    finally:
        eng.stop()


def test_stop_fails_pending_futures(engine_parts):
    """stop() must resolve still-queued futures, never strand them."""
    cfg, state, wm, images = engine_parts
    eng = CaptionEngine(state, cfg, wm, ServeConfig(batch_buckets=(1,)))
    eng.start()
    eng._stop.set()                 # freeze the loop before it picks work up
    eng._worker.join()
    eng._worker, worker = None, eng._worker
    fut = Future()
    eng._queue.put((images[0], fut))
    eng._worker = worker            # restore so stop() runs its drain
    eng.stop()
    with pytest.raises(RuntimeError, match="engine stopped"):
        fut.result(timeout=5)


def test_cancelled_future_is_skipped(engine_parts):
    """A request cancelled while queued must not crash the worker or
    strand the rest of its batch (ADVICE r2)."""
    cfg, state, wm, images = engine_parts
    eng = CaptionEngine(state, cfg, wm,
                        ServeConfig(batch_buckets=(1, 2, 8), beam_size=3,
                                    max_wait_ms=500.0))
    expected = eng.caption_batch(images[:2])
    eng.warmup(image_size=64)
    eng.start()
    try:
        futs = [eng.submit(images[i]) for i in range(2)]
        assert futs[0].cancel()     # worker is still coalescing (500 ms)
        assert futs[1].result(timeout=300) == expected[1]
    finally:
        eng.stop()


def test_serve_decode_matches_inference_max_steps(engine_parts):
    """Serve must use BeamConfig's default max_steps (reference cap 51)
    unless ServeConfig overrides it (ADVICE r2)."""
    from indonesian_image_captioning_tpu.core.config import BeamConfig
    cfg, state, wm, _ = engine_parts
    eng = CaptionEngine(state, cfg, wm, ServeConfig(batch_buckets=(1,)))
    assert eng.beam_cfg.max_steps == BeamConfig().max_steps == 51
    eng2 = CaptionEngine(state, cfg, wm,
                         ServeConfig(batch_buckets=(1,), max_steps=7))
    assert eng2.beam_cfg.max_steps == 7
