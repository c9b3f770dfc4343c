"""Fused span kernel (ops/span_pallas.py) vs the step-loop engine.

decode_impl="fused_span" runs S consecutive beam steps per kernel call
(streamed windows + in-kernel selection) and replays the records through
the engine's bookkeeping.  At f32 it must reproduce the XLA beam engine
exactly (same sequences / lengths / pools; scores to reduction-order
tolerance).  Runs in interpret mode on CPU; the TPU compiled path is
exercised by tools/profile_span.py and the verify skill.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from indonesian_image_captioning_tpu.core.config import BeamConfig, ModelConfig
from indonesian_image_captioning_tpu.decode.api import caption_beam_search
from indonesian_image_captioning_tpu.decode.replay import replay_beam_records
from indonesian_image_captioning_tpu.models import decoders
from indonesian_image_captioning_tpu.ops.span_pallas import (
    beam_decode_span_records, pick_span_tile)


def tiny_cfg(vocab=50, model_type="attention_scn", **kw):
    return ModelConfig(model_type=model_type, vocab_size=vocab,
                       embed_dim=10, attention_dim=8, decoder_dim=12,
                       factored_dim=8, semantic_dim=11, encoder_dim=16,
                       enc_image_size=3, **kw)


def run_both(cfg, params, enc, tags, K, T, span, img_tile=8, group=4,
             head_mode="auto"):
    V = cfg.vocab_size
    ref = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                              end_id=V - 1,
                              beam_cfg=BeamConfig(beam_size=K, max_steps=T))
    rec = beam_decode_span_records(
        params, cfg, enc, tags, beam_size=K, start_id=V - 2, end_id=V - 1,
        max_steps=T, span=span, img_tile=img_tile, group=group,
        interpret=True, head_mode=head_mode)
    out = replay_beam_records(rec, start_id=V - 2, end_id=V - 1,
                              seq_len=T + 1)
    return ref, out


def assert_match(ref, out, score_tol=1e-5):
    assert (ref["sequences"] == out["sequences"]).all()
    assert (ref["lengths"] == out["lengths"]).all()
    assert (ref["completed_count"] == out["completed_count"]).all()
    assert jnp.allclose(ref["scores"], out["scores"], atol=score_tol)
    assert (ref["completed_lengths"] == out["completed_lengths"]).all()


def test_pick_span_tile():
    assert pick_span_tile(1024, 5, 4) == 32
    assert pick_span_tile(16, 5, 4) == 16
    assert pick_span_tile(12, 5, 4) is None       # no G with (G*5) % 8 == 0
    assert pick_span_tile(3, 5, 4) is None


def test_span_matches_engine_no_completions():
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(0), cfg)
    enc = jax.random.normal(jax.random.key(1), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(2), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=8, span=4)
    assert_match(ref, out)
    assert int(ref["lengths"][0]) == 9            # ran the full window


def test_span_matches_engine_with_retirement():
    """<end> bias retires beams at differing steps: completion pools,
    alive shrinkage and (in-kernel) score pinning all exercised."""
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(3), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.5)
    enc = jax.random.normal(jax.random.key(4), (8, 9, 16)) * 0.5
    tags = jax.random.uniform(jax.random.key(5), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=10, span=4)
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_span_matches_engine_all_end_early():
    """Strong <end> bias: rows finish before the cap — the driver's
    early-exit while_loop leaves trailing record slots inert."""
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(6), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(6.0)
    enc = jax.random.normal(jax.random.key(7), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(8), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=12, span=4)
    assert int(ref["completed_count"].min()) == 3
    assert_match(ref, out)


def test_span_not_dividing_T():
    """T % span != 0: the final call overshoots and the records are
    sliced back to T before replay."""
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(9), cfg)
    enc = jax.random.normal(jax.random.key(10), (8, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(11), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=7, span=3)
    assert_match(ref, out)


def test_span_one_equals_longer_spans():
    """span=1 (degenerate) and span=5 agree with the engine and each
    other on the same inputs."""
    cfg = tiny_cfg(vocab=64)
    params = decoders.init_decoder(jax.random.key(12), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(13), (8, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(14), (8, 11))
    ref, out1 = run_both(cfg, params, enc, tags, K=5, T=9, span=1)
    _, out5 = run_both(cfg, params, enc, tags, K=5, T=9, span=5)
    assert_match(ref, out1)
    assert_match(ref, out5)


def test_span_beam5_multi_chunk():
    """K=5, two chunks (G=8 over B=16), group m=4."""
    cfg = tiny_cfg(vocab=64)
    params = decoders.init_decoder(jax.random.key(15), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(16), (16, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(17), (16, 11))
    ref, out = run_both(cfg, params, enc, tags, K=5, T=9, span=4,
                        img_tile=8, group=4)
    assert_match(ref, out)


def test_span_through_public_api():
    """decode_impl="fused_span" routes caption_beam_search through the
    span kernel and matches the step engine; ineligible models fall back
    silently."""
    cfg = tiny_cfg(vocab=40, decode_impl="fused_span", decode_span=3)
    params = decoders.init_decoder(jax.random.key(18), cfg)
    enc = jax.random.normal(
        jax.random.key(19), (8, cfg.enc_image_size, cfg.enc_image_size,
                             cfg.encoder_dim)) * 0.3
    tags = jax.random.uniform(jax.random.key(20), (8, cfg.semantic_dim))
    kw = dict(start_id=38, end_id=39,
              beam_cfg=BeamConfig(beam_size=4, max_steps=8))
    out = caption_beam_search(params, cfg, enc, tags, **kw)
    ref = caption_beam_search(
        params, dataclasses.replace(cfg, decode_impl="steps"),
        enc, tags, **kw)
    assert_match(ref, out)

    # pure_scn has no attention stage: fused_span falls back to steps
    cfg2 = tiny_cfg(vocab=40, decode_impl="fused_span",
                    model_type="pure_scn")
    params2 = decoders.init_decoder(jax.random.key(21), cfg2)
    out2 = caption_beam_search(params2, cfg2, enc, tags, **kw)
    ref2 = caption_beam_search(
        params2, dataclasses.replace(cfg2, decode_impl="steps"),
        enc, tags, **kw)
    assert_match(ref2, out2)


def test_span_pure_attention_matches():
    """pure_attention (torch-order LSTM cell) through the span kernel."""
    cfg = tiny_cfg(vocab=48, model_type="pure_attention")
    params = decoders.init_decoder(jax.random.key(23), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.2)
    enc = jax.random.normal(jax.random.key(24), (8, 9, 16)) * 0.4
    tags = jnp.zeros((8, cfg.semantic_dim))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=9, span=4)
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_span_rejects_unsupported_model():
    cfg = ModelConfig(model_type="pure_scn", vocab_size=50)
    params = decoders.init_decoder(jax.random.key(22), cfg)
    enc = jnp.zeros((8, 9, cfg.encoder_dim))
    tags = jnp.zeros((8, cfg.semantic_dim))
    with pytest.raises(NotImplementedError):
        beam_decode_span_records(params, cfg, enc, tags, beam_size=5,
                                 start_id=1, end_id=2, span=4,
                                 interpret=True)


def test_embedding_limbs_exact():
    """The bf16 limb split of an f32 embedding table reconstructs it
    BIT-exactly (8+8+8 of the 24 mantissa bits; disjoint ranges make the
    f32 re-sum exact).  Guards the on-chip corruption found in round 2:
    the TPU's default f32 matmul precision is a single bf16 pass, so the
    in-kernel one-hot lookups of span/full-decode kernels must contract
    against these limbs (or Precision.HIGHEST) — at default precision
    vocab ids >= 256 and f32 embeddings come back bf16-rounded on the
    chip while every CPU test stays green (CPU f32 dots are exact)."""
    import numpy as np

    from indonesian_image_captioning_tpu.ops.step_pallas import (
        embedding_limbs)

    tab = jax.random.normal(jax.random.key(3), (613, 37), jnp.float32)
    tab = tab * jnp.exp(jax.random.normal(jax.random.key(4), (613, 37)))
    limbs = embedding_limbs(tab, jnp.float32)
    assert limbs.shape == (3, 613, 37) and limbs.dtype == jnp.bfloat16
    recon = sum(limbs[i].astype(jnp.float32) for i in range(3))
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(tab))

    # bf16 mode: single limb, values unchanged
    limb1 = embedding_limbs(tab.astype(jnp.bfloat16), jnp.bfloat16)
    assert limb1.shape == (1, 613, 37)
    np.testing.assert_array_equal(
        np.asarray(limb1[0]), np.asarray(tab.astype(jnp.bfloat16)))


def test_span_ids_above_256_roundtrip():
    """Vocab ids >= 256 (not bf16-exact) survive the span kernel's
    one-hot selection chain: seed the fc bias so the argmax words are
    high ids and check the records carry them unchanged."""
    cfg = tiny_cfg(vocab=384, decode_impl="fused_span")
    params = decoders.init_decoder(jax.random.key(30), cfg)
    # push probability mass onto ids not representable in bf16
    for wid in (257, 301, 383):
        params["fc"]["b"] = params["fc"]["b"].at[wid].set(3.0 + wid / 500)
    enc = jax.random.normal(jax.random.key(31), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(32), (8, cfg.semantic_dim))
    records = beam_decode_span_records(
        params, cfg, enc, tags, beam_size=3, start_id=cfg.vocab_size - 2,
        end_id=cfg.vocab_size - 1, max_steps=9, span=3, interpret=True)
    words = set(int(w) for w in records["words"].ravel())
    assert words & {257, 301, 383}, words


def test_auto_ladder_resolution():
    """decode_impl="auto" walks span -> step -> engine by eligibility."""
    from indonesian_image_captioning_tpu.decode.api import resolve_decode_impl

    flag = dict(batch_size=1024, beam_size=5, itemsize=2, num_pixels=196,
                record_alphas=False)
    cfg = ModelConfig(model_type="attention_scn", vocab_size=6763)
    assert resolve_decode_impl(cfg, backend="tpu", **flag)[0] == "fused_span"
    # CPU always resolves to the engine
    assert resolve_decode_impl(cfg, backend="cpu", **flag)[0] == "steps"
    # pure_scn has no attention stage to amortise -> fused_step
    cfg2 = ModelConfig(model_type="pure_scn", vocab_size=6763)
    assert resolve_decode_impl(cfg2, backend="tpu", **flag)[0] == "fused_step"
    # alpha recording is engine-only
    flag_a = dict(flag, record_alphas=True)
    assert resolve_decode_impl(cfg, backend="tpu", **flag_a)[0] == "steps"
    # int8 encoder state composes with fused_step but not the span kernel
    cfg3 = ModelConfig(model_type="attention_scn", vocab_size=6763,
                       enc_quant="int8")
    assert resolve_decode_impl(cfg3, backend="tpu", **flag)[0] == "fused_step"
    # COCO-scale vocab (VERDICT r2 #3, measured 2026-08-20): the tiled
    # big-vocab head IS VMEM-feasible there but loses to the per-step
    # engine (2,411 vs 3,012 captions/s — see pick_span_plan docstring),
    # so the AUTO ladder keeps fused_step at COCO and the tiled head
    # stays an explicit opt-in
    cfg4 = ModelConfig(model_type="attention_scn", vocab_size=38732)
    assert resolve_decode_impl(cfg4, backend="tpu", **flag)[0] == "fused_step"
    from indonesian_image_captioning_tpu.ops.span_pallas import (
        _round_up, pick_span_plan)
    coco_dims = dict(Pp=208, E=2048, A=512, D=512, Emb=512, F4=2048,
                     Vp=_round_up(38732, 128), isz=2)
    assert pick_span_plan(1024, 5, 4, dims=coco_dims) is None
    G, win, head = pick_span_plan(1024, 5, 4, dims=coco_dims,
                                  include_tiled=True)
    assert head == "tiled" and G >= 8
    # f32 tables cannot fit at COCO vocab (emb limbs alone are ~119 MB):
    # even the opt-in tiled head is infeasible there, and the f32 COCO
    # decode falls to the engine
    assert pick_span_plan(1024, 5, 4, include_tiled=True,
                          dims=dict(coco_dims, isz=4)) is None
    assert resolve_decode_impl(
        cfg4, backend="tpu", **dict(flag, itemsize=4))[0] == "steps"
    # explicit impls pass through untouched
    cfg5 = ModelConfig(model_type="attention_scn", vocab_size=6763,
                       decode_impl="steps")
    assert resolve_decode_impl(cfg5, backend="tpu", **flag)[0] == "steps"


def test_span_window_mode_single_bit_exact():
    """window_mode="single" (manual single-buffered window DMA — half the
    window VMEM, enabling larger image tiles) runs the same compute body
    as the Mosaic-streamed default and must emit identical records."""
    import numpy as np

    cfg = tiny_cfg(vocab=300)
    params = decoders.init_decoder(jax.random.key(40), cfg)
    params["fc"]["b"] = params["fc"]["b"].at[299].set(1.5)
    enc = jax.random.normal(jax.random.key(41), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(42), (8, cfg.semantic_dim))
    kw = dict(beam_size=3, start_id=298, end_id=299, max_steps=9, span=3,
              interpret=True)
    a = beam_decode_span_records(params, cfg, enc, tags,
                                 window_mode="stream", **kw)
    b = beam_decode_span_records(params, cfg, enc, tags,
                                 window_mode="single", **kw)
    for k in ("words", "parents", "vals"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_span_tiled_head_matches_resident():
    """head_mode="tiled" (the COCO big-vocab schedule, VERDICT r2 #3) must
    be BIT-IDENTICAL to the full-width resident head — words, parents AND
    vals: the streamed fc tiles land in the same full-width work array, so
    every reduction has the same shape and order.  (An earlier online
    per-tile log-sum-exp variant matched only to ~1e-5, and its per-lane
    ULP differences flipped cross-lane beam near-ties at bf16 on the real
    chip.)  The vocab spans THREE tiles (2x VOCAB_TILE + remainder) so
    cross-tile assembly, id offsets and the remainder slice are all
    exercised."""
    import numpy as np

    from indonesian_image_captioning_tpu.ops.span_pallas import VOCAB_TILE

    V = 2 * VOCAB_TILE + 300          # 8492 -> Vp 8576, tiles 4096/4096/384
    cfg = tiny_cfg(vocab=V)
    params = decoders.init_decoder(jax.random.key(50), cfg)
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(2.0)
    enc = jax.random.normal(jax.random.key(51), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(52), (8, cfg.semantic_dim))
    kw = dict(beam_size=3, start_id=V - 2, end_id=V - 1, max_steps=9,
              span=3, interpret=True)
    a = beam_decode_span_records(params, cfg, enc, tags,
                                 head_mode="resident", **kw)
    b = beam_decode_span_records(params, cfg, enc, tags,
                                 head_mode="tiled", **kw)
    for k in ("words", "parents", "vals"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_span_tiled_head_matches_engine():
    """Tiled-head span decode through the records replay must reproduce
    the XLA beam engine (sequence-exact, scores to tolerance) — including
    beams that pick words from every vocab tile."""
    import numpy as np

    from indonesian_image_captioning_tpu.ops.span_pallas import VOCAB_TILE

    V = VOCAB_TILE + 700
    cfg = tiny_cfg(vocab=V)
    params = decoders.init_decoder(jax.random.key(53), cfg)
    # nudge words on BOTH sides of the tile boundary and <end> so the beam
    # crosses tiles and retires
    params["fc"]["b"] = (params["fc"]["b"]
                         .at[17].set(1.2)
                         .at[VOCAB_TILE + 13].set(1.3)
                         .at[V - 1].set(1.5))
    enc = jax.random.normal(jax.random.key(54), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(55), (8, cfg.semantic_dim))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=10, span=4,
                        head_mode="tiled")
    assert int(ref["completed_count"].sum()) > 0
    picked = set(np.asarray(ref["sequences"]).ravel().tolist())
    assert any(w >= VOCAB_TILE for w in picked)   # crossed a tile boundary
    assert_match(ref, out)
