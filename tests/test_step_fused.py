"""Fused per-step kernel (ops/step_pallas.py) vs the step-loop engine.

decode_impl="fused_step" runs attention + f_beta + SCN cell + vocab head +
per-lane top-K as ONE Pallas kernel per decode step.  At f32 it must
reproduce the XLA step engine bit-for-beam (same sequences / lengths /
completion pools; scores to summation-order tolerance — the kernel scores
candidates as raw-logit − logsumexp where log_softmax associates the
subtraction differently).  Runs in interpret mode on the CPU mesh; the TPU
compiled path is exercised by tools/profile_decode.py and the verify skill.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from indonesian_image_captioning_tpu.core.config import BeamConfig, ModelConfig
from indonesian_image_captioning_tpu.decode.api import caption_beam_search
from indonesian_image_captioning_tpu.models import decoders
from indonesian_image_captioning_tpu.ops.step_pallas import pick_step_tile


def tiny_cfg(vocab=50, model_type="attention_scn", **kw):
    return ModelConfig(model_type=model_type, vocab_size=vocab,
                       embed_dim=10, attention_dim=8, decoder_dim=12,
                       factored_dim=8, semantic_dim=11, encoder_dim=16,
                       enc_image_size=3, **kw)


def run_both(cfg, params, enc, tags, K, T):
    V = cfg.vocab_size
    kw = dict(start_id=V - 2, end_id=V - 1,
              beam_cfg=BeamConfig(beam_size=K, max_steps=T))
    ref = caption_beam_search(
        params, dataclasses.replace(cfg, decode_impl="steps"), enc, tags, **kw)
    out = caption_beam_search(
        params, dataclasses.replace(cfg, decode_impl="fused_step"), enc, tags, **kw)
    return ref, out


def assert_match(ref, out, score_tol=1e-5):
    assert (ref["sequences"] == out["sequences"]).all()
    assert (ref["lengths"] == out["lengths"]).all()
    assert (ref["completed_count"] == out["completed_count"]).all()
    assert jnp.allclose(ref["scores"], out["scores"], atol=score_tol)
    assert (ref["completed_lengths"] == out["completed_lengths"]).all()


def test_pick_step_tile():
    assert pick_step_tile(1024, 5) == 32
    assert pick_step_tile(8, 3) == 8          # G*K = 24 % 8 == 0
    assert pick_step_tile(1, 5) is None       # single-image inference
    assert pick_step_tile(6, 5) is None


def test_pick_step_tile_vmem_budget():
    """f32 encoder state / COCO-scale vocab must shrink the image tile so
    the kernel's scoped VMEM fits the chip (the e2e f32 OOM regression:
    G=32 f32 wanted 202 MB of the 128 MB VMEM)."""
    from indonesian_image_captioning_tpu.ops.step_pallas import dims_for_cfg

    flagship = ModelConfig(model_type="attention_scn", vocab_size=6763)
    bf16 = dims_for_cfg(flagship, 2)
    f32 = dims_for_cfg(flagship, 4)
    g_bf16 = pick_step_tile(1024, 5, dims=bf16)
    g_f32 = pick_step_tile(1024, 5, dims=f32)
    assert g_bf16 == 32                       # the measured 5799-cps tile
    assert g_f32 is not None and g_f32 < 32   # f32 halves the budget
    coco = dims_for_cfg(dataclasses.replace(flagship, vocab_size=38732), 2)
    g_coco = pick_step_tile(1024, 5, dims=coco)
    assert g_coco is not None and g_coco <= g_bf16


def test_dims_for_cfg_uses_actual_pixel_count():
    """The decode-api gate must budget for the encoding actually being
    decoded, not cfg.num_pixels: a caller feeding a larger feature map
    (e.g. 28x28 instead of 14x14) quadruples the per-image encoder-state
    VMEM, so the same batch needs a smaller image tile."""
    from indonesian_image_captioning_tpu.ops.step_pallas import dims_for_cfg

    flagship = ModelConfig(model_type="attention_scn", vocab_size=6763)
    default = dims_for_cfg(flagship, 4)
    big = dims_for_cfg(flagship, 4, num_pixels=28 * 28)
    assert default["Pp"] < big["Pp"]
    g_default = pick_step_tile(1024, 5, dims=default)
    g_big = pick_step_tile(1024, 5, dims=big)
    assert g_big is None or g_big < g_default


def test_fused_step_matches_engine_no_completions():
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(0), cfg)
    enc = jax.random.normal(jax.random.key(1), (8, 9, 16)) * 0.3
    tags = jax.random.uniform(jax.random.key(2), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=8)
    assert_match(ref, out)
    assert int(ref["lengths"][0]) == 9        # ran the full window


def test_fused_step_matches_engine_with_retirement():
    """Bias the head toward <end> so beams retire at differing steps,
    exercising the pools, alive shrinkage and row freezing."""
    cfg = tiny_cfg()
    params = decoders.init_decoder(jax.random.key(3), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.5)
    enc = jax.random.normal(jax.random.key(4), (8, 9, 16)) * 0.5
    tags = jax.random.uniform(jax.random.key(5), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=10)
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_fused_step_beam5_multi_chunk():
    """K=5 (bench beam), two G=8 chunks over B=16."""
    cfg = tiny_cfg(vocab=64)
    params = decoders.init_decoder(jax.random.key(9), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(10), (16, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(11), (16, 11))
    ref, out = run_both(cfg, params, enc, tags, K=5, T=9)
    assert_match(ref, out)


def test_fused_step_untilable_batch_falls_back():
    """B=1 K=5 has no legal tile: explicit "fused_step" must fall back to
    the step engine (this is the single-image inference CLI shape)."""
    cfg = tiny_cfg(decode_impl="fused_step")
    params = decoders.init_decoder(jax.random.key(12), cfg)
    enc = jax.random.normal(jax.random.key(13), (1, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(14), (1, 11))
    V = cfg.vocab_size
    out = caption_beam_search(params, cfg, enc, tags, start_id=V - 2,
                              end_id=V - 1,
                              beam_cfg=BeamConfig(beam_size=5, max_steps=8))
    ref = caption_beam_search(params, dataclasses.replace(cfg, decode_impl="steps"), enc,
                              tags, start_id=V - 2, end_id=V - 1,
                              beam_cfg=BeamConfig(beam_size=5, max_steps=8))
    assert (ref["sequences"] == out["sequences"]).all()


def test_fused_step_int8_matches_steps_int8():
    """enc_quant="int8" + fused_step must reproduce the step engine's own
    int8 path (attend_quant_ref quantized-math oracle) at f32 — same
    dequant/fold order, so sequences match exactly."""
    cfg = tiny_cfg(enc_quant="int8")
    params = decoders.init_decoder(jax.random.key(20), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(21), (8, 9, 16)) * 0.5
    tags = jax.random.uniform(jax.random.key(22), (8, 11))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=10)
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_fused_step_pure_attention_matches():
    """pure_attention: attention + torch-order LSTM cell in the kernel
    (one concat matmul, lstm_step's add association — f32 bit-exact)."""
    cfg = tiny_cfg(model_type="pure_attention")
    params = decoders.init_decoder(jax.random.key(30), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(31), (8, 9, 16)) * 0.5
    tags = jnp.zeros((8, cfg.semantic_dim))
    ref, out = run_both(cfg, params, enc, tags, K=3, T=10)
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_fused_step_pure_scn_matches():
    """pure_scn: no attention stage — the kernel chunks (B*K) rows
    directly and fuses cell + head + per-lane top-K."""
    cfg = tiny_cfg(model_type="pure_scn")
    params = decoders.init_decoder(jax.random.key(40), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.2)
    enc = jax.random.normal(jax.random.key(41), (8, 9, 16)) * 0.5
    tags = jax.random.uniform(jax.random.key(42), (8, cfg.semantic_dim))
    ref, out = run_both(cfg, params, enc, tags, K=4, T=10)  # R=32 rows
    assert int(ref["completed_count"].sum()) > 0
    assert_match(ref, out)


def test_fused_step_under_shard_map_matches_unsharded():
    """Data-parallel decode (the eval_caption mesh path): shard_map over
    the 8-device CPU mesh with the fused kernel engaged PER SHARD (local
    B=2, K=4 -> G=2 tile) must reproduce the unsharded steps engine."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from indonesian_image_captioning_tpu.core.meshes import get_shard_map
    shard_map, flag = get_shard_map()

    cfg = tiny_cfg(vocab=40, decode_impl="fused_step")
    params = decoders.init_decoder(jax.random.key(50), cfg)
    V = cfg.vocab_size
    params["fc"]["b"] = params["fc"]["b"].at[V - 1].set(1.0)
    enc = jax.random.normal(jax.random.key(51), (16, 9, 16)) * 0.4
    tags = jax.random.uniform(jax.random.key(52), (16, 11))
    kw = dict(start_id=V - 2, end_id=V - 1,
              beam_cfg=BeamConfig(beam_size=4, max_steps=9))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))

    def _beam(p, e, t):
        out = caption_beam_search(p, cfg, e, t, **kw)
        return out["sequences"], out["lengths"]

    sharded = jax.jit(shard_map(
        _beam, mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P("data")), **{flag: False}))
    enc_s = jax.device_put(enc, NamedSharding(mesh, P("data", None, None)))
    tags_s = jax.device_put(tags, NamedSharding(mesh, P("data", None)))
    seqs, lens = sharded(params, enc_s, tags_s)

    ref = caption_beam_search(
        params, dataclasses.replace(cfg, decode_impl="steps"), enc, tags,
        **kw)
    assert (jax.device_get(seqs) == jax.device_get(ref["sequences"])).all()
    assert (jax.device_get(lens) == jax.device_get(ref["lengths"])).all()


def test_fused_step_manual_pipeline_bit_exact():
    """pipeline="manual" (explicit double-buffered make_async_copy DMA of
    the encoder-state windows) must be bit-identical to the automatic
    Mosaic window pipeline — the compute body is shared; only the DMA
    schedule differs."""
    from indonesian_image_captioning_tpu.models import attention as attn
    from indonesian_image_captioning_tpu.models import scn_cell
    from indonesian_image_captioning_tpu.ops.attention_pallas import pad_pixels
    from indonesian_image_captioning_tpu.ops.step_pallas import (
        fused_decode_step, pack_step_weights)

    cfg = tiny_cfg(vocab=64)
    params = decoders.init_decoder(jax.random.key(60), cfg)
    B, K = 16, 4                              # two G=8 chunks
    R = B * K
    P = cfg.num_pixels
    F4 = 4 * cfg.factored_dim
    dt = jnp.float32
    enc = jax.random.normal(jax.random.key(61), (B, P, cfg.encoder_dim)) * 0.3
    ea = attn.precompute(params["attention"], enc)
    tags = jax.random.uniform(jax.random.key(62), (B, cfg.semantic_dim))
    sx, sh = scn_cell.semantic_projections(params["decode_step"], tags)
    argv = (pack_step_weights(params, cfg, dt), pad_pixels(enc),
            pad_pixels(ea),
            jax.random.normal(jax.random.key(63), (R, cfg.embed_dim)) * 0.3,
            jax.random.normal(jax.random.key(64), (R, cfg.decoder_dim)) * 0.3,
            jnp.zeros((R, cfg.decoder_dim), dt),
            jnp.repeat(sx.reshape(B, F4), K, axis=0),
            jnp.repeat(sh.reshape(B, F4), K, axis=0))
    kw = dict(num_pixels=P, img_tile=8, vocab_size=cfg.vocab_size)
    auto = fused_decode_step(*argv, pipeline="auto", **kw)
    man = fused_decode_step(*argv, pipeline="manual", **kw)
    for name, x, y in zip(("topv", "topi", "lse", "h", "c"), auto, man):
        assert jnp.array_equal(x, y), name


def test_step_pipeline_config_reaches_kernel():
    """ModelConfig.step_pipeline="manual" routes the public decode through
    the explicit-DMA kernel variant and matches "auto" exactly."""
    cfg = tiny_cfg(vocab=40, decode_impl="fused_step")
    params = decoders.init_decoder(jax.random.key(70), cfg)
    enc = jax.random.normal(
        jax.random.key(71), (8, cfg.enc_image_size, cfg.enc_image_size,
                             cfg.encoder_dim)) * 0.3
    tags = jax.random.uniform(jax.random.key(72), (8, cfg.semantic_dim))
    kw = dict(start_id=38, end_id=39, beam_cfg=BeamConfig(beam_size=4,
                                                          max_steps=6))
    a = caption_beam_search(params, cfg, enc, tags, **kw)
    m = caption_beam_search(
        params, dataclasses.replace(cfg, step_pipeline="manual"),
        enc, tags, **kw)
    for k in ("sequences", "lengths", "completed_count", "scores"):
        assert jnp.array_equal(a[k], m[k]), k


def test_fused_step_rejects_unknown_model():
    cfg = dataclasses.replace(
        ModelConfig(model_type="pure_scn", vocab_size=50))
    object.__setattr__(cfg, "model_type", "bogus")
    params_cfg = ModelConfig(model_type="pure_scn", vocab_size=50)
    params = decoders.init_decoder(jax.random.key(0), params_cfg)
    enc = jnp.zeros((8, 196, 2048))
    tags = jnp.zeros((8, 1000))
    with pytest.raises(NotImplementedError):
        decoders.make_beam_step(params, cfg, enc, tags, fused_step=True)
