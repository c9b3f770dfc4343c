"""High-level decode entry points tying decoders to the beam engine.

Mirrors the reference's per-decoder ``sample()`` methods (e.g.
models/decoders/attention_scn.py:160-296) with one batched, jitted function.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax

from ..core.config import BeamConfig, ModelConfig
from ..models import decoders
from .beam import beam_search


def resolve_decode_impl(cfg: ModelConfig, *, batch_size: int,
                        beam_size: int, itemsize: int, num_pixels: int,
                        record_alphas: bool, backend: str):
    """Resolve cfg.decode_impl to a concrete engine for this shape.

    Returns (impl, fusable, step_fusable, span_ok).  "auto" walks the
    kernel ladder, best first (all exact; measured in BASELINE.md):

    * "fused_span" divides the per-step encoder DMA by S=decode_span
      (+6-10% over fused_step at every measured shape);
    * "fused_step" fuses one whole beam step (+27-109% over the step
      engine);
    * "steps" — the lax.while_loop engine, the only rung on CPU (the
      kernels would run in interpret mode there).

    Each rung has eligibility limits (model family, legal image tile,
    VMEM for the in-kernel embedding+fc tables, alpha recording, int8
    encoder state) — resolution falls down the ladder when a rung
    doesn't apply.  Pure function of static shapes so the ladder is
    unit-testable without a TPU (tests/test_span_fused.py)."""
    from ..ops.attention_pallas import _round_up
    from ..ops.decode_pallas import pick_img_tile
    from ..ops.span_pallas import pick_span_plan
    from ..ops.step_pallas import dims_for_cfg, pick_step_tile

    fusable = (cfg.model_type == "attention_scn" and not record_alphas
               and pick_img_tile(batch_size, beam_size) is not None)
    quant = cfg.enc_quant == "int8"
    if cfg.uses_attention:
        step_tile_ok = pick_step_tile(
            batch_size, beam_size,
            dims=dims_for_cfg(cfg, itemsize, quant=quant,
                              num_pixels=num_pixels)) is not None
    else:
        # pure_scn chunks (B*K) rows directly — no image-tile constraint
        step_tile_ok = pick_step_tile(
            batch_size * beam_size, 1, 256,
            dims=dims_for_cfg(cfg, itemsize)) is not None
    step_fusable = (not record_alphas) and step_tile_ok

    span_dims = dict(
        Pp=_round_up(num_pixels, 16), E=cfg.encoder_dim,
        A=cfg.attention_dim, D=cfg.decoder_dim, Emb=cfg.embed_dim,
        F4=4 * cfg.factored_dim, Vp=_round_up(cfg.vocab_size, 128),
        isz=itemsize)
    span_ok = (cfg.model_type in ("attention_scn", "pure_attention")
               and not record_alphas and not quant
               and pick_span_plan(batch_size, beam_size, cfg.decode_span,
                                  dims=span_dims) is not None)

    impl = cfg.decode_impl
    if impl == "auto":
        if backend != "cpu" and span_ok:
            impl = "fused_span"
        elif backend != "cpu" and step_fusable:
            impl = "fused_step"
        else:
            impl = "steps"
    return impl, fusable, step_fusable, span_ok


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_cfg", "start_id", "end_id",
                              "record_alphas"))
def caption_beam_search(params, cfg: ModelConfig, enc, tags, *,
                        start_id: int, end_id: int,
                        beam_cfg: BeamConfig = BeamConfig(),
                        record_alphas: bool = False) -> Dict[str, jax.Array]:
    """Beam-decode a batch of encoded images.

    enc:  (B, H, W, E) or (B, P, E) encoder output
    tags: (B, S) tag probabilities (ignored by pure_attention; pass zeros)
    Returns dict with sequences (B, L), lengths (B,), scores (B,), and
    (optionally) per-step attention `alpha` (B, L, P).
    """
    enc_flat = decoders.flatten_encoding(enc, cfg.encoder_dim)
    impl, fusable, step_fusable, span_ok = resolve_decode_impl(
        cfg, batch_size=enc_flat.shape[0], beam_size=beam_cfg.beam_size,
        itemsize=enc_flat.dtype.itemsize, num_pixels=enc_flat.shape[1],
        record_alphas=record_alphas,
        backend=jax.default_backend())
    if impl == "fused_span":
        if span_ok:
            from ..ops.span_pallas import beam_decode_span_records
            from .replay import replay_beam_records
            records = beam_decode_span_records(
                params, cfg, enc_flat, tags, beam_size=beam_cfg.beam_size,
                start_id=start_id, end_id=end_id,
                max_steps=beam_cfg.max_steps, span=cfg.decode_span)
            return replay_beam_records(
                records, start_id=start_id, end_id=end_id,
                seq_len=beam_cfg.max_steps + 1,
                length_penalty=beam_cfg.length_penalty)
        # ineligible (other families, alphas, int8 state, no legal
        # tile): next rung — the fused per-step kernel, then the engine
        if jax.default_backend() != "cpu":
            impl = "fused_step"
    if impl == "fused_step" and step_fusable:
        init_state_fn, step_fn = decoders.make_beam_step(
            params, cfg, enc_flat, tags, fused_step=True)
        return beam_search(
            step_fn,
            init_state_fn(beam_cfg.beam_size),
            batch_size=enc_flat.shape[0],
            beam_size=beam_cfg.beam_size,
            vocab_size=cfg.vocab_size,
            start_id=start_id,
            end_id=end_id,
            max_steps=beam_cfg.max_steps,
            seq_len=beam_cfg.max_steps + 1,
            emit_specs={},
            length_penalty=beam_cfg.length_penalty,
            topk_backend=cfg.topk_backend,
        )
    if impl == "fused" and fusable:
        from ..ops.decode_pallas import beam_decode_records
        from .replay import replay_beam_records
        records = beam_decode_records(
            params, cfg, enc_flat, tags, beam_size=beam_cfg.beam_size,
            start_id=start_id, end_id=end_id, max_steps=beam_cfg.max_steps)
        return replay_beam_records(
            records, start_id=start_id, end_id=end_id,
            seq_len=beam_cfg.max_steps + 1,
            length_penalty=beam_cfg.length_penalty)
    init_state_fn, step_fn = decoders.make_beam_step(params, cfg, enc_flat, tags)
    emit_specs = {}
    if record_alphas and cfg.uses_attention:
        emit_specs["alpha"] = (enc_flat.shape[1],)
    return beam_search(
        step_fn,
        init_state_fn(beam_cfg.beam_size),
        batch_size=enc_flat.shape[0],
        beam_size=beam_cfg.beam_size,
        vocab_size=cfg.vocab_size,
        start_id=start_id,
        end_id=end_id,
        max_steps=beam_cfg.max_steps,
        seq_len=beam_cfg.max_steps + 1,
        emit_specs=emit_specs,
        length_penalty=beam_cfg.length_penalty,
        topk_backend=cfg.topk_backend,
    )


def sequences_to_tokens(sequences, lengths, rev_word_map,
                        skip_ids=()) -> list[list[str]]:
    """Host-side detokenisation skipping special ids (inference.py:156-158)."""
    out = []
    seqs = jax.device_get(sequences)
    lens = jax.device_get(lengths)
    for seq, n in zip(seqs, lens):
        out.append([rev_word_map[int(w)] for w in seq[:int(n)]
                    if int(w) not in skip_ids])
    return out
