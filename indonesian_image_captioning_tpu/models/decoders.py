"""Caption decoders: PureSCN, PureAttention, AttentionSCN.

Reference behaviour being reproduced (not ported):
  * models/decoders/pure_scn.py:13-249       — embed -> SCNCell -> fc
  * models/decoders/pure_attention.py:13-281 — show-attend-tell (+ f_beta gate)
  * models/decoders/attention_scn.py:14-296  — attention + SCNCell union

TPU-first redesign of the training forward:
  * The reference sorts the batch by caption length and shrinks the active
    batch every timestep (attention_scn.py:117-156) — dynamic shapes that
    cannot jit.  Here the forward is a fixed-shape ``lax.scan`` over
    T = max_caption_len - 1 steps with a validity mask; the masked loss in
    ops/losses.py reproduces pack_padded_sequence's mean-over-valid-tokens
    normalisation exactly.
  * Loop invariants are hoisted: the SCN semantic projections and the
    attention encoder projection are computed once per batch; the word
    embedding slice of the SCN input path is projected for ALL timesteps in
    one MXU matmul before the scan (``x @ Wia`` where x is the embedding
    part of the concatenated input).
  * All state lives in (batch, feature) arrays; beam search reuses the same
    step math with a (batch, beam) leading shape.

Parameters are nested dicts whose keys mirror the reference module names
(embedding / decode_step / init_h / init_c / f_beta / fc / attention) so the
torch checkpoint converters are direct.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from . import attention as attn
from . import lstm_cell, scn_cell
from .layers import dropout, init_linear, linear, uniform

MODEL_TYPES = ("pure_scn", "pure_attention", "attention_scn")
# Registry parity with reference utils/loader.py:5-6.
SCN_BASED_MODELS = frozenset({"pure_scn", "attention_scn"})
ATT_BASED_MODELS = frozenset({"pure_attention", "attention_scn"})


@jax.custom_vjp
def embed_lookup(table, ids):
    """Embedding gather with a matmul-backward.

    Forward is the plain row gather.  The DEFAULT backward of a gather is
    a scatter-add over the (B*T) duplicate-heavy caption ids, which
    XLA:TPU lowers to a deterministic SORT of the updates — profiled at
    242 ms/step at batch 1024, 48% of the whole decoder train step.  The
    custom backward contracts the one-hot of the ids against the
    cotangent on the MXU instead (~2 ms): dtable = one_hot(ids)^T @ g.
    """
    return table[ids]


def _embed_lookup_fwd(table, ids):
    return table[ids], (ids, jnp.zeros((table.shape[0], 0), table.dtype))


def _embed_lookup_bwd(res, g):
    ids, proto = res
    gf = g.reshape(-1, g.shape[-1])
    V = proto.shape[0]
    N = gf.shape[0]
    ids_flat = ids.reshape(-1)
    if N * V <= (1 << 30):
        oh = jax.nn.one_hot(ids_flat, V, dtype=gf.dtype)
        dtable = jax.lax.dot_general(
            oh, gf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dtable.astype(proto.dtype), None
    # Very-large one-hot (>2^30 elements — COCO V=38,732 at b1024 would be
    # a 4 GB bf16 tensor): build it in vocab tiles instead, mirroring the
    # chunked CE head (ops/vocab_head.py).  Each table tile is produced by
    # exactly one MXU contraction, so there is no f32 accumulator and the
    # result is bitwise the single-shot contraction per row block.
    # Threshold is deliberately high: below it the single-shot contraction
    # wins in-step (measured: forcing the tiled loop at COCO b512 under
    # the dense head's memory pressure cost 2.6 s/step vs 111 ms).
    tile = 2048
    nt = -(-V // tile)
    D = gf.shape[-1]

    def body(i, dtab):
        col = i * tile + jax.lax.iota(jnp.int32, tile)
        oh = (ids_flat[:, None] == col[None, :]).astype(gf.dtype)
        dt_t = jax.lax.dot_general(
            oh, gf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.dynamic_update_slice(
            dtab, dt_t.astype(proto.dtype), (i * tile, 0))

    dtab = jnp.zeros((nt * tile, D), proto.dtype)
    dtab = jax.lax.fori_loop(0, nt, body, dtab)
    return dtab[:V], None


embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


@functools.lru_cache(maxsize=2)
def _scatter_lookup(interpret: bool):
    """embed_lookup variant whose BACKWARD is the Pallas VMEM
    scatter-accumulate kernel (ops/embed_grad_pallas.py): one pass over
    the cotangent rows, no (N, V) one-hot.  The one-hot contraction
    above measured 33.0 ms standalone at flagship b1024 — 5.6% of its
    roofline, the largest outside-kernel train-step component after the
    chunked CE head (tools/exp_head_floor.py)."""
    @jax.custom_vjp
    def f(table, ids):
        return table[ids]

    def fwd(table, ids):
        return table[ids], (ids, jnp.zeros((table.shape[0], 0),
                                           table.dtype))

    def bwd(res, g):
        from ..ops.embed_grad_pallas import embed_grad_scatter
        ids, proto = res
        gf = g.reshape(-1, g.shape[-1])
        d = embed_grad_scatter(ids.reshape(-1).astype(jnp.int32), gf,
                               vocab=proto.shape[0], interpret=interpret)
        return d.astype(proto.dtype), None

    f.defvjp(fwd, bwd)
    return f


def embed_lookup_kernel(table, ids, interpret: bool = False):
    return _scatter_lookup(bool(interpret))(table, ids)


def resolve_embed_grad_impl(cfg: ModelConfig, batch: int,
                            spmd_mesh=None) -> str:
    """cfg.embed_grad_impl "auto" -> "onehot".

    Measured verdict (2026-08-21, b1024 flagship bf16 in-step A/B):
    onehot 141.5 ms/step vs pallas 142.7 — the one-hot contraction
    FUSES in step context (the 33 ms standalone attribution was a
    fusion-context artifact), so the VMEM-accumulator kernel buys
    nothing and stays opt-in ("pallas").  Mesh programs must keep
    one-hot regardless: the kernel has no GSPMD partitioning rules (the
    TP builder additionally pins "onehot" since its embedding table is
    vocab-sharded)."""
    impl = getattr(cfg, "embed_grad_impl", "auto")
    if impl != "auto":
        if impl == "pallas" and spmd_mesh is not None:
            return "onehot"
        return impl
    return "onehot"


def cell_input_dim(cfg: ModelConfig) -> int:
    """SCN/LSTM cell input width: embedding alone for pure_scn, embedding
    concat attention-weighted encoding otherwise (attention_scn.py:45-46)."""
    return cfg.embed_dim + (cfg.encoder_dim if cfg.uses_attention else 0)


def init_decoder(key, cfg: ModelConfig, dtype=jnp.float32):
    if cfg.model_type not in MODEL_TYPES:
        raise ValueError(f"unknown model_type {cfg.model_type!r}")
    if cfg.vocab_size <= 0:
        raise ValueError("cfg.vocab_size must be set before init")
    ks = jax.random.split(key, 8)
    params = {
        # init_weights parity: embedding U(+-0.1), fc U(+-0.1)/0 bias
        # (attention_scn.py:58-63).
        "embedding": uniform(ks[0], (cfg.vocab_size, cfg.embed_dim), 0.1, dtype),
        "init_h": init_linear(ks[1], cfg.encoder_dim, cfg.decoder_dim, dtype),
        "init_c": init_linear(ks[2], cfg.encoder_dim, cfg.decoder_dim, dtype),
        "fc": {
            "w": uniform(ks[3], (cfg.decoder_dim, cfg.vocab_size), 0.1, dtype),
            "b": jnp.zeros((cfg.vocab_size,), dtype),
        },
    }
    if cfg.uses_attention:
        params["attention"] = attn.init_attention(
            ks[4], cfg.encoder_dim, cfg.decoder_dim, cfg.attention_dim, dtype)
        params["f_beta"] = init_linear(
            ks[5], cfg.decoder_dim, cfg.encoder_dim, dtype)
    if cfg.model_type in SCN_BASED_MODELS:
        params["decode_step"] = scn_cell.init_scn_cell(
            ks[6], cell_input_dim(cfg), cfg.decoder_dim, cfg.semantic_dim,
            cfg.factored_dim, dtype)
    else:
        params["decode_step"] = lstm_cell.init_lstm_cell(
            ks[6], cell_input_dim(cfg), cfg.decoder_dim, dtype)
    return params


def flatten_encoding(enc, encoder_dim: int):
    """(B, H, W, E) or (B, P, E) -> (B, P, E) (attention_scn.py:113)."""
    return enc.reshape(enc.shape[0], -1, encoder_dim)


def init_hidden_state(params, enc_flat):
    """Mean image feature -> init_h/init_c linears (attention_scn.py:82-93).
    enc_flat: (..., P, E) -> (h, c) each (..., D)."""
    mean = enc_flat.mean(axis=-2)
    return linear(params["init_h"], mean), linear(params["init_c"], mean)


def _split_wx(params, cfg: ModelConfig):
    """Split the SCN input weight into embedding / awe slabs so the
    embedding half can be projected for all timesteps outside the loop."""
    w_x = params["decode_step"]["w_x"]
    return w_x[: cfg.embed_dim], w_x[cfg.embed_dim:]


def _gate_factor(y):
    """(..., 4F) -> (..., 4, F)."""
    return y.reshape(*y.shape[:-1], 4, y.shape[-1] // 4)


def resolve_train_scan_impl(cfg: ModelConfig, batch: int, dtype,
                            enc_grad: bool, spmd_mesh=None) -> str:
    """Resolve cfg.train_scan_impl ("auto" -> "fused" on TPU where the
    fused kernel pair is eligible, else "xla").  enc_grad=True (the
    fine-tune-encoder path) always forces XLA: the fused backward does
    not produce a d_enc cotangent.  With an SPMD mesh the kernel runs
    per shard (shard_map island), so feasibility is judged on the
    PER-SHARD batch."""
    impl = cfg.train_scan_impl
    if enc_grad:
        return "xla"
    if spmd_mesh is not None:
        from ..core.meshes import DATA_AXIS
        batch = batch // spmd_mesh.shape[DATA_AXIS]
    if impl == "auto":
        from ..ops import train_pallas
        if (jax.default_backend() != "cpu"
                and train_pallas.feasible(cfg, batch, dtype,
                                          span=cfg.train_span)):
            return "fused"
        return "xla"
    return impl


def teacher_forcing(params, cfg: ModelConfig, enc, tags, caps,
                    caplens, *, dropout_rng: Optional[jax.Array] = None,
                    train: bool = False, enc_grad: bool = False,
                    spmd_mesh=None, return_hidden: bool = False):
    """Teacher-forced forward over the whole caption batch.

    enc:     (B, H, W, E) or (B, P, E) encoder output
    tags:    (B, S) semantic tag vector (ignored for pure_attention)
    caps:    (B, L) int token ids, L = cfg.max_caption_len
    caplens: (B,)   caption lengths including <start>/<end>

    Returns dict with:
      predictions: (B, T, V) logits, T = L - 1
      alphas:      (B, T, P) attention weights (attention models) or None
      mask:        (B, T) float validity mask (t < caplen - 1)

    return_hidden=True: skip the dense vocab head and return
    {"hidden": (B, T, D) post-dropout hidden states, ...} instead of
    predictions — the input contract of the chunked CE head
    (ops/vocab_head.py), which never materialises the (B, T, V) logits.

    Equivalent to reference AttentionSCN.forward (attention_scn.py:95-158)
    with masking replacing the length-sort + shrinking batch; outputs are in
    the ORIGINAL batch order (no sort_ind to undo).
    """
    cell = params["decode_step"]
    is_scn = cfg.model_type in SCN_BASED_MODELS
    T = cfg.max_caption_len - 1
    enc_flat = flatten_encoding(enc, cfg.encoder_dim)
    if resolve_embed_grad_impl(cfg, enc_flat.shape[0],
                               spmd_mesh) == "pallas":
        emb = embed_lookup_kernel(params["embedding"], caps[:, :T],
                                  interpret=jax.default_backend() == "cpu")
    else:
        emb = embed_lookup(params["embedding"], caps[:, :T])  # (B, T, Emb)
    ts = jnp.arange(T)

    impl = resolve_train_scan_impl(cfg, enc_flat.shape[0], enc_flat.dtype,
                                   enc_grad, spmd_mesh=spmd_mesh)
    if impl == "fused":
        from ..ops import train_pallas

        def run_fused(p, e, tg, em):
            return train_pallas.fused_teacher_forcing_scan(
                p, cfg, e, tg, em, span=cfg.train_span)

        if spmd_mesh is not None:
            # shard_map ISLAND inside the GSPMD-partitioned step: the
            # fused kernel pair has no GSPMD partitioning rules, but its
            # batch dimension is embarrassingly data-parallel — each
            # shard scans its local rows with replicated weights (the
            # standard pattern for composing Pallas kernels with pjit,
            # e.g. splash attention).  Autodiff through the island psums
            # the replicated-weight cotangents over the data axis
            # automatically; everything outside (embedding lookup,
            # vocab head, losses, Adam) stays GSPMD.
            from jax.sharding import PartitionSpec as P

            from ..core.meshes import DATA_AXIS, get_shard_map
            shard_map, flag = get_shard_map()
            run_fused = shard_map(
                run_fused, mesh=spmd_mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)), **{flag: False})
        h_all, alphas = run_fused(params, enc_flat, tags, emb)
        return _head_and_mask(params, cfg, h_all, alphas, ts, caplens,
                              dropout_rng, train, return_hidden)

    h, c = init_hidden_state(params, enc_flat)

    # Hoisted loop invariants.
    if is_scn:
        sem_x, sem_h = scn_cell.semantic_projections(cell, tags)
    if cfg.uses_attention:
        enc_att = attn.precompute(params["attention"], enc_flat)
        if is_scn:
            w_x_emb, w_x_awe = _split_wx(params, cfg)
            emb_fac = _gate_factor(emb @ w_x_emb)       # (B, T, 4, F)
    else:
        x_fac_all = scn_cell.input_factor(cell, emb)    # (B, T, 4, F)

    drop = cfg.dropout if train else 0.0

    def step(carry, xs):
        h, c = carry
        (t,) = xs
        if cfg.uses_attention:
            awe, alpha = attn.attend(
                params["attention"], enc_flat, enc_att, h)
            gate = jax.nn.sigmoid(linear(params["f_beta"], h))
            awe = gate * awe                            # (B, E)
            if is_scn:
                x_fac = emb_fac[:, t] + _gate_factor(awe @ w_x_awe)
                h, c = scn_cell.scn_step(cell, x_fac, sem_x, sem_h, h, c)
            else:
                x = jnp.concatenate([emb[:, t], awe], axis=-1)
                h, c = lstm_cell.lstm_step(cell, x, h, c)
        else:
            alpha = None
            h, c = scn_cell.scn_step(cell, x_fac_all[:, t], sem_x, sem_h, h, c)
        out = (h, alpha) if alpha is not None else (h,)
        return (h, c), out

    # Rematerialisation: save each step's matmul OUTPUTS (dec/awe/gate
    # pre-activations — ~B*(A+P+E+8D) per step) but recompute the
    # elementwise intermediates in the backward pass.  Without this the
    # scan's residuals include the (B, P, A) relu(enc_att + dec) tensor of
    # every step — f32[51, 512, 196, 512] = 9.96 GB at batch 512, an HBM
    # OOM; with it the recompute is VPU-only broadcast/relu/softmax,
    # measured within noise of the unchecked step at batch 256.
    step = jax.checkpoint(
        step, policy=jax.checkpoint_policies.checkpoint_dots)
    (_, _), outs = jax.lax.scan(step, (h, c), (ts,))

    h_all = jnp.swapaxes(outs[0], 0, 1)                 # (B, T, D)
    alphas = jnp.swapaxes(outs[1], 0, 1) if cfg.uses_attention else None
    return _head_and_mask(params, cfg, h_all, alphas, ts, caplens,
                          dropout_rng, train, return_hidden)


def _head_and_mask(params, cfg: ModelConfig, h_all, alphas, ts, caplens,
                   dropout_rng, train: bool, return_hidden: bool = False):
    # The vocab head runs OUTSIDE the scan on the stacked hidden states:
    # one (B*T, D) x (D, V) MXU matmul instead of T row-blocks, which is
    # also what lets the fused training-scan kernel (ops/train_pallas)
    # return h_all without ever materialising per-step logits.
    drop = cfg.dropout if train else 0.0
    if dropout_rng is None:
        dropout_rng = jax.random.key(0)
    h_drop = dropout(dropout_rng, h_all, drop, deterministic=not train)

    # decode_lengths = caplens - 1 (attention_scn.py:131); mask[t] = t < len-1
    mask = ts[None, :] < (caplens[:, None] - 1)
    if return_hidden:
        return {"hidden": h_drop, "alphas": alphas,
                "mask": mask.astype(jnp.float32)}
    predictions = linear(params["fc"], h_drop)          # (B, T, V)
    return {"predictions": predictions, "alphas": alphas,
            "mask": mask.astype(predictions.dtype)}


def make_beam_step(params, cfg: ModelConfig, enc, tags, *,
                   fused_step: bool = False):
    """Build (init_state, step_fn) for the generic beam engine.

    enc:  (B, H, W, E) or (B, P, E);  tags: (B, S).
    State arrays carry a (B, K, ...) leading shape.  step_fn(state, prev)
    returns (logprobs (B, K, V), new_state, emit-dict).

    fused_step=True routes the whole step (attention + f_beta + cell +
    vocab head + per-lane top-K) through ONE Pallas kernel
    (ops/step_pallas.py) so the next image chunk's encoder DMA overlaps
    the current chunk's compute.  All three decoder families (see
    _make_fused_beam_step); emits no alphas; candidate scores are f32
    (see decode_impl docs).
    """
    if fused_step:
        return _make_fused_beam_step(params, cfg, enc, tags)
    cell = params["decode_step"]
    is_scn = cfg.model_type in SCN_BASED_MODELS
    enc_flat = flatten_encoding(enc, cfg.encoder_dim)   # (B, P, E)
    B = enc_flat.shape[0]

    # Loop invariants, broadcast over the beam axis lazily ((B, 1, ...)).
    inv = {}
    if is_scn:
        sx, sh = scn_cell.semantic_projections(cell, tags)
        inv["sem_x"], inv["sem_h"] = sx[:, None], sh[:, None]
    # "auto" resolves per backend: the Pallas kernels win on TPU but would
    # run in interpret mode on CPU.  Explicit values are always honored
    # (CPU + explicit "pallas*" = interpret mode, exact but slow — how the
    # beam-integration tests drive the kernels).
    attention_impl = cfg.attention_impl
    if attention_impl == "auto":
        attention_impl = ("pallas_mxu" if jax.default_backend() != "cpu"
                          else "xla")

    enc_quant = cfg.enc_quant
    if cfg.uses_attention:
        enc_att = attn.precompute(params["attention"], enc_flat)
        if enc_quant == "int8":
            # Serving mode: loop-invariant encoder state stored int8 with
            # per-pixel scales — half the per-step HBM traffic of the
            # DMA-bound attention step (ops/attention_pallas.py).
            from ..ops.attention_pallas import quantize_pixels
            inv["enc_q"], inv["enc_s"] = quantize_pixels(enc_flat)
            inv["ea_q"], inv["ea_s"] = quantize_pixels(enc_att)
        elif attention_impl.startswith("pallas"):
            # pre-pad the loop invariants ONCE (a pad inside the beam
            # while_loop costs more than the kernel — see attention_pallas)
            from ..ops.attention_pallas import pad_pixels
            inv["enc"] = pad_pixels(enc_flat)[:, None]  # (B, 1, Pp, E)
            inv["enc_att"] = pad_pixels(enc_att)[:, None]
        else:
            inv["enc"] = enc_flat[:, None]              # (B, 1, P, E)
            inv["enc_att"] = enc_att[:, None]           # (B, 1, P, A)
        if is_scn:
            inv["w_x_emb"], inv["w_x_awe"] = _split_wx(params, cfg)

    h0, c0 = init_hidden_state(params, enc_flat)        # (B, D)

    def init_state(beam_size: int):
        tile = lambda x: jnp.broadcast_to(
            x[:, None], (B, beam_size) + x.shape[1:])
        return {"h": tile(h0), "c": tile(c0)}

    def scn_apply(x_or_fac, h, c, *, raw_x=None):
        """SCN recurrence: fused Pallas kernel or the XLA step."""
        if cfg.fused_cell:
            from ..ops.scn_pallas import scn_step_fused
            K = h.shape[1]
            bc = lambda a: jnp.broadcast_to(a, (a.shape[0], K) + a.shape[2:])
            return scn_step_fused(cell, raw_x, bc(inv["sem_x"]),
                                  bc(inv["sem_h"]), h, c)
        return scn_cell.scn_step(cell, x_or_fac, inv["sem_x"], inv["sem_h"],
                                 h, c)

    def step_fn(state, prev_words):
        h, c = state["h"], state["c"]                   # (B, K, D)
        emb = params["embedding"][prev_words]           # (B, K, Emb)
        emit = {}
        if cfg.uses_attention:
            impl = attention_impl
            if enc_quant == "int8":
                from ..ops.attention_pallas import (attend_fused_q,
                                                    attend_quant_ref)
                if impl.startswith("pallas"):
                    awe, alpha = attend_fused_q(
                        params["attention"], inv["enc_q"], inv["enc_s"],
                        inv["ea_q"], inv["ea_s"], h,
                        p_actual=enc_flat.shape[1])
                else:
                    awe, alpha = attend_quant_ref(
                        params["attention"], inv["enc_q"], inv["enc_s"],
                        inv["ea_q"], inv["ea_s"], h,
                        p_actual=enc_flat.shape[1])
            elif impl.startswith("pallas"):
                from ..ops.attention_pallas import (attend_fused,
                                                    attend_fused_mxu)
                fused = attend_fused_mxu if impl == "pallas_mxu" \
                    else attend_fused
                awe, alpha = fused(
                    params["attention"], inv["enc"], inv["enc_att"], h,
                    p_actual=enc_flat.shape[1])
            elif impl == "xla_pk":
                awe, alpha = attn.attend_pk(
                    params["attention"], inv["enc"], inv["enc_att"], h)
            else:
                awe, alpha = attn.attend(
                    params["attention"], inv["enc"], inv["enc_att"], h)
            gate = jax.nn.sigmoid(linear(params["f_beta"], h))
            awe = gate * awe
            emit["alpha"] = alpha                       # (B, K, P)
            if is_scn:
                if cfg.fused_cell:
                    h, c = scn_apply(None, h, c,
                                     raw_x=jnp.concatenate([emb, awe], -1))
                else:
                    x_fac = (_gate_factor(emb @ inv["w_x_emb"])
                             + _gate_factor(awe @ inv["w_x_awe"]))
                    h, c = scn_apply(x_fac, h, c)
            else:
                x = jnp.concatenate([emb, awe], axis=-1)
                h, c = lstm_cell.lstm_step(cell, x, h, c)
        else:
            if cfg.fused_cell:
                h, c = scn_apply(None, h, c, raw_x=emb)
            else:
                h, c = scn_apply(scn_cell.input_factor(cell, emb), h, c)
        logits = linear(params["fc"], h)                # (B, K, V)
        if cfg.sparse_head:
            # Per-lane top-k candidates for the beam's sparse merge
            # (decode/beam.py): K winners per lane suffice because at most
            # K flat winners can come from one lane.  The shifted values
            # replicate log_softmax's exact float ops ((x - m) - log s) so
            # the scores are bitwise identical to the dense path.
            B, K, V = logits.shape
            flat = jax.nn.log_softmax(logits.reshape(B * K, V), axis=-1)
            from ..ops.topk_pallas import row_topk
            topv, topi = row_topk(flat, K, cfg.topk_backend)  # (B*K, K)
            return (topv.reshape(B, K, K), topi.reshape(B, K, K)), \
                {"h": h, "c": c}, emit
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        return logprobs, {"h": h, "c": c}, emit

    return init_state, step_fn


def _make_fused_beam_step(params, cfg: ModelConfig, enc, tags):
    """(init_state, step_fn) backed by the fused per-step kernel.

    Covers all three decoder families: attention_scn (attention + SCN),
    pure_attention (attention + torch LSTM), pure_scn (SCN only — the
    kernel reads no encoder state, the fusion win is the cell+head chain
    and the in-VMEM vocab top-K)."""
    from ..ops.attention_pallas import pad_pixels, quantize_pixels
    from ..ops.step_pallas import (fused_decode_step, fused_decode_step_q,
                                   fused_decode_step_noattn,
                                   pack_step_weights)

    if cfg.model_type not in MODEL_TYPES:
        raise NotImplementedError(f"fused_step: unknown {cfg.model_type}")
    cell = params["decode_step"]
    is_scn = cfg.model_type in SCN_BASED_MODELS
    cell_kind = "scn" if is_scn else "lstm"
    enc_flat = flatten_encoding(enc, cfg.encoder_dim)      # (B, P, E)
    B, P, _ = enc_flat.shape
    dt = enc_flat.dtype
    F4 = 4 * cfg.factored_dim

    if cfg.uses_attention:
        enc_att = attn.precompute(params["attention"], enc_flat)
        if cfg.enc_quant == "int8":
            enc_inputs = quantize_pixels(enc_flat) + quantize_pixels(enc_att)
            step_kernel = functools.partial(
                fused_decode_step_q, num_pixels=P, cell=cell_kind,
                vocab_size=cfg.vocab_size)
        else:
            enc_inputs = (pad_pixels(enc_flat), pad_pixels(enc_att))
            step_kernel = functools.partial(
                fused_decode_step, num_pixels=P, cell=cell_kind,
                vocab_size=cfg.vocab_size, pipeline=cfg.step_pipeline)
    else:
        enc_inputs = ()
        step_kernel = None                  # bound per beam size below
    weights = pack_step_weights(params, cfg, dt)
    if is_scn:
        sx, sh = scn_cell.semantic_projections(cell, tags)  # (B, 4, F)
    h0, c0 = init_hidden_state(params, enc_flat)           # (B, D)

    def init_state(beam_size: int):
        K = beam_size
        return {
            "h": jnp.broadcast_to(h0[:, None],
                                  (B, K, cfg.decoder_dim)).astype(dt),
            "c": jnp.broadcast_to(c0[:, None],
                                  (B, K, cfg.decoder_dim)).astype(dt),
        }

    def step_fn(state, prev_words):
        h = state["h"]                                     # (B, K, D)
        B_, K, D = h.shape
        emb_rows = params["embedding"][prev_words].reshape(B_ * K, -1)
        if is_scn:
            semx = jnp.repeat(sx.reshape(B_, F4), K, axis=0).astype(dt)
            semh = jnp.repeat(sh.reshape(B_, F4), K, axis=0).astype(dt)
        else:
            semx = semh = None
        kern = step_kernel if step_kernel is not None else \
            functools.partial(fused_decode_step_noattn, beam_k=K,
                              vocab_size=cfg.vocab_size)
        topv, topi, lse, h_new, c_new = kern(
            weights, *enc_inputs, emb_rows.astype(dt),
            h.reshape(B_ * K, D), state["c"].reshape(B_ * K, D),
            semx, semh)
        cand_vals = (topv - lse).reshape(B_, K, K)         # f32 logprobs
        cand_ids = topi.reshape(B_, K, K)
        new_state = {"h": h_new.reshape(B_, K, D),
                     "c": c_new.reshape(B_, K, D)}
        return (cand_vals, cand_ids), new_state, {}

    return init_state, step_fn


def load_pretrained_embeddings(params, embeddings):
    """Replace the embedding table (reference load_pretrained_embeddings,
    attention_scn.py:65-71)."""
    import jax.numpy as jnp
    emb = jnp.asarray(embeddings)
    if emb.shape != params["embedding"].shape:
        raise ValueError(
            f"embedding shape {emb.shape} != {params['embedding'].shape}")
    return {**params, "embedding": emb.astype(params["embedding"].dtype)}


def trainable_mask(params, fine_tune_embeddings: bool = True):
    """Boolean pytree for optimizer masking (reference fine_tune_embeddings,
    attention_scn.py:73-80: freezing the table only makes sense with
    pretrained embeddings)."""
    mask = jax.tree.map(lambda _: True, params)
    if not fine_tune_embeddings:
        mask["embedding"] = False
    return mask


def cast_params(params, dtype):
    """Cast a decoder param tree to a compute dtype (e.g. bf16 serving).

    ``ModelConfig.dtype`` documents the intended precision; params are the
    source of truth at apply time, so cast them once here rather than per
    step.  Integer leaves are left untouched.
    """
    import jax.numpy as jnp
    dtype = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)
