"""Fixed-shape batched beam search as a ``lax.while_loop``.

Reference semantics being reproduced (models/decoders/attention_scn.py:160-296
and the twins in pure_scn.py / pure_attention.py):

  * expand the image to k beams; cumulative log-softmax scores; flat top-k
    over (alive_beams * vocab);
  * a beam that emits <end> retires to the completed pool and the live beam
    width shrinks by one;
  * hard stop after 51 decode steps (the reference checks ``step > 50``
    AFTER processing a step);
  * final answer: the completed sequence with the best raw score.  (The
    reference crashes when nothing completed — SURVEY.md §5 bugs; here we
    fall back to the best live beam.)

TPU-native design: beam width is STATIC.  Shrinkage is modelled with an
``alive_count`` scalar per batch row: every step we top-k K candidates from
the masked (K, V) score table, then invalidate selections with rank >=
alive_count — exactly the reference's "take top k_alive of the alive
expansions".  Dead lanes carry -inf score so they never produce candidates.
All buffers have static shapes; completions scatter into per-batch pools
with ``mode='drop'`` out-of-range slots.  The whole search jits; batches of
images decode together (the reference decodes one image at a time on bs=1 —
batching the beam is where most of the TPU serving throughput comes from).

The engine is model-agnostic: a decoder supplies ``step_fn(state, prev_words)
-> (logprobs (B,K,V), new_state, emit)`` where ``emit`` maps names to
per-step (B, K, ...) arrays to be recorded per position (e.g. attention
alphas for visualisation).

**Sparse head mode** (the TPU throughput win, default for the caption
models): instead of a dense (B, K, V) logprob table the step supplies
``(cand_vals (B, K, k), cand_ids (B, K, k))`` — each lane's top-k logprobs
and their vocab ids.  The flat top-k then merges K*k candidates instead of
K*V.  This is EXACT, ties included: at most k flat winners can come from
one lane, per-lane top-k of logits equals per-lane top-k of logprobs (the
logsumexp is a monotone per-row shift), per-row ``lax.top_k`` orders equal
values by vocab index (the dense flat tie-break within a lane), and the
(K, k) flat merge keeps lanes in lane-major order (the dense tie-break
across lanes).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.topk_pallas import row_topk

NEG_INF = -1e30  # large-but-finite sentinel keeps top_k well behaved


def _gather_lanes(x, lane_idx):
    """Reorder the beam axis: x (B, K, ...), lane_idx (B, K) -> (B, K, ...)."""
    idx = lane_idx.reshape(lane_idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def _apply_selection(c, top_vals, prev_lane, next_word, new_state, emit,
                     *, end_id: int):
    """Selection-independent beam bookkeeping for ONE step.

    Given this step's flat-top-k selection (top_vals (B, K) cumulative
    scores, prev_lane (B, K) parent lanes, next_word (B, K) token ids),
    extend sequences, retire completed lanes into the pools, reorder the
    decoder state, and freeze finished batch rows.  Shared verbatim by the
    live engine (:func:`beam_search`) and the fused-decode replay
    (decode/replay.py) so both have IDENTICAL semantics.  ``new_state`` may
    be None (replay has no decoder state).
    """
    B, K = top_vals.shape
    step = c["step"]
    rank = jnp.arange(K)
    b_idx = jnp.arange(B)
    active = c["alive_count"] > 0                          # (B,)

    valid = (rank[None, :] < c["alive_count"][:, None]) \
        & (top_vals > NEG_INF) & active[:, None]
    is_end = valid & (next_word == end_id)
    cont = valid & ~is_end

    # Extend sequences (uniform growth: every lane writes position
    # `step`; invalid lanes are garbage but carry -inf scores).
    new_seqs = _gather_lanes(c["seqs"], prev_lane)
    new_seqs = new_seqs.at[:, :, step].set(next_word)
    new_emits = {}
    for n, buf in c["emits"].items():
        buf = _gather_lanes(buf, prev_lane)
        val = emit[n].astype(buf.dtype)
        new_emits[n] = buf.at[:, :, step].set(val)

    # Retire completed lanes into the pools.
    offs = jnp.cumsum(is_end.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(is_end, c["comp_count"][:, None] + offs, K)  # K=drop
    comp_seqs = c["comp_seqs"].at[b_idx[:, None], slot].set(
        new_seqs, mode="drop")
    comp_scores = c["comp_scores"].at[b_idx[:, None], slot].set(
        top_vals, mode="drop")
    comp_lens = c["comp_lens"].at[b_idx[:, None], slot].set(
        step + 1, mode="drop")
    comp_emits = {
        n: c["comp_emits"][n].at[b_idx[:, None], slot].set(
            new_emits[n], mode="drop")
        for n in new_emits}
    n_done = is_end.sum(axis=1).astype(jnp.int32)

    new_scores = jnp.where(cont, top_vals, NEG_INF)
    reordered = jax.tree.map(
        lambda x: _gather_lanes(x, prev_lane), new_state)

    # Freeze finished batch rows.
    frz = lambda new, old: jnp.where(
        active.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
    return dict(
        step=step + 1,
        state=jax.tree.map(frz, reordered, c["state"]),
        prev_words=jnp.where(active[:, None], next_word, c["prev_words"]),
        scores=frz(new_scores, c["scores"]),
        alive_count=jnp.where(active, c["alive_count"] - n_done,
                              c["alive_count"]),
        seqs=frz(new_seqs, c["seqs"]),
        emits={n: frz(new_emits[n], c["emits"][n]) for n in new_emits},
        comp_seqs=frz(comp_seqs, c["comp_seqs"]),
        comp_scores=frz(comp_scores, c["comp_scores"]),
        comp_lens=frz(comp_lens, c["comp_lens"]),
        comp_count=jnp.where(active, c["comp_count"] + n_done,
                             c["comp_count"]),
        comp_emits={n: frz(comp_emits[n], c["comp_emits"][n])
                    for n in comp_emits},
    )


def init_carry(init_state, *, batch_size: int, beam_size: int,
               seq_len: int, start_id: int, emit_specs=None):
    """Initial while/scan carry shared by engine and replay."""
    B, K, L = batch_size, beam_size, seq_len
    emit_specs = emit_specs or {}
    seqs = jnp.zeros((B, K, L), jnp.int32).at[:, :, 0].set(start_id)
    # Lane 0 holds the single <start> hypothesis; other lanes dead. The
    # first iteration then selects K expansions of lane 0, replicating the
    # reference's step-1 special case (attention_scn.py:242-244).
    scores = jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    emits = {n: jnp.zeros((B, K, L) + tuple(s), jnp.float32)
             for n, s in emit_specs.items()}
    return dict(
        step=jnp.asarray(1, jnp.int32), state=init_state,
        prev_words=jnp.full((B, K), start_id, jnp.int32), scores=scores,
        alive_count=jnp.full((B,), K, jnp.int32), seqs=seqs, emits=emits,
        comp_seqs=jnp.zeros((B, K, L), jnp.int32),
        comp_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        comp_lens=jnp.zeros((B, K), jnp.int32),
        comp_count=jnp.zeros((B,), jnp.int32),
        comp_emits={n: jnp.zeros_like(v) for n, v in emits.items()})


def finalize(out, *, seq_len: int, length_penalty: float = 0.0,
             emit_names=()):
    """Best completed sequence, else best live beam (crash-free fallback)."""
    B = out["scores"].shape[0]
    L = seq_len
    live_len = jnp.minimum(out["step"], L).astype(jnp.int32)
    has_comp = out["comp_count"] > 0

    def rank_score(s, lens):
        if length_penalty > 0.0:
            return s / (lens.astype(jnp.float32) ** length_penalty)
        return s

    comp_best = jnp.argmax(
        rank_score(out["comp_scores"], out["comp_lens"]), axis=1)
    live_best = jnp.argmax(out["scores"], axis=1)

    def pick(comp_buf, live_buf, live_fallback_idx):
        csel = jnp.take_along_axis(
            comp_buf, comp_best.reshape((B,) + (1,) * (comp_buf.ndim - 1)),
            axis=1)[:, 0]
        lsel = jnp.take_along_axis(
            live_buf, live_fallback_idx.reshape(
                (B,) + (1,) * (live_buf.ndim - 1)), axis=1)[:, 0]
        mask = has_comp.reshape((B,) + (1,) * (csel.ndim - 1))
        return jnp.where(mask, csel, lsel)

    K = out["scores"].shape[1]
    result = {
        "sequences": pick(out["comp_seqs"], out["seqs"], live_best),
        "scores": pick(out["comp_scores"], out["scores"], live_best),
        "lengths": pick(out["comp_lens"],
                        jnp.broadcast_to(live_len[None].T, (B, K)), live_best),
        "completed_sequences": out["comp_seqs"],
        "completed_scores": out["comp_scores"],
        "completed_lengths": out["comp_lens"],
        "completed_count": out["comp_count"],
    }
    for n in emit_names:
        result[n] = pick(out["comp_emits"][n], out["emits"][n], live_best)
    return result


def beam_search(
    step_fn: Callable,
    init_state,
    *,
    batch_size: int,
    beam_size: int,
    vocab_size: int,
    start_id: int,
    end_id: int,
    max_steps: int = 51,
    seq_len: int = 52,
    emit_specs: Optional[Dict[str, Tuple[int, ...]]] = None,
    length_penalty: float = 0.0,
    topk_backend: str = "lax",
) -> Dict[str, jax.Array]:
    """Run batched beam search.

    emit_specs: name -> trailing shape of each per-step emission (e.g.
    {"alpha": (196,)}); emissions are recorded per written position into
    (B, K, seq_len, ...) buffers that follow lane reordering.

    Returns dict with best sequences per batch row:
      sequences (B, seq_len) int32 (pad 0 after length), lengths (B,),
      scores (B,), plus one (B, seq_len, ...) array per emission name, and
      `completed_*` pools for inspection.
    """
    B, K, V = batch_size, beam_size, vocab_size
    emit_specs = emit_specs or {}

    carry = init_carry(init_state, batch_size=B, beam_size=K,
                       seq_len=seq_len, start_id=start_id,
                       emit_specs=emit_specs)

    def cond(c):
        return jnp.logical_and(c["step"] <= max_steps,
                               jnp.any(c["alive_count"] > 0))

    def body(c):
        head, new_state, emit = step_fn(c["state"], c["prev_words"])
        if isinstance(head, tuple):
            # sparse head: per-lane top-k candidates (see module docstring)
            cand_vals, cand_ids = head                     # (B, K, kc)
            kc = cand_vals.shape[-1]
            cand = c["scores"][:, :, None] + cand_vals     # (B, K, kc)
            cand = jnp.maximum(cand, NEG_INF)
            cand = jnp.where(c["scores"][:, :, None] <= NEG_INF, NEG_INF,
                             cand)
            top_vals, flat_idx = jax.lax.top_k(cand.reshape(B, K * kc), K)
            prev_lane = flat_idx // kc                     # (B, K)
            next_word = jnp.take_along_axis(
                cand_ids.reshape(B, K * kc), flat_idx, axis=1)
        else:
            cand = c["scores"][:, :, None] + head          # (B, K, V)
            cand = jnp.maximum(cand, NEG_INF)              # clamp dead lanes
            cand = jnp.where(c["scores"][:, :, None] <= NEG_INF, NEG_INF,
                             cand)
            top_vals, top_idx = row_topk(cand.reshape(B, K * V), K,
                                         topk_backend)
            prev_lane = top_idx // V                       # (B, K)
            next_word = top_idx % V

        return _apply_selection(c, top_vals, prev_lane, next_word,
                                new_state, emit, end_id=end_id)

    out = jax.lax.while_loop(cond, body, carry)
    return finalize(out, seq_len=seq_len, length_penalty=length_penalty,
                    emit_names=tuple(emit_specs))
