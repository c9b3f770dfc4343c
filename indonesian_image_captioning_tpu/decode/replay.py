"""Replay recorded beam selections through the engine's bookkeeping.

The fused decode kernels (ops/decode_pallas.py, ops/span_pallas.py) run
beam steps on-chip and emit only the per-step selection records — next
words, parent lanes and cumulative scores, each (B, T, K).  Everything
else the beam engine produces (sequences, lengths, completed pools,
freezing semantics, best-pick with the crash-free fallback of
models/decoders/attention_scn.py:288-296) is reconstructed here.

Two implementations with identical results:

* :func:`replay_beam_records` (production) — VECTORIZED: a T-step scan
  over only the (B,)-sized alive/count recurrences (the one part that is
  inherently sequential: validity needs the running alive count), then
  the completed pools filled by ONE select-reduce over the flattened
  (T*K) retirement slots (scatter-free), then sequences rebuilt by a
  parent-pointer BACKTRACE scan with two small gathers per step.

* :func:`replay_beam_records_scan` (reference) — the original verbatim
  replay through :func:`beam._apply_selection` / :func:`beam.finalize`,
  kept as the semantics oracle (tests/test_replay_fast.py asserts
  equality on adversarial record sets).

Measured honestly (b1024 bf16, v5e, interleaved in one process): both
replays run ~13 ms standalone — an earlier 36.7 ms reading for the scan
replay was the machine's documented cross-window drift, not scatter
cost; XLA lowers the mode='drop' pool scatters acceptably.  The
vectorized form is kept as production for its flatter op structure
(fewer sequential per-step ops — the better shape for the small-batch
latency path), with the scan form as the oracle.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .beam import NEG_INF, _apply_selection, finalize, init_carry


def replay_beam_records_scan(
    records: Dict[str, jax.Array],
    *,
    start_id: int,
    end_id: int,
    seq_len: int,
    length_penalty: float = 0.0,
) -> Dict[str, jax.Array]:
    """records: {"words"/"parents": (B, T, K) int32, "vals": (B, T, K) f32}
    from one fused decode.  Returns the same result dict as
    :func:`beam.beam_search` (minus emissions, which the fused kernels do
    not record)."""
    words = records["words"]
    B, T, K = words.shape

    carry = init_carry(None, batch_size=B, beam_size=K, seq_len=seq_len,
                       start_id=start_id)

    def step(c, rec):
        vals, parents, wds = rec
        c = _apply_selection(c, vals, parents, wds, None, {}, end_id=end_id)
        return c, None

    xs = (jnp.moveaxis(records["vals"], 1, 0),
          jnp.moveaxis(records["parents"], 1, 0),
          jnp.moveaxis(words, 1, 0))
    out, _ = jax.lax.scan(step, carry, xs)
    return finalize(out, seq_len=seq_len, length_penalty=length_penalty)


def replay_beam_records(
    records: Dict[str, jax.Array],
    *,
    start_id: int,
    end_id: int,
    seq_len: int,
    length_penalty: float = 0.0,
) -> Dict[str, jax.Array]:
    """Vectorized replay — result-identical to
    :func:`replay_beam_records_scan` (the engine's own bookkeeping); see
    the module docstring for why this formulation exists."""
    vals = records["vals"]
    parents = records["parents"]
    words = records["words"]
    B, T, K = words.shape
    L = seq_len
    rank = jnp.arange(K)

    # ---- phase 1: the sequential (B,)-sized recurrences --------------
    # alive_count gates validity (rank < alive, beam._apply_selection);
    # comp_count assigns retirement slots.  Everything else vectorizes.
    def p1(carry, rec):
        alive, ccount = carry
        v, w = rec
        active = alive > 0
        valid = (rank[None, :] < alive[:, None]) & (v > NEG_INF) \
            & active[:, None]
        is_end = valid & (w == end_id)
        n_done = is_end.sum(axis=1).astype(jnp.int32)
        cont = valid & ~is_end
        offs = jnp.cumsum(is_end.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(is_end, ccount[:, None] + offs, K)   # K = drop
        return ((alive - n_done, ccount + n_done),
                (cont, slot))

    (alive_f, ccount_f), (cont_T, slot_T) = jax.lax.scan(
        p1,
        (jnp.full((B,), K, jnp.int32), jnp.zeros((B,), jnp.int32)),
        (jnp.moveaxis(vals, 1, 0), jnp.moveaxis(words, 1, 0)))
    cont_T = jnp.moveaxis(cont_T, 0, 1)                       # (B, T, K)
    slot_T = jnp.moveaxis(slot_T, 0, 1)                       # (B, T, K)

    # ---- phase 2: completed pools, scatter-free ----------------------
    # one-hot over the flattened (T*K) retirements: slot s collects its
    # entry's score/length/(t, k) by a single contraction — the engine's
    # 4-scatters-per-step land on TPU's serialized scatter path.
    slot_flat = slot_T.reshape(B, T * K)                      # (B, T*K)
    hit = slot_flat[:, :, None] == rank[None, None, :]        # (B, T*K, K)
    filled = jnp.any(hit, axis=1)
    t_idx = jnp.broadcast_to(jnp.arange(T)[None, :, None],
                             (B, T, K)).reshape(B, T * K)
    k_idx = jnp.broadcast_to(rank[None, None, :],
                             (B, T, K)).reshape(B, T * K)
    # VPU select-reduce, NOT a one-hot matmul: the TPU's default f32
    # matmul precision is a single bf16 pass, which would round the f32
    # score payloads (the exact bug class documented in BASELINE.md's
    # "one-hot payload-precision" section)
    pool = lambda x: jnp.sum(
        jnp.where(hit, x.astype(jnp.float32)[:, :, None], 0.0), axis=1)
    comp_scores = jnp.where(filled, pool(vals.reshape(B, T * K)), NEG_INF)
    # record t is engine step t+1 and writes seq position t+1 ->
    # retirement length t+2 (beam._apply_selection: comp_lens = step+1)
    comp_lens = jnp.where(filled,
                          pool(t_idx).astype(jnp.int32) + 2, 0)
    comp_t = pool(t_idx).astype(jnp.int32)                    # (B, K)
    comp_k = pool(k_idx).astype(jnp.int32)

    # ---- phase 3: parent-pointer backtrace ---------------------------
    # 2K tracked hypotheses per image: the K pool entries (from their
    # retirement step) and the K final live lanes.  Two (B, 2K) gathers
    # per step rebuild every sequence position; positions beyond a pool
    # entry's length emit 0, matching the engine's never-written zeros.
    ptr0 = jnp.concatenate([comp_k, jnp.broadcast_to(rank[None, :],
                                                     (B, K))], axis=1)
    t_sel = jnp.concatenate([comp_t, jnp.full((B, K), T - 1, jnp.int32)],
                            axis=1)                           # (B, 2K)

    def bt(ptr, rec):
        t, w_t, p_t = rec
        on = t <= t_sel
        word = jnp.where(on, jnp.take_along_axis(w_t, ptr, axis=1), 0)
        ptr = jnp.where(on, jnp.take_along_axis(p_t, ptr, axis=1), ptr)
        return ptr, word

    _, words_bt = jax.lax.scan(
        bt, ptr0,
        (jnp.arange(T - 1, -1, -1),
         jnp.moveaxis(words, 1, 0)[::-1],
         jnp.moveaxis(parents, 1, 0)[::-1]))
    words_bt = jnp.moveaxis(words_bt, 0, 2)[:, :, ::-1]       # (B, 2K, T)

    W = min(T, L - 1)
    seqs = jnp.zeros((B, 2 * K, L), jnp.int32)
    seqs = seqs.at[:, :, 0].set(start_id)
    seqs = seqs.at[:, :, 1:W + 1].set(words_bt[:, :, :W])
    # unfilled pool slots stay ALL-zero (the engine never writes them —
    # not even the start token)
    comp_seqs = jnp.where(filled[:, :, None], seqs[:, :K], 0)
    live_seqs = seqs[:, K:]

    # final live scores: the engine's post-step state — continuing lanes
    # keep their step-T score, everything else NEG (frozen rows' stale
    # values are never consumed: finalize picks the completed pool there)
    last_cont = cont_T[:, T - 1, :]
    live_scores = jnp.where(last_cont, vals[:, T - 1, :], NEG_INF)

    out = dict(
        step=jnp.asarray(1 + T, jnp.int32),
        scores=live_scores,
        seqs=live_seqs,
        comp_seqs=comp_seqs,
        comp_scores=comp_scores,
        comp_lens=comp_lens,
        comp_count=ccount_f,
    )
    return finalize(out, seq_len=seq_len, length_penalty=length_penalty)
