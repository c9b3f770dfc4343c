"""Replay recorded beam selections through the engine's bookkeeping.

The fused full-decode Pallas kernel (ops/decode_pallas.py) runs all beam
steps on-chip and emits only the per-step selection records — next words,
parent lanes and cumulative scores, each (B, T, K).  Everything else the
beam engine produces (sequences, lengths, completed pools, freezing
semantics, best-pick with the crash-free fallback of
models/decoders/attention_scn.py:288-296) is reconstructed here by scanning
the records through the exact same :func:`beam._apply_selection` /
:func:`beam.finalize` code the live engine uses — the two paths cannot
diverge in bookkeeping, only in how the selections were computed.

Cost: a T-step scan over (B, K)-shaped updates plus one (B, K, L) gather
per step — ~2 MB of state at bench dims, negligible next to the decode.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .beam import _apply_selection, finalize, init_carry


def replay_beam_records(
    records: Dict[str, jax.Array],
    *,
    start_id: int,
    end_id: int,
    seq_len: int,
    length_penalty: float = 0.0,
) -> Dict[str, jax.Array]:
    """records: {"words"/"parents": (B, T, K) int32, "vals": (B, T, K) f32}
    from one fused decode.  Returns the same result dict as
    :func:`beam.beam_search` (minus emissions, which the fused kernel does
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
