"""Greedy decoding — the degenerate beam_size=1 search (SURVEY.md §7.6).

Provided as an explicit API for serving callers that don't want beam
semantics; shares the whole engine so behaviour (step cap, <end>
handling, emissions) is identical to beam_size=1 beam search.
"""

from __future__ import annotations

from typing import Dict

import jax

from ..core.config import BeamConfig, ModelConfig
from .api import caption_beam_search


def caption_greedy(params, cfg: ModelConfig, enc, tags, *, start_id: int,
                   end_id: int, max_steps: int = 51,
                   record_alphas: bool = False) -> Dict[str, jax.Array]:
    return caption_beam_search(
        params, cfg, enc, tags, start_id=start_id, end_id=end_id,
        beam_cfg=BeamConfig(beam_size=1, max_steps=max_steps),
        record_alphas=record_alphas)
