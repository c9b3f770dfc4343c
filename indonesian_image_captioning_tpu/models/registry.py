"""Decoder registry + loader (reference utils/loader.py:9-68 parity).

``load_decoder`` builds the right decoder params for a model type with the
reference's default dims (512/512/512/512, semantic 1000, dropout .5 —
"must be same as training params!", loader.py:19) and loads a torch
serve-format state_dict into it.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from ..core.config import ModelConfig
from . import convert
from .decoders import ATT_BASED_MODELS, MODEL_TYPES, SCN_BASED_MODELS, init_decoder

# set parity: utils/loader.py:5-6
scn_based_model = set(SCN_BASED_MODELS)
att_based_model = set(ATT_BASED_MODELS)


def make_config(model_type: str, vocab_size: int, embed_dim: int = 512,
                attention_dim: int = 512, decoder_dim: int = 512,
                factored_dim: int = 512, semantic_dim: int = 1000,
                dropout: float = 0.5) -> ModelConfig:
    if model_type not in MODEL_TYPES:
        raise ValueError("Error model type not found!")
    return ModelConfig(model_type=model_type, vocab_size=vocab_size,
                       embed_dim=embed_dim, attention_dim=attention_dim,
                       decoder_dim=decoder_dim, factored_dim=factored_dim,
                       semantic_dim=semantic_dim, dropout=dropout)


def load_decoder(model_type: str, checkpoint: Optional[Dict],
                 vocab_size: int, **dims):
    """-> (params, cfg).  checkpoint: torch-style state_dict or None for a
    fresh init."""
    cfg = make_config(model_type, vocab_size, **dims)
    if checkpoint is None:
        return init_decoder(jax.random.key(0), cfg), cfg
    return convert.decoder_from_torch(checkpoint, cfg), cfg
