"""Shared CLI helpers: checkpoint format detection and model bundle loading.

Accepts all three checkpoint families:
  * canonical orbax directories written by this framework's trainers
    ({"state": {...}, "epoch", ...});
  * reference torch serve-format files (.pth/.pth.tar state_dicts under
    encoder_model_state_dict / decoder_model_state_dict / model_state_dict,
    inference.py:85-131);
  * reference torch TRAINING-format files (whole pickled modules under
    encoder / decoder, utils/checkpoint.py:20-31 — e.g. what
    eval_tagger.py:24-25 consumes via ``checkpoint['encoder']``), loaded
    with stubbed classes via models/torch_import.py.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax

from ..core import checkpoint as ckpt_lib
from ..core.config import ModelConfig, TaggerConfig
from ..models import convert, encoders


def _torch_load(path: str):
    """torch.load with stubbed classes, so training-format pickles (whole
    reference nn.Modules) load without the reference package installed."""
    import torch

    from ..models.torch_import import _PickleShim
    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_PickleShim)


def load_caption_state(model_caption: str, cfg: ModelConfig,
                       model_tagger: Optional[str] = None) -> Dict:
    """-> state dict {"params", "encoder", "encoder_stats", "tagger",
    "tagger_stats"} for eval/inference."""
    key = jax.random.key(0)
    if os.path.isdir(model_caption):
        restored = ckpt_lib.load_pytree(model_caption)
        state = restored["state"] if "state" in restored else restored
    else:
        ckpt = _torch_load(model_caption)
        if "decoder_model_state_dict" in ckpt:       # serve format (b)
            dec_sd = ckpt["decoder_model_state_dict"]
            enc_sd = ckpt["encoder_model_state_dict"]
        else:                                        # training format (a)
            from ..models.torch_import import extract_state_dict
            dec_sd = extract_state_dict(ckpt["decoder"])
            enc_sd = extract_state_dict(ckpt["encoder"])
        params = convert.decoder_from_torch(dec_sd, cfg)
        enc_params, enc_stats = convert.encoder_caption_from_torch(
            enc_sd, arch=cfg.encoder_arch)
        state = {"params": params, "encoder": enc_params,
                 "encoder_stats": enc_stats}
    if "tagger" not in state or model_tagger:
        if model_tagger:
            tp, ts = load_tagger_state(model_tagger, cfg.encoder_arch)
        else:
            tp, ts = encoders.init_encoder_tagger(
                key, TaggerConfig(semantic_size=cfg.semantic_dim,
                                  encoder_arch=cfg.encoder_arch),
                arch=cfg.encoder_arch)
        state = {**state, "tagger": tp, "tagger_stats": ts}
    return state


def load_tagger_state(model_tagger: str, arch: str = "resnet152") -> Tuple:
    """-> (params, batch_stats) for the tagger encoder."""
    if os.path.isdir(model_tagger):
        restored = ckpt_lib.load_pytree(model_tagger)
        state = restored["state"] if "state" in restored else restored
        if "params" in state:
            return state["params"], state["stats"]
        return state["tagger"], state["tagger_stats"]
    ckpt = _torch_load(model_tagger)
    if "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif "encoder" in ckpt:                          # training format (a)
        from ..models.torch_import import extract_state_dict
        sd = extract_state_dict(ckpt["encoder"])
    else:
        sd = ckpt
    return convert.encoder_tagger_from_torch(sd, arch=arch)
