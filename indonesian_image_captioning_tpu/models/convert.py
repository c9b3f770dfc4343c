"""Reference (torch) checkpoint state_dict converters.

The reference ships two checkpoint families (SURVEY.md §5):
  (a) training format — whole pickled nn.Modules (utils/checkpoint.py:20-27);
      unpickling those requires the reference package itself, so this
      framework does not consume them directly;
  (b) pretrained/serve format — plain state_dicts under
      ``encoder_model_state_dict`` / ``decoder_model_state_dict`` /
      ``model_state_dict`` (inference.py:93,118,129; eval_caption.py:65-85).

This module converts family (b) state_dicts (tensors or ndarrays keyed by
torch module paths) into this framework's param pytrees, and back.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from . import lstm_cell, resnet, scn_cell
from .decoders import SCN_BASED_MODELS


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _linear(sd, prefix):
    return {"w": jnp.asarray(_np(sd[prefix + ".weight"]).T),
            "b": jnp.asarray(_np(sd[prefix + ".bias"]))}


def decoder_from_torch(sd: Dict, cfg: ModelConfig):
    """Reference decoder state_dict -> params pytree (keys per
    models/decoders/*.py module names)."""
    sd = {k: _np(v) for k, v in sd.items()}
    params = {
        "embedding": jnp.asarray(sd["embedding.weight"]),
        "init_h": _linear(sd, "init_h"),
        "init_c": _linear(sd, "init_c"),
        "fc": _linear(sd, "fc"),
    }
    if cfg.uses_attention:
        params["attention"] = {
            "encoder_att": _linear(sd, "attention.encoder_att"),
            "decoder_att": _linear(sd, "attention.decoder_att"),
            "full_att": _linear(sd, "attention.full_att"),
        }
        params["f_beta"] = _linear(sd, "f_beta")
    if cfg.model_type in SCN_BASED_MODELS:
        params["decode_step"] = scn_cell.from_torch_layout(
            sd["decode_step.weight_ia"], sd["decode_step.weight_ib"],
            sd["decode_step.weight_ic"], sd["decode_step.weight_ha"],
            sd["decode_step.weight_hb"], sd["decode_step.weight_hc"],
            sd["decode_step.bias_ih"], sd["decode_step.bias_hh"])
    else:
        params["decode_step"] = lstm_cell.from_torch_layout(
            sd["decode_step.weight_ih"], sd["decode_step.weight_hh"],
            sd["decode_step.bias_ih"], sd["decode_step.bias_hh"])
    return params


def decoder_to_torch(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`decoder_from_torch` (for exporting to reference
    serve format)."""
    def lin(p):
        return np.asarray(p["w"]).T, np.asarray(p["b"])

    sd: Dict[str, np.ndarray] = {"embedding.weight": np.asarray(params["embedding"])}
    for name in ("init_h", "init_c", "fc"):
        sd[name + ".weight"], sd[name + ".bias"] = lin(params[name])
    if cfg.uses_attention:
        for name in ("encoder_att", "decoder_att", "full_att"):
            w, b = lin(params["attention"][name])
            sd[f"attention.{name}.weight"], sd[f"attention.{name}.bias"] = w, b
        sd["f_beta.weight"], sd["f_beta.bias"] = lin(params["f_beta"])
    if cfg.model_type in SCN_BASED_MODELS:
        cell = scn_cell.to_torch_layout(params["decode_step"])
    else:
        cell = lstm_cell.to_torch_layout(params["decode_step"])
    for k, v in cell.items():
        sd[f"decode_step.{k}"] = np.asarray(v)
    return sd


# nn.Sequential(list(resnet.children())) renumbers the resnet stages:
# encoders/caption.py:21-22 / encoders/tagger.py:22-24.
_SEQ_TO_STAGE = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                 "6": "layer3", "7": "layer4"}


def _resnet_sd_from_sequential(sd: Dict, prefix: str = "resnet."):
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        idx, _, tail = rest.partition(".")
        stage = _SEQ_TO_STAGE.get(idx)
        if stage is None:      # relu/maxpool/avgpool have no params
            continue
        out[f"{stage}.{tail}" if tail else stage] = v
    return out


def encoder_caption_from_torch(sd: Dict, arch: str = "resnet152"):
    """EncoderCaption serve state_dict -> (params, batch_stats)."""
    rp, rs = resnet.load_torch_resnet(_resnet_sd_from_sequential(sd), arch)
    return {"resnet": rp}, {"resnet": rs}


def encoder_tagger_from_torch(sd: Dict, arch: str = "resnet152"):
    """EncoderTagger serve state_dict -> (params, batch_stats)."""
    rp, rs = resnet.load_torch_resnet(_resnet_sd_from_sequential(sd), arch)
    params = {"resnet": rp, "linear": _linear({k: _np(v) for k, v in sd.items()
                                               if k.startswith("linear.")},
                                              "linear")}
    return params, {"resnet": rs}


def _resnet_to_torch_sd(params, stats, arch: str = "resnet152"):
    """Canonical resnet pytrees -> torchvision-layout state_dict arrays."""
    import numpy as np
    sd = {}

    def conv(name, w):  # HWIO -> OIHW
        sd[name + ".weight"] = np.transpose(np.asarray(w), (3, 2, 0, 1))

    def bn(name, p, s):
        sd[name + ".weight"] = np.asarray(p["scale"])
        sd[name + ".bias"] = np.asarray(p["bias"])
        sd[name + ".running_mean"] = np.asarray(s["mean"])
        sd[name + ".running_var"] = np.asarray(s["var"])

    conv("conv1", params["conv1"])
    bn("bn1", params["bn1"], stats["bn1"])
    for stage in range(1, 5):
        sp, ss = params[f"layer{stage}"], stats[f"layer{stage}"]

        def emit(pre, bp, bs):
            for i in (1, 2, 3):
                conv(f"{pre}.conv{i}", bp[f"conv{i}"])
                bn(f"{pre}.bn{i}", bp[f"bn{i}"], bs[f"bn{i}"])
            if "downsample_conv" in bp:
                conv(f"{pre}.downsample.0", bp["downsample_conv"])
                bn(f"{pre}.downsample.1", bp["downsample_bn"],
                   bs["downsample_bn"])

        emit(f"layer{stage}.0", sp["first"], ss["first"])
        if sp["rest"] is not None:
            import jax
            n_rest = jax.tree.leaves(sp["rest"])[0].shape[0]
            for b in range(n_rest):
                bp = jax.tree.map(lambda x: x[b], sp["rest"])
                bs = jax.tree.map(lambda x: x[b], ss["rest"])
                emit(f"layer{stage}.{b + 1}", bp, bs)
    return sd


def _sequential_sd(resnet_sd, prefix: str = "resnet."):
    """Rename resnet stages into the reference's nn.Sequential numbering."""
    inv = {v: k for k, v in _SEQ_TO_STAGE.items()}
    out = {}
    for k, v in resnet_sd.items():
        stage, _, tail = k.partition(".")
        out[f"{prefix}{inv[stage]}.{tail}"] = v
    return out


def encoder_caption_to_torch(params, stats, arch: str = "resnet152"):
    """EncoderCaption pytrees -> reference serve state_dict
    (encoder_model_state_dict layout)."""
    return _sequential_sd(_resnet_to_torch_sd(
        params["resnet"], stats["resnet"], arch))


def encoder_tagger_to_torch(params, stats, arch: str = "resnet152"):
    """EncoderTagger pytrees -> reference serve state_dict
    (model_state_dict layout: resnet.* + linear.*)."""
    import numpy as np
    sd = _sequential_sd(_resnet_to_torch_sd(
        params["resnet"], stats["resnet"], arch))
    sd["linear.weight"] = np.asarray(params["linear"]["w"]).T
    sd["linear.bias"] = np.asarray(params["linear"]["b"])
    return sd
