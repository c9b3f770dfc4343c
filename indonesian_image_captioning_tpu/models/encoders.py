"""Image encoders: caption feature encoder and 1000-concept tagger.

Parity targets:
  * EncoderCaption (reference models/encoders/caption.py:6-57): ResNet-152
    minus fc/avgpool, AdaptiveAvgPool2d -> (B, 14, 14, 2048).  The torch
    version permutes NCHW->NHWC at the end; we are NHWC throughout.
  * EncoderTagger (reference models/encoders/tagger.py:6-60): ResNet-152
    minus fc, global average pool -> dropout(0.15) -> Linear(2048, 1000)
    -> sigmoid.

``fine_tune`` is not a mutation here (no requires_grad in JAX): the trainers
simply choose which param subtrees receive optimizer updates; the reference
default freezes the whole ResNet (trains/attention_scn.py:56,93-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import TaggerConfig
from ..ops.adaptive_pool import adaptive_avg_pool2d
from . import resnet
from .layers import dropout, init_linear, linear


def init_encoder_caption(key, arch: str = "resnet152", dtype=jnp.float32):
    params, stats = resnet.init_resnet(key, arch, dtype)
    return {"resnet": params}, {"resnet": stats}


def apply_encoder_caption(params, stats, images, *, train: bool = False,
                          enc_image_size: int = 14, arch: str = "resnet152",
                          remat: bool = False):
    """images (B, H, W, 3) normalized -> (B, S, S, 2048), new_stats."""
    feat, new_stats = resnet.apply_resnet(
        params["resnet"], stats["resnet"], images, train=train, arch=arch,
        remat=remat)
    out = adaptive_avg_pool2d(feat, (enc_image_size, enc_image_size))
    return out, {"resnet": new_stats}


def init_encoder_tagger(key, cfg: TaggerConfig = TaggerConfig(),
                        arch: str = "resnet152", dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    rparams, rstats = resnet.init_resnet(k1, arch, dtype)
    params = {
        "resnet": rparams,
        "linear": init_linear(k2, cfg.feature_dim, cfg.semantic_size, dtype),
    }
    return params, {"resnet": rstats}


def apply_encoder_tagger(params, stats, images, *, train: bool = False,
                         dropout_rng=None, dropout_rate: float = 0.15,
                         arch: str = "resnet152", remat: bool = False):
    """images (B, H, W, 3) -> tag probabilities (B, semantic_size), stats."""
    feat, new_stats = resnet.apply_resnet(
        params["resnet"], stats["resnet"], images, train=train, arch=arch,
        remat=remat)
    pooled = feat.mean(axis=(1, 2))                     # global avg pool
    if train and dropout_rng is not None:
        pooled = dropout(dropout_rng, pooled, dropout_rate, deterministic=False)
    return jax.nn.sigmoid(linear(params["linear"], pooled)), {"resnet": new_stats}


# ImageNet normalisation used by every reference dataloader
# (trains/attention_scn.py:121-122).
IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_images(images_u8):
    """uint8 (B, H, W, 3) -> normalized float32 (matches reference
    transforms: /255 then Normalize(mean, std))."""
    x = images_u8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def caption_encoder_trainable_mask(params):
    """True for the fine-tunable subtree: resnet stages 2-4 (reference
    EncoderCaption.fine_tune tunes children()[5:] of the stripped
    Sequential = layer2..layer4, encoders/caption.py:46-57)."""
    def mask_resnet(tree):
        return {k: jax.tree.map(
            lambda _: k in ("layer2", "layer3", "layer4"), v)
            for k, v in tree.items()}
    return {"resnet": mask_resnet(params["resnet"])}
