"""ResNet-152 as pure functions, NHWC, XLA-fused.

The reference consumes ``torchvision.models.resnet152(pretrained=True)``
(models/encoders/caption.py:17, models/encoders/tagger.py:18) as an opaque
substrate.  Here the architecture is implemented natively:

  * NHWC layout + HWIO kernels — the TPU-native convolution layout (XLA
    tiles channels onto the 128-lane axis).
  * Functional params/batch-stats pytrees; ``train`` switches BatchNorm
    between batch statistics (with running-stat update, momentum 0.1) and
    running statistics — the encoder is frozen in the reference recipe so
    eval-mode BN is the default path.
  * A converter from a torchvision ``state_dict`` (``load_torch_resnet``)
    so pretrained reference weights drop in: torch OIHW conv kernels
    transpose to HWIO.

Stage layout (torchvision resnet152): conv7x7/2 -> maxpool3x3/2 ->
bottleneck stages [3, 8, 36, 3] with widths [64, 128, 256, 512] (x4 expand).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
          "resnet152": (3, 8, 36, 3)}
WIDTHS = (64, 128, 256, 512)
EXPANSION = 4
BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Kaiming-normal fan_out (torchvision's conv init)."""
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def _bn_init(c, dtype=jnp.float32):
    return ({"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
            {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)})


def init_resnet(key, arch: str = "resnet152", dtype=jnp.float32
                ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    blocks = BLOCKS[arch]
    keys = iter(jax.random.split(key, 4 + sum(blocks) * 4))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = _conv_init(next(keys), 7, 7, 3, 64, dtype)
    params["bn1"], stats["bn1"] = _bn_init(64, dtype)

    cin = 64
    for stage, (n, width) in enumerate(zip(blocks, WIDTHS), start=1):
        cout = width * EXPANSION
        stride = 1 if stage == 1 else 2
        layer_p, layer_s = [], []
        for b in range(n):
            k1, k2, k3, k4 = jax.random.split(next(keys), 4)
            bp: Dict[str, Any] = {
                "conv1": _conv_init(k1, 1, 1, cin, width, dtype),
                "conv2": _conv_init(k2, 3, 3, width, width, dtype),
                "conv3": _conv_init(k3, 1, 1, width, cout, dtype),
            }
            bs: Dict[str, Any] = {}
            bp["bn1"], bs["bn1"] = _bn_init(width, dtype)
            bp["bn2"], bs["bn2"] = _bn_init(width, dtype)
            bp["bn3"], bs["bn3"] = _bn_init(cout, dtype)
            if b == 0 and (stride != 1 or cin != cout):
                bp["downsample_conv"] = _conv_init(k4, 1, 1, cin, cout, dtype)
                bp["downsample_bn"], bs["downsample_bn"] = _bn_init(cout, dtype)
            layer_p.append(bp)
            layer_s.append(bs)
            cin = cout
        params[f"layer{stage}"] = layer_p
        stats[f"layer{stage}"] = layer_s
    return params, stats


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _conv(x, w, stride: int, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, s, train: bool):
    """Returns (y, new_stats)."""
    if train:
        axes = (0, 1, 2)
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * (inv * p["scale"]) + p["bias"]
    return y.astype(x.dtype), new_s


def _max_pool_3x3s2(x):
    """torch MaxPool2d(3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _bottleneck(x, bp, bs, stride: int, train: bool):
    new_s: Dict[str, Any] = {}
    out, new_s["bn1"] = _bn(_conv(x, bp["conv1"], 1, "VALID"), bp["bn1"],
                            bs["bn1"], train)
    out = jax.nn.relu(out)
    out, new_s["bn2"] = _bn(
        _conv(out, bp["conv2"], stride, [(1, 1), (1, 1)]), bp["bn2"],
        bs["bn2"], train)
    out = jax.nn.relu(out)
    out, new_s["bn3"] = _bn(_conv(out, bp["conv3"], 1, "VALID"), bp["bn3"],
                            bs["bn3"], train)
    if "downsample_conv" in bp:
        identity, new_s["downsample_bn"] = _bn(
            _conv(x, bp["downsample_conv"], stride, "VALID"),
            bp["downsample_bn"], bs["downsample_bn"], train)
    else:
        identity = x
    return jax.nn.relu(out + identity), new_s


def apply_resnet(params, stats, x, *, train: bool = False,
                 arch: str = "resnet152"):
    """x: (B, H, W, 3) NHWC float -> feature map (B, H/32, W/32, 2048).

    Returns (features, new_batch_stats).  The classifier head is omitted
    (the reference strips it: encoders/caption.py:21, encoders/tagger.py:22).
    """
    blocks = BLOCKS[arch]
    new_stats: Dict[str, Any] = {}
    y = _conv(x, params["conv1"], 2, [(3, 3), (3, 3)])
    y, new_stats["bn1"] = _bn(y, params["bn1"], stats["bn1"], train)
    y = jax.nn.relu(y)
    y = _max_pool_3x3s2(y)
    for stage, n in enumerate(blocks, start=1):
        lp, ls = params[f"layer{stage}"], stats[f"layer{stage}"]
        new_stats[f"layer{stage}"] = []
        for b in range(n):
            stride = 2 if (b == 0 and stage > 1) else 1
            y, bs_new = _bottleneck(y, lp[b], ls[b], stride, train)
            new_stats[f"layer{stage}"].append(bs_new)
    return y, new_stats


# ---------------------------------------------------------------------------
# torchvision state_dict interop
# ---------------------------------------------------------------------------

def load_torch_resnet(state_dict, arch: str = "resnet152",
                      dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Convert a torchvision resnet state_dict (tensors or ndarrays) into
    (params, batch_stats).  Conv OIHW -> HWIO."""
    import numpy as np

    def arr(name):
        v = state_dict[name]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, dtype)

    def conv(name):
        return jnp.transpose(arr(name + ".weight"), (2, 3, 1, 0))

    def bn(name):
        return ({"scale": arr(name + ".weight"), "bias": arr(name + ".bias")},
                {"mean": arr(name + ".running_mean"),
                 "var": arr(name + ".running_var")})

    blocks = BLOCKS[arch]
    params: Dict[str, Any] = {"conv1": conv("conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage, n in enumerate(blocks, start=1):
        lp, ls = [], []
        for b in range(n):
            pre = f"layer{stage}.{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = conv(f"{pre}.conv{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = bn(f"{pre}.bn{i}")
            if f"{pre}.downsample.0.weight" in state_dict:
                bp["downsample_conv"] = conv(f"{pre}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = bn(
                    f"{pre}.downsample.1")
            lp.append(bp)
            ls.append(bs)
        params[f"layer{stage}"] = lp
        stats[f"layer{stage}"] = ls
    return params, stats
