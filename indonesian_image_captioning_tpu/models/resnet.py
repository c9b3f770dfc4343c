"""ResNet-152 as pure functions, NHWC, with scanned residual stages.

The reference consumes ``torchvision.models.resnet152(pretrained=True)``
(models/encoders/caption.py:17, models/encoders/tagger.py:18) as an opaque
substrate.  Here the architecture is implemented natively:

  * NHWC layout + HWIO kernels — the TPU-native convolution layout (XLA
    tiles channels onto the 128-lane axis).
  * **Scanned stages**: every residual stage's blocks after the first are
    structurally identical, so their parameters are STACKED and the stage
    runs as one ``lax.scan`` — the 36-block stage 3 of ResNet-152 compiles
    one block body instead of 36 inlined copies (an order of magnitude off
    XLA compile time; the MXU work is identical).
  * Functional params/batch-stats pytrees; ``train`` switches BatchNorm
    between batch statistics (with running-stat update, momentum 0.1) and
    running statistics — the encoder is frozen in the reference recipe so
    eval-mode BN is the default path.
  * A converter from a torchvision ``state_dict`` (``load_torch_resnet``)
    so pretrained reference weights drop in (torch OIHW -> HWIO).

Stage layout (torchvision resnet152): conv7x7/2 -> maxpool3x3/2 ->
bottleneck stages [3, 8, 36, 3] with widths [64, 128, 256, 512] (x4 expand).

Parameter tree per stage: {"first": <block with downsample>,
"rest": <blocks 1..n-1 with leaves stacked on a leading axis>}.
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


def _block_init(key, cin, width, cout, downsample: bool, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bp: Dict[str, Any] = {
        "conv1": _conv_init(k1, 1, 1, cin, width, dtype),
        "conv2": _conv_init(k2, 3, 3, width, width, dtype),
        "conv3": _conv_init(k3, 1, 1, width, cout, dtype),
    }
    bs: Dict[str, Any] = {}
    bp["bn1"], bs["bn1"] = _bn_init(width, dtype)
    bp["bn2"], bs["bn2"] = _bn_init(width, dtype)
    bp["bn3"], bs["bn3"] = _bn_init(cout, dtype)
    if downsample:
        bp["downsample_conv"] = _conv_init(k4, 1, 1, cin, cout, dtype)
        bp["downsample_bn"], bs["downsample_bn"] = _bn_init(cout, dtype)
    return bp, bs


def init_resnet(key, arch: str = "resnet152", dtype=jnp.float32
                ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    blocks = BLOCKS[arch]
    keys = iter(jax.random.split(key, 2 + sum(blocks)))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = _conv_init(next(keys), 7, 7, 3, 64, dtype)
    params["bn1"], stats["bn1"] = _bn_init(64, dtype)

    cin = 64
    for stage, (n, width) in enumerate(zip(blocks, WIDTHS), start=1):
        cout = width * EXPANSION
        first_p, first_s = _block_init(next(keys), cin, width, cout,
                                       downsample=True, dtype=dtype)
        rest_p, rest_s = [], []
        for _ in range(n - 1):
            bp, bs = _block_init(next(keys), cout, width, cout,
                                 downsample=False, dtype=dtype)
            rest_p.append(bp)
            rest_s.append(bs)
        params[f"layer{stage}"] = {"first": first_p, "rest": _stack(rest_p)}
        stats[f"layer{stage}"] = {"first": first_s, "rest": _stack(rest_s)}
        cin = cout
    return params, stats


def _stack(trees):
    if not trees:
        return None
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _conv(x, w, stride: int, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, s, train):
    """Returns (y, new_stats).

    train: False = eval (running stats); True = train (batch stats,
    torch-momentum EMA update with UNBIASED variance — torchvision
    parity); "calibrate" = train-mode normalisation but new_stats are the
    BIASED batch statistics themselves, so a subsequent eval-mode forward
    reproduces this train-mode forward exactly.  (The torch unbiased-EMA
    form systematically over-estimates variance by n/(n-1) per layer,
    which compounds across a ResNet-152's ~160 BNs when the per-layer
    sample count is small.)
    """
    if train:
        axes = (0, 1, 2)
        # batch statistics always reduce in f32: a bf16 mean over a
        # (B, H, W) slab loses mantissa long before the EMA does, and the
        # stored running stats are f32 master state under mixed precision
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        # clamp: XLA may fuse variance as E[x^2] - E[x]^2, whose
        # cancellation can go slightly NEGATIVE on low-diversity batches —
        # stored negative var then blows up eval's rsqrt(var + eps)
        var = jnp.maximum(jnp.var(xf, axes), 0.0)
        if train == "calibrate":
            new_s = {"mean": mean, "var": var}
        else:
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
    from jax.ad_checkpoint import checkpoint_name
    new_s: Dict[str, Any] = {}
    out = checkpoint_name(_conv(x, bp["conv1"], 1, "VALID"), "rn_conv")
    out, new_s["bn1"] = _bn(out, bp["bn1"], bs["bn1"], train)
    out = jax.nn.relu(out)
    out = checkpoint_name(
        _conv(out, bp["conv2"], stride, [(1, 1), (1, 1)]), "rn_conv")
    out, new_s["bn2"] = _bn(out, bp["bn2"], bs["bn2"], train)
    out = jax.nn.relu(out)
    out = checkpoint_name(_conv(out, bp["conv3"], 1, "VALID"), "rn_conv")
    out, new_s["bn3"] = _bn(out, bp["bn3"], bs["bn3"], train)
    if "downsample_conv" in bp:
        identity = checkpoint_name(
            _conv(x, bp["downsample_conv"], stride, "VALID"), "rn_conv")
        identity, new_s["downsample_bn"] = _bn(
            identity, bp["downsample_bn"], bs["downsample_bn"], train)
    else:
        identity = x
    return jax.nn.relu(out + identity), new_s


def _remat_block(remat):
    """remat=False|True|"blocks"|"convs" -> the (possibly rematerialised)
    bottleneck fn.

    "blocks" (== True, the original mode): autodiff saves only each
    block's INPUT and recomputes the whole block — convolutions included —
    in the backward pass (~one extra forward of conv FLOPs).
    "convs": autodiff additionally saves the four in-block conv outputs
    (jax.checkpoint_policies.save_only_these_names) and recomputes only
    the cheap BN/relu elementwise work backward — ~2.5x the activation
    memory of "blocks" but almost no recompute FLOPs.  Both modes are
    numerically identical to no-remat.
    """
    if not remat:
        return _bottleneck
    if remat == "convs":
        policy = jax.checkpoint_policies.save_only_these_names("rn_conv")
        return jax.checkpoint(_bottleneck, static_argnums=(3, 4),
                              policy=policy)
    return jax.checkpoint(_bottleneck, static_argnums=(3, 4))


def _stage(x, sp, ss, stride: int, train: bool, remat=False):
    """First block explicit (stride/downsample), remaining blocks scanned.

    remat rematerialises each bottleneck (see _remat_block): without it,
    differentiating through the scanned stages keeps every block's
    intermediate activations live — at 256px batch 128 that exceeds HBM
    (the early stages hold (B, 64, 64, 256) f32 tensors per block).
    """
    block = _remat_block(remat)
    y, first_s = block(x, sp["first"], ss["first"], stride, train)
    if sp["rest"] is None:
        return y, {"first": first_s, "rest": None}

    def body(carry, pbs):
        bp, bs = pbs
        out, ns = block(carry, bp, bs, 1, train)
        return out, ns

    y, rest_s = jax.lax.scan(body, y, (sp["rest"], ss["rest"]))
    return y, {"first": first_s, "rest": rest_s}


def apply_resnet(params, stats, x, *, train: bool = False,
                 arch: str = "resnet152", remat=False):
    """x: (B, H, W, 3) NHWC float -> feature map (B, H/32, W/32, 2048).

    Returns (features, new_batch_stats).  The classifier head is omitted
    (the reference strips it: encoders/caption.py:21, encoders/tagger.py:22).
    remat: rematerialise bottlenecks under autodiff (see _stage).
    """
    blocks = BLOCKS[arch]
    new_stats: Dict[str, Any] = {}
    y = _conv(x, params["conv1"], 2, [(3, 3), (3, 3)])
    y, new_stats["bn1"] = _bn(y, params["bn1"], stats["bn1"], train)
    y = jax.nn.relu(y)
    y = _max_pool_3x3s2(y)
    for stage in range(1, len(blocks) + 1):
        stride = 1 if stage == 1 else 2
        y, new_stats[f"layer{stage}"] = _stage(
            y, params[f"layer{stage}"], stats[f"layer{stage}"], stride,
            train, remat)
    return y, new_stats


# ---------------------------------------------------------------------------
# torchvision state_dict interop
# ---------------------------------------------------------------------------

def load_torch_resnet(state_dict, arch: str = "resnet152",
                      dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Convert a torchvision resnet state_dict (tensors or ndarrays) into
    (params, batch_stats).  Conv OIHW -> HWIO; rest-blocks stacked."""
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

    def block(pre, downsample):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for i in (1, 2, 3):
            bp[f"conv{i}"] = conv(f"{pre}.conv{i}")
            bp[f"bn{i}"], bs[f"bn{i}"] = bn(f"{pre}.bn{i}")
        if downsample:
            bp["downsample_conv"] = conv(f"{pre}.downsample.0")
            bp["downsample_bn"], bs["downsample_bn"] = bn(f"{pre}.downsample.1")
        return bp, bs

    blocks = BLOCKS[arch]
    params: Dict[str, Any] = {"conv1": conv("conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage, n in enumerate(blocks, start=1):
        first_p, first_s = block(
            f"layer{stage}.0",
            downsample=f"layer{stage}.0.downsample.0.weight" in state_dict)
        rest = [block(f"layer{stage}.{b}", False) for b in range(1, n)]
        params[f"layer{stage}"] = {"first": first_p,
                                   "rest": _stack([p for p, _ in rest])}
        stats[f"layer{stage}"] = {"first": first_s,
                                  "rest": _stack([s for _, s in rest])}
    return params, stats
