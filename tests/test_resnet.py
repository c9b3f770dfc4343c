"""ResNet building blocks vs torch primitives; encoder shapes.

torchvision is absent in this image, so the full pretrained graph can't be
compared end-to-end; instead every primitive (conv, BN train/eval, maxpool,
bottleneck, adaptive pool) is checked against torch ops, and the converter
is checked on a synthetic torch-layout state_dict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from indonesian_image_captioning_tpu.models import encoders, resnet
from indonesian_image_captioning_tpu.ops.adaptive_pool import adaptive_avg_pool2d


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_conv_matches_torch(rng):
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    w = rng.normal(size=(16, 3, 7, 7)).astype(np.float32)  # OIHW
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), stride=2, padding=3).numpy()
    got = resnet._conv(jnp.asarray(to_nhwc(x)),
                       jnp.asarray(np.transpose(w, (2, 3, 1, 0))), 2,
                       [(3, 3), (3, 3)])
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("train", [False, True])
def test_batchnorm_matches_torch(rng, train):
    C = 8
    x = rng.normal(size=(4, C, 5, 5)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(C)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.normal(size=C).astype(np.float32)))
        bn.bias.copy_(torch.tensor(rng.normal(size=C).astype(np.float32)))
        bn.running_mean.copy_(torch.tensor(rng.normal(size=C).astype(np.float32)))
        bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2, C).astype(np.float32)))
    # note: np.array(..., copy=True) — on the CPU backend jnp.asarray can
    # alias torch's buffer zero-copy, and torch updates running stats
    # in place during the forward below.
    p = {"scale": jnp.asarray(np.array(bn.weight.detach().numpy())),
         "bias": jnp.asarray(np.array(bn.bias.detach().numpy()))}
    s = {"mean": jnp.asarray(np.array(bn.running_mean.numpy())),
         "var": jnp.asarray(np.array(bn.running_var.numpy()))}

    bn.train(train)
    with torch.no_grad():
        ref = bn(torch.tensor(x)).numpy()
    got, new_s = resnet._bn(jnp.asarray(to_nhwc(x)), p, s, train)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4,
                               atol=1e-4)
    if train:  # running stats update must match torch momentum semantics
        np.testing.assert_allclose(np.asarray(new_s["mean"]),
                                   bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_s["var"]),
                                   bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_maxpool_matches_torch(rng):
    x = rng.normal(size=(2, 4, 11, 11)).astype(np.float32)
    ref = F.max_pool2d(torch.tensor(x), 3, stride=2, padding=1).numpy()
    got = resnet._max_pool_3x3s2(jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-5)


def test_bottleneck_matches_torch_composition(rng):
    """Oracle: the bottleneck dataflow composed from torch primitives."""
    cin, width, stride = 16, 8, 2
    cout = width * 4
    x = rng.normal(size=(2, cin, 9, 9)).astype(np.float32)

    def torch_conv(k, cin_, cout_, ksize):
        return torch.tensor(rng.normal(size=(cout_, cin_, ksize, ksize))
                            .astype(np.float32) * 0.1)

    w1 = torch_conv(0, cin, width, 1)
    w2 = torch_conv(1, width, width, 3)
    w3 = torch_conv(2, width, cout, 1)
    wd = torch_conv(3, cin, cout, 1)

    xt = torch.tensor(x)
    with torch.no_grad():
        out = F.relu(F.conv2d(xt, w1))
        out = F.relu(F.conv2d(out, w2, stride=stride, padding=1))
        out = F.conv2d(out, w3)
        idn = F.conv2d(xt, wd, stride=stride)
        ref = F.relu(out + idn).numpy()

    def ident_bn(c):
        return ({"scale": jnp.ones(c), "bias": jnp.zeros(c)},
                {"mean": jnp.zeros(c), "var": jnp.ones(c) - resnet.BN_EPS})

    bp, bs = {}, {}
    for name, w in (("conv1", w1), ("conv2", w2), ("conv3", w3)):
        bp[name] = jnp.asarray(np.transpose(w.numpy(), (2, 3, 1, 0)))
    bp["downsample_conv"] = jnp.asarray(np.transpose(wd.numpy(), (2, 3, 1, 0)))
    bp["bn1"], bs["bn1"] = ident_bn(width)
    bp["bn2"], bs["bn2"] = ident_bn(width)
    bp["bn3"], bs["bn3"] = ident_bn(cout)
    bp["downsample_bn"], bs["downsample_bn"] = ident_bn(cout)

    got, _ = resnet._bottleneck(jnp.asarray(to_nhwc(x)), bp, bs, stride,
                                train=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("n_in,n_out", [(8, 14), (7, 7), (14, 14), (10, 3)])
def test_adaptive_pool_matches_torch(rng, n_in, n_out):
    x = rng.normal(size=(2, 6, n_in, n_in)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.tensor(x), (n_out, n_out)).numpy()
    got = adaptive_avg_pool2d(jnp.asarray(to_nhwc(x)), (n_out, n_out))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4,
                               atol=1e-5)


def test_torch_state_dict_converter_shapes(rng):
    """Synthetic torchvision-format state_dict converts and runs (resnet50
    to keep CPU time small; the stage structure generalises)."""
    sd = {}

    def add_conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05

    def add_bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    cin = 64
    for stage, (n, width) in enumerate(zip(resnet.BLOCKS["resnet50"],
                                           resnet.WIDTHS), start=1):
        cout = width * 4
        for b in range(n):
            pre = f"layer{stage}.{b}"
            add_conv(pre + ".conv1", width, cin, 1)
            add_bn(pre + ".bn1", width)
            add_conv(pre + ".conv2", width, width, 3)
            add_bn(pre + ".bn2", width)
            add_conv(pre + ".conv3", cout, width, 1)
            add_bn(pre + ".bn3", cout)
            if b == 0:
                add_conv(pre + ".downsample.0", cout, cin, 1)
                add_bn(pre + ".downsample.1", cout)
            cin = cout

    params, stats = resnet.load_torch_resnet(sd, arch="resnet50")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    feat, _ = resnet.apply_resnet(params, stats, x, arch="resnet50")
    assert feat.shape == (1, 2, 2, 2048)


def test_encoder_shapes():
    key = jax.random.key(0)
    params, stats = encoders.init_encoder_caption(key, arch="resnet50")
    x = jnp.zeros((1, 96, 96, 3))
    out, _ = encoders.apply_encoder_caption(params, stats, x, arch="resnet50")
    assert out.shape == (1, 14, 14, 2048)

    tparams, tstats = encoders.init_encoder_tagger(key, arch="resnet50")
    tags, _ = encoders.apply_encoder_tagger(tparams, tstats, x, arch="resnet50")
    assert tags.shape == (1, 1000)
    assert (np.asarray(tags) >= 0).all() and (np.asarray(tags) <= 1).all()


def test_normalize_images():
    u8 = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
    out = encoders.normalize_images(u8)
    ref = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], ref, rtol=1e-5)
