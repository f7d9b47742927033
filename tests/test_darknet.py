"""Backbone tests: cfg parity, torch cross-check, weights IO round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcnet_tpu.models import (
    DarknetBackbone, load_darknet_weights, parse_darknet_cfg,
    random_darknet_weights_file, save_darknet_weights, yolov3_layer_defs,
)

REF_CFG = "/root/reference/model/yolov3.cfg"


def test_programmatic_builder_matches_reference_cfg():
    """yolov3_layer_defs() must equal the parsed reference cfg exactly."""
    if not os.path.exists(REF_CFG):
        pytest.skip("reference cfg not available")
    _, parsed = parse_darknet_cfg(REF_CFG)
    built = yolov3_layer_defs(num_classes=80)
    assert len(parsed) == len(built) == 107
    for i, (a, b) in enumerate(zip(parsed, built)):
        assert a == b, f"layer {i}: {a} != {b}"


def _small_defs():
    """A miniature net covering conv/bn/leaky, shortcut, route, upsample,
    a no-bn linear conv, and a yoloconvolutional capture."""
    from dcnet_tpu.models.darknet import _blocks_to_defs
    blocks = [
        {"type": "convolutional", "filters": "8", "size": "3", "stride": "1",
         "pad": "1", "batch_normalize": "1", "activation": "leaky"},
        {"type": "convolutional", "filters": "16", "size": "3", "stride": "2",
         "pad": "1", "batch_normalize": "1", "activation": "leaky"},
        {"type": "convolutional", "filters": "8", "size": "1", "stride": "1",
         "pad": "1", "batch_normalize": "1", "activation": "leaky"},
        {"type": "convolutional", "filters": "16", "size": "3", "stride": "1",
         "pad": "1", "batch_normalize": "1", "activation": "leaky"},
        {"type": "shortcut", "from": "-3"},
        {"type": "yoloconvolutional", "filters": "8", "size": "1", "stride": "1",
         "pad": "1", "batch_normalize": "1", "activation": "leaky"},
        {"type": "route", "layers": "-3"},
        {"type": "upsample", "stride": "2"},
        {"type": "route", "layers": "-1, 0"},
        {"type": "yoloconvolutional", "filters": "4", "size": "1", "stride": "1",
         "pad": "1", "batch_normalize": "0", "activation": "linear"},
    ]
    return _blocks_to_defs(blocks, 3)


def _torch_forward(defs, weights_path, x_nchw):
    """Independent torch oracle executing the same LayerDef program."""
    import torch
    import torch.nn.functional as F

    with open(weights_path, "rb") as f:
        np.frombuffer(f.read(20), np.int32)
        w = np.frombuffer(f.read(), np.float32)
    ptr = 0

    def take(n):
        nonlocal ptr
        out = w[ptr:ptr + n].copy()
        ptr += n
        return torch.from_numpy(out)

    x = torch.from_numpy(x_nchw)
    outs, captured = [], []
    for ld in defs:
        if ld.type in ("convolutional", "yoloconvolutional"):
            if ld.type == "yoloconvolutional":
                captured.append(x)
            c_out, c_in, k = ld.out_filters, ld.in_filters, ld.size
            if ld.batch_normalize:
                beta, gamma = take(c_out), take(c_out)
                mean, var = take(c_out), take(c_out)
                bias = None
            else:
                bias = take(c_out)
            kernel = take(c_out * c_in * k * k).reshape(c_out, c_in, k, k)
            x = F.conv2d(x, kernel, bias, stride=ld.stride, padding=ld.pad)
            if ld.batch_normalize:
                x = F.batch_norm(x, mean, var, gamma, beta, False, 0.0, 1e-5)
            if ld.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
        elif ld.type == "route":
            x = torch.cat([outs[s] for s in ld.layers], 1)
        elif ld.type == "shortcut":
            x = outs[-1] + outs[ld.from_]
        elif ld.type == "upsample":
            x = x[:, :, :, None, :, None].expand(-1, -1, -1, 2, -1, 2) \
                .reshape(x.size(0), x.size(1), x.size(2) * 2, x.size(3) * 2)
        outs.append(x)
    return [c.numpy() for c in captured]


def test_small_net_matches_torch(tmp_path):
    defs = _small_defs()
    wpath = str(tmp_path / "w.weights")
    random_darknet_weights_file(defs, wpath, seed=7, scale=0.2)

    variables, header = load_darknet_weights(defs, wpath)
    assert list(header) == [0, 2, 0, 0, 0]
    model = DarknetBackbone(layer_defs=defs)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        feats = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    ref = _torch_forward(defs, wpath, x)
    assert len(feats) == len(ref) == 2
    for f, r in zip(feats, ref):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), r, rtol=1e-4, atol=1e-5)


@pytest.mark.heavy
def test_full_yolov3_against_torch(tmp_path):
    defs = yolov3_layer_defs()
    wpath = str(tmp_path / "yolo.weights")
    random_darknet_weights_file(defs, wpath, seed=1)
    variables, _ = load_darknet_weights(defs, wpath)
    model = DarknetBackbone(layer_defs=defs)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        feats = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    shapes = [tuple(f.shape) for f in feats]
    assert shapes == [(1, 2, 2, 1024), (1, 4, 4, 512), (1, 8, 8, 256)]

    ref = _torch_forward(defs, wpath, x)
    for f, r in zip(feats, ref):
        # random weights blow activations up to ~1e5 over 75 layers; compare
        # with tolerance scaled to the feature magnitude
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), r,
            rtol=2e-3, atol=1e-4 * max(1.0, float(np.abs(r).max())))


def test_weights_roundtrip(tmp_path):
    defs = _small_defs()
    w1 = str(tmp_path / "a.weights")
    w2 = str(tmp_path / "b.weights")
    random_darknet_weights_file(defs, w1, seed=3)
    variables, header = load_darknet_weights(defs, w1)
    save_darknet_weights(defs, variables, w2, header=header)
    assert open(w1, "rb").read() == open(w2, "rb").read()


def test_batchnorm_momentum_semantics():
    """flax momentum 0.9 == torch momentum 0.1 (backbone BN default)."""
    import torch
    defs = _small_defs()[:1]
    model = DarknetBackbone(layer_defs=defs)
    rng = np.random.RandomState(4)
    x = rng.randn(4, 8, 8, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    with jax.default_matmul_precision("highest"):
        _, updated = model.apply(variables, jnp.asarray(x), train=True,
                                 mutable=["batch_stats"])
    new_mean = np.asarray(updated["batch_stats"]["bn_0"]["mean"])

    kernel = np.asarray(variables["params"]["conv_0"]["kernel"])
    tconv = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(kernel.transpose(3, 2, 0, 1)), padding=1)
    tbn = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    tbn.train()
    tbn(tconv)
    np.testing.assert_allclose(new_mean, tbn.running_mean.detach().numpy(),
                               rtol=1e-3, atol=1e-5)
