"""Int8 post-training quantization of the backbone (ops/quant.py).

The float traversal must match the flax DarknetBackbone (eval mode) —
it is the calibration reference — and the int8 traversal must stay close
to float at the captured feature maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import (
    DarknetBackbone, mini_backbone_defs, yolov3_layer_defs,
)
from dcnet_tpu.ops import quant


def _init_backbone(defs, size, batch=2, seed=0):
    bb = DarknetBackbone(layer_defs=defs)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    variables = bb.init(jax.random.PRNGKey(seed), x, False)
    return bb, variables, x


@pytest.mark.parametrize("defs_fn,size", [
    (mini_backbone_defs, 64),
    (yolov3_layer_defs, 64),  # full 107-layer graph: shortcuts + routes
])
def test_fp_traversal_matches_flax(defs_fn, size):
    defs = defs_fn()
    bb, variables, x = _init_backbone(defs, size, batch=1)
    ref = bb.apply(variables, x, False)
    got = quant.backbone_apply_fp(defs, variables["params"],
                                  variables["batch_stats"], x)
    assert len(ref) == len(got) == 3
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_int8_features_close_to_fp():
    defs = mini_backbone_defs()
    bb, variables, x = _init_backbone(defs, 64, batch=4)
    params = variables["params"]
    stats = variables["batch_stats"]
    cal = quant.merge_calibration([quant.calibrate(defs, params, stats, x)])
    qp = quant.quantize_backbone(defs, params, stats, cal)
    fp = quant.backbone_apply_fp(defs, params, stats, x)
    q8 = jax.jit(lambda im: quant.backbone_apply_int8(defs, qp, im))(x)
    for f, q in zip(fp, q8):
        f, q = np.asarray(f, np.float64), np.asarray(q, np.float64)
        cos = (f * q).sum() / (np.linalg.norm(f) * np.linalg.norm(q) + 1e-12)
        rel = np.linalg.norm(f - q) / (np.linalg.norm(f) + 1e-12)
        assert cos > 0.995, cos
        assert rel < 0.12, rel


def test_int8_deterministic_and_int8_weights():
    defs = mini_backbone_defs()
    _, variables, x = _init_backbone(defs, 64)
    cal = quant.merge_calibration([quant.calibrate(
        defs, variables["params"], variables["batch_stats"], x)])
    qp = quant.quantize_backbone(defs, variables["params"],
                                 variables["batch_stats"], cal)
    for i in quant.conv_layer_ids(defs):
        assert qp[str(i)]["w"].dtype == jnp.int8
    a = quant.backbone_apply_int8(defs, qp, x)
    b = quant.backbone_apply_int8(defs, qp, x)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_calibration_scales_unseen_range():
    """Inputs beyond the calibrated range saturate instead of exploding."""
    defs = mini_backbone_defs()
    _, variables, x = _init_backbone(defs, 64)
    cal = quant.merge_calibration([quant.calibrate(
        defs, variables["params"], variables["batch_stats"], x)])
    qp = quant.quantize_backbone(defs, variables["params"],
                                 variables["batch_stats"], cal)
    out = quant.backbone_apply_int8(defs, qp, x * 10.0)
    for f in out:
        assert np.isfinite(np.asarray(f)).all()


def test_quant_extract_features_matches_model():
    """quant_extract_features == DCNet.extract_features within int8 error
    (the shared float mapping head runs on quantized backbone features)."""
    cfg = DCNetConfig(image_size=64, corpus_size=100, interframe_top_k=16,
                      interframe_neg_n=3, crossmodal_neg_n=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 100, (4, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, imgs[:2], ids[:2], train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    qp = quant.quantize_model_backbone(model, variables, imgs)
    fp = model.apply(variables, imgs, method=DCNet.extract_features)
    q8 = quant.quant_extract_features(model, variables, qp, imgs)
    for f, q in zip(fp, q8):
        f, q = np.asarray(f, np.float64), np.asarray(q, np.float64)
        cos = (f * q).sum() / (np.linalg.norm(f) * np.linalg.norm(q) + 1e-12)
        assert cos > 0.99, cos


def test_quantize_on_bf16_cast_params():
    """Quantization must be dtype-agnostic w.r.t. stored param dtype: the
    serving flow casts params to bf16 BEFORE engine.quantize() (ADVICE r2
    regression — fp_conv_fn used to crash on mixed f32/bf16 conv)."""
    from dcnet_tpu.serving.engine import cast_params_for_serving

    cfg = DCNetConfig(image_size=64, corpus_size=100, interframe_top_k=16,
                      interframe_neg_n=3, crossmodal_neg_n=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 100, (2, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, imgs, ids, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    fp32_qp = quant.quantize_model_backbone(model, variables, imgs)
    cast = cast_params_for_serving(variables)
    bf16_qp = quant.quantize_model_backbone(model, cast, imgs)
    # int8 weights must agree exactly up to the bf16 rounding of the source
    # kernel; scales stay fp32 either way
    for i in fp32_qp:
        assert bf16_qp[i]["w"].dtype == jnp.int8
        assert bf16_qp[i]["scale"].dtype == jnp.float32
        diff = np.abs(np.asarray(fp32_qp[i]["w"], np.int32)
                      - np.asarray(bf16_qp[i]["w"], np.int32))
        assert diff.max() <= 2, (i, diff.max())


def test_qparams_roundtrip(tmp_path):
    """save_qparams/load_qparams preserve dtypes and values exactly."""
    defs = mini_backbone_defs()
    _, variables, x = _init_backbone(defs, 64)
    cal = quant.merge_calibration([quant.calibrate(
        defs, variables["params"], variables["batch_stats"], x)])
    qp = quant.quantize_backbone(defs, variables["params"],
                                 variables["batch_stats"], cal)
    path = str(tmp_path / "backbone_int8.npz")
    quant.save_qparams(path, qp)
    qp2 = quant.load_qparams(path)
    assert set(qp2) == set(qp)
    for i in qp:
        for k in qp[i]:
            assert qp2[i][k].dtype == qp[i][k].dtype, (i, k)
            np.testing.assert_array_equal(np.asarray(qp2[i][k]),
                                          np.asarray(qp[i][k]))
    a = quant.backbone_apply_int8(defs, qp, x)
    b = quant.backbone_apply_int8(defs, qp2, x)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def _trunk_quant_setup():
    cfg = DCNetConfig(image_size=64, corpus_size=100, interframe_top_k=16,
                      interframe_neg_n=3, crossmodal_neg_n=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    n_frame = 5
    imgs = jnp.asarray(rng.rand(2 * n_frame, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 100, (2, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, imgs[:2], ids, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    return cfg, model, variables, imgs, ids, n_frame


def test_trunk_quant_close_to_fp():
    """cfg.trunk_quant='int8' (static-PTQ trunk convs) stays close to the
    float eval on the same params; the calibrated 'quant' collection has
    one act_max per trunk conv."""
    cfg, model, variables, imgs, ids, n_frame = _trunk_quant_setup()
    fp = model.apply(variables, imgs, ids, n_frame=n_frame,
                     method=DCNet.eval_clip)
    qcol = quant.calibrate_trunk(
        model, variables,
        lambda m, v: m.apply(v, imgs, ids, n_frame=n_frame,
                             method=type(m).eval_clip, mutable=["quant"]))
    from flax.traverse_util import flatten_dict
    leaves = flatten_dict(qcol)
    assert len(leaves) >= 9  # 3 mapping + 3 corr + 3 fcn stacks minimum
    assert all(float(v) > 0 for v in leaves.values())
    m8 = quant.trunk_quant_variant(model, "int8")
    q8 = m8.apply({**variables, "quant": qcol}, imgs, ids, n_frame=n_frame,
                  method=type(m8).eval_clip)
    for f, q in zip(fp.outbox, q8.outbox):
        f = np.asarray(f, np.float64).ravel()
        q = np.asarray(q, np.float64).ravel()
        cos = (f * q).sum() / (np.linalg.norm(f) * np.linalg.norm(q) + 1e-12)
        assert cos > 0.99, cos
    # fp path of the variant is IDENTICAL to the plain model (same params,
    # same arithmetic) — the quant machinery must not perturb mode='off'
    off = quant.trunk_quant_variant(model, "off")
    fp2 = off.apply(variables, imgs, ids, n_frame=n_frame,
                    method=type(off).eval_clip)
    for a, b in zip(fp.outbox, fp2.outbox):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trunk_scales_roundtrip(tmp_path):
    cfg, model, variables, imgs, ids, n_frame = _trunk_quant_setup()
    qcol = quant.calibrate_trunk(
        model, variables,
        lambda m, v: m.apply(v, imgs, ids, n_frame=n_frame,
                             method=type(m).eval_clip, mutable=["quant"]))
    path = str(tmp_path / "trunk_scales.npz")
    quant.save_trunk_scales(path, qcol)
    qcol2 = quant.load_trunk_scales(path)
    from flax.traverse_util import flatten_dict
    a, b = flatten_dict(qcol), flatten_dict(qcol2)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_sole_conv_consumer_full_graph():
    """Chain analysis on the full 107-layer graph: producers map only to
    conv consumers downstream; the residual-block 1x1->3x3 halves qualify
    but capture/route/shortcut-feeding convs must not."""
    defs = yolov3_layer_defs()
    chain = quant.sole_conv_consumer(defs)
    conv_ids = set(quant.conv_layer_ids(defs))
    for i, j in chain.items():
        assert i in conv_ids and j in conv_ids
        assert j > i
    assert len(chain) >= 20, len(chain)  # darknet-53 has 23 residual blocks
    # a conv whose output is captured as a feature map must stay float:
    # producers of yoloconvolutional inputs are never in the chain
    for j, ld in enumerate(defs):
        if ld.type == "yoloconvolutional":
            assert (j - 1) not in chain


def test_int8_chain_close_to_unchained():
    """Storing sole-consumer activations as int8 (skipping the float
    round-trip) stays close to the unchained int8 traversal and to fp."""
    defs = mini_backbone_defs()
    _, variables, x = _init_backbone(defs, 64, batch=4)
    cal = quant.merge_calibration([quant.calibrate(
        defs, variables["params"], variables["batch_stats"], x)])
    qp = quant.quantize_backbone(defs, variables["params"],
                                 variables["batch_stats"], cal)
    fp = quant.backbone_apply_fp(defs, variables["params"],
                                 variables["batch_stats"], x)
    plain = quant.backbone_apply_int8(defs, qp, x, int8_chain=False)
    chain = quant.backbone_apply_int8(defs, qp, x, int8_chain=True)
    for f, p, c in zip(fp, plain, chain):
        f = np.asarray(f, np.float64)
        p = np.asarray(p, np.float64)
        c = np.asarray(c, np.float64)
        cos_fp = (f * c).sum() / (np.linalg.norm(f) * np.linalg.norm(c) + 1e-12)
        rel_pc = np.linalg.norm(p - c) / (np.linalg.norm(p) + 1e-12)
        assert cos_fp > 0.995, cos_fp
        assert rel_pc < 0.05, rel_pc  # chain ~= plain (one fewer rounding)
