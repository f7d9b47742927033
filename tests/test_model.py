"""Integration tests for the full DCNet model at a small image size."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.losses import total_loss
from dcnet_tpu.models import DCNet
from dcnet_tpu.ops.decode import decode_best, flatten_scores
from dcnet_tpu.ops.target import build_target

CFG = DCNetConfig(
    image_size=64, corpus_size=50,
    interframe_top_k=8, interframe_neg_n=3, crossmodal_neg_n=3)


@pytest.fixture(scope="module")
def model_and_vars():
    from dcnet_tpu.models.darknet import mini_backbone_defs
    model = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    word_ids = jnp.asarray(rng.randint(1, 50, (4, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        images, word_ids, train=False)
    return model, variables, images, word_ids


def test_train_forward_shapes(model_and_vars):
    model, variables, images, word_ids = model_and_vars
    out, mutated = model.apply(
        variables, images, word_ids, train=True,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"])
    grids = CFG.grids
    assert [o.shape for o in out.outbox] == [(4, 3, 5, g, g) for g in grids]
    assert [s.shape for s in out.sim_score] == [(4, g, g) for g in grids]
    assert [s.shape for s in out.loc_score] == [(4, g, g) for g in grids]
    assert out.flang_attn.shape == (4, 512)
    assert out.interframe.q.shape == (2, 8, 512)       # B=2 clips
    assert out.interframe.neg.shape == (2, 8, 3, 512)
    assert out.crossmodal.q.shape == (4, 4, 512)       # P = 2*2 patches
    for o in out.outbox:
        assert bool(jnp.all(jnp.isfinite(o)))
    # loc_score in [0, 1] after min-max normalization
    for s in out.loc_score:
        assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 1.0 + 1e-5


@pytest.mark.heavy
def test_loss_and_gradients(model_and_vars):
    model, variables, images, word_ids = model_and_vars
    rng = np.random.RandomState(1)
    bbox = jnp.asarray(
        np.stack([rng.rand(4) * 30, rng.rand(4) * 30,
                  rng.rand(4) * 20 + 35, rng.rand(4) * 20 + 35], 1)
        .astype(np.float32))

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, word_ids, train=True,
            rngs={"sampling": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])[0]
        tgt = build_target(bbox, CFG)
        sim_flat = flatten_scores(out.sim_score)
        loc_flat = flatten_scores(out.loc_score)
        # neg sim: reversed-batch phrase attn vs fused features
        # (train_DCNet.py:623-627)
        neg_sim_flat = flatten_scores([
            jnp.einsum("bc,bhwc->bhw", out.flang_attn[::-1], f)
            for f in out.corr_feat])
        lb = total_loss(out.outbox, sim_flat, neg_sim_flat, loc_flat,
                        out.interframe, out.crossmodal, tgt, CFG)
        return lb.total, lb

    (loss, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(loss)
    for name in ("yolo", "rank", "loc", "interframe", "crossmodal"):
        assert np.isfinite(float(getattr(lb, name))), name
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    # backbone and heads both receive gradient
    gnorm = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    assert gnorm["visumodel"]["conv_0"]["kernel"] > 0
    assert gnorm["fcn_0"]["out1"]["kernel"] > 0
    assert gnorm["textmodel"]["embedding"]["embedding"] > 0


def test_eval_clip_center_frame(model_and_vars):
    model, variables, _, _ = model_and_vars
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(5, 64, 64, 3).astype(np.float32))  # B=1, n=5
    word_ids = jnp.asarray(rng.randint(1, 50, (1, 20)).astype(np.int32))
    out = model.apply(variables, images, word_ids, n_frame=5,
                      method=DCNet.eval_clip)
    assert [o.shape for o in out.outbox] == [(1, 3, 5, g, g) for g in CFG.grids]
    dec = decode_best(out.outbox, CFG)
    assert dec.boxes.shape == (1, 1, 4)
    assert bool(jnp.all(jnp.isfinite(dec.boxes)))


def test_single_image_baseline(model_and_vars):
    model, variables, _, _ = model_and_vars
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    word_ids = jnp.asarray(rng.randint(1, 50, (2, 20)).astype(np.int32))
    out = model.apply(variables, images, word_ids, method=DCNet.single_image)
    assert [o.shape for o in out.outbox] == [(2, 3, 5, g, g) for g in CFG.grids]


def test_eval_deterministic(model_and_vars):
    model, variables, _, _ = model_and_vars
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(5, 64, 64, 3).astype(np.float32))
    word_ids = jnp.asarray(rng.randint(1, 50, (1, 20)).astype(np.int32))
    o1 = model.apply(variables, images, word_ids, method=DCNet.eval_clip)
    o2 = model.apply(variables, images, word_ids, method=DCNet.eval_clip)
    np.testing.assert_allclose(np.asarray(o1.outbox[0]), np.asarray(o2.outbox[0]))


def test_light_variant_forward():
    """The --light model: single 1x1 fusion conv + plain head
    (DCNet_model.py:296-312)."""
    from dcnet_tpu.models.darknet import mini_backbone_defs
    cfg = DCNetConfig(image_size=64, corpus_size=50, light=True,
                      interframe_top_k=4, interframe_neg_n=3,
                      crossmodal_neg_n=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 50, (4, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, images, ids, train=False)
    # light fcn has no emb1/emb2/out0 blocks
    assert "emb1" not in variables["params"]["fcn_0"]
    assert "out0" not in variables["params"]["fcn_0"]
    out = model.apply(variables, images, ids, train=False)
    assert out.outbox[0].shape == (4, 3, 5, 2, 2)


def test_kframe_train_forward_ring():
    """k=3 train forward (ring pairing): correct shapes, and the ring is
    rotation-equivariant — rotating a clip's frames rotates corr_feat/outbox
    rows the same way (frame j's features depend only on frames j, j+1)."""
    import dataclasses
    from dcnet_tpu.models.darknet import mini_backbone_defs

    cfg = dataclasses.replace(CFG, n_frames_train=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.rand(3, 64, 64, 3).astype(np.float32))  # 1 clip
    word_ids = jnp.asarray(rng.randint(1, 50, (3, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        images, word_ids, train=False)

    def fwd(imgs, ids):
        out, _ = model.apply(
            variables, imgs, ids, train=True,
            rngs={"sampling": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        return out

    out = fwd(images, word_ids)
    assert [o.shape for o in out.outbox] == [(3, 3, 5, g, g)
                                             for g in cfg.grids]
    # interframe samples: one per ring edge => batch 3 (kB)
    assert out.interframe.q.shape[0] == 3

    # rotate the clip by one frame; language rows rotate with it
    rot_img = jnp.roll(images, -1, axis=0)
    rot_ids = jnp.roll(word_ids, -1, axis=0)
    out_rot = fwd(rot_img, rot_ids)
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(out_rot.corr_feat[s]),
            np.asarray(jnp.roll(out.corr_feat[s], -1, axis=0)),
            rtol=2e-4, atol=2e-5)


@pytest.mark.heavy
def test_kframe_train_step_end_to_end():
    """Full k=3 train step: finite 5-loss sum, params update."""
    import dataclasses
    from dcnet_tpu.models.darknet import mini_backbone_defs
    from dcnet_tpu.train.state import create_train_state
    from dcnet_tpu.train.step import train_step

    cfg = dataclasses.replace(CFG, n_frames_train=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(6)
    n = 6  # 2 clips x 3 frames
    batch = {
        "images": jnp.asarray(rng.rand(n, 64, 64, 3).astype(np.float32)),
        "word_ids": jnp.asarray(rng.randint(1, 50, (n, 20)).astype(np.int32)),
        "bbox": jnp.asarray(np.stack([
            rng.rand(n) * 10, rng.rand(n) * 10,
            rng.rand(n) * 20 + 30, rng.rand(n) * 20 + 30], 1)
            .astype(np.float32)),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               steps_per_epoch=10, sample_batch=batch)
    new_state, metrics = train_step(model, cfg, state, batch,
                                    jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    before = np.asarray(state.params["fcn_0"]["out1"]["kernel"])
    after = np.asarray(new_state.params["fcn_0"]["out1"]["kernel"])
    assert not np.allclose(before, after)


def test_split_corr_conv_matches_concat_float():
    """ConvBNReLU's split input form — (center, [att_r]) with the center
    half of the 1x1 contraction hoisted across references (the
    eval_features corr_conv optimization) — matches the plain concat conv
    on the same params, per reference."""
    from dcnet_tpu.models.heads import ConvBNReLU

    rng = np.random.RandomState(3)
    cen = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    atts = [jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
            for _ in range(4)]
    mod = ConvBNReLU(24, 1)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.concatenate([cen, atts[0]], -1), train=False)
    concat_out = [mod.apply(variables, jnp.concatenate([cen, a], -1),
                            train=False) for a in atts]
    split_out = mod.apply(variables, (cen, atts), train=False)
    assert len(split_out) == len(atts)
    for c, s in zip(concat_out, split_out):
        np.testing.assert_allclose(np.asarray(c), np.asarray(s),
                                   rtol=2e-5, atol=2e-5)


def test_split_corr_conv_matches_concat_int8():
    """The int8 split path quantizes both halves with the concat-calibrated
    scale and accumulates in int32 — BIT-identical to the concat int8 conv,
    and the calibration itself records the same act_max either way."""
    from dcnet_tpu.models.heads import ConvBNReLU

    rng = np.random.RandomState(4)
    cen = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    atts = [jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
            for _ in range(3)]
    calib = ConvBNReLU(24, 1, quant="calib")
    variables = calib.init(jax.random.PRNGKey(0),
                           jnp.concatenate([cen, atts[0]], -1), train=False)
    qcols = []
    for via_split in (False, True):
        qcol = {}
        for a in ([atts] if via_split else atts):
            x = (cen, a) if via_split else jnp.concatenate([cen, a], -1)
            _, mut = calib.apply({**variables, **qcol}, x, train=False,
                                 mutable=["quant"])
            qcol = {"quant": mut["quant"]}
        qcols.append(qcol["quant"])
    np.testing.assert_array_equal(
        np.asarray(qcols[0]["conv"]["act_max"]),
        np.asarray(qcols[1]["conv"]["act_max"]))

    i8 = ConvBNReLU(24, 1, quant="int8")
    v8 = {**variables, "quant": qcols[0]}
    concat_out = [i8.apply(v8, jnp.concatenate([cen, a], -1), train=False)
                  for a in atts]
    split_out = i8.apply(v8, (cen, atts), train=False)
    for c, s in zip(concat_out, split_out):
        np.testing.assert_array_equal(np.asarray(c), np.asarray(s))


def test_batched_ref_coattention_eval_parity(model_and_vars):
    """cfg.coattn_batch_refs (one dot_general over all references +
    stacked split corr_conv) preserves eval_features outputs; the int8
    QK-logits variant stays within quantization tolerance."""
    import dataclasses
    from dcnet_tpu.models.darknet import mini_backbone_defs

    model, variables, images, word_ids = model_and_vars
    base = model.apply(variables, images, word_ids[:1], n_frame=4,
                       method=DCNet.eval_clip)
    batched_model = DCNet(
        cfg=dataclasses.replace(CFG, coattn_batch_refs=True),
        backbone_defs=mini_backbone_defs())
    batched = batched_model.apply(variables, images, word_ids[:1],
                                  n_frame=4, method=DCNet.eval_clip)
    for b, s in zip(base.outbox, batched.outbox):
        np.testing.assert_allclose(np.asarray(b), np.asarray(s),
                                   rtol=2e-4, atol=2e-4)

    int8_model = DCNet(
        cfg=dataclasses.replace(CFG, coattn_batch_refs=True,
                                coattn_int8_logits=True),
        backbone_defs=mini_backbone_defs())
    int8_out = int8_model.apply(variables, images, word_ids[:1],
                                n_frame=4, method=DCNet.eval_clip)
    for b, s in zip(base.outbox, int8_out.outbox):
        # int8 logits perturb the attention softmax slightly; outputs
        # must stay close but not bit-equal
        np.testing.assert_allclose(np.asarray(b), np.asarray(s),
                                   rtol=0.08, atol=0.08)
