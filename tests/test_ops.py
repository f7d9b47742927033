"""Unit tests for config, box math, target building, and decode.

Each test checks the JAX implementation against an independent numpy oracle
written from the reference's formulas (train_DCNet.py:265-332, 779-810;
utils/utils.py:25-104)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dcnet_tpu.config import DCNetConfig, anchors_for_dataset
from dcnet_tpu.ops import (
    bbox_iou, build_target, decode_best, decode_topk, flatten_conf,
    generate_coord, wh_iou, xywh2xyxy, xyxy2xywh,
)


# ---------------------------------------------------------------- config

def test_config_derived():
    cfg = DCNetConfig(image_size=256)
    assert cfg.grids == (8, 16, 32)
    assert cfg.all_positions == 1344          # the magic 1344 of the reference
    assert cfg.num_anchor_slots == 4032
    assert cfg.scale_offsets() == (0, 192, 960)
    assert cfg.position_offsets() == (0, 64, 320)
    assert cfg.textdim == 1024


def test_anchor_tables():
    coco = anchors_for_dataset("VID")
    assert coco[0] == (373, 326) and coco[-1] == (10, 13)  # reversed
    # the deliberate typo-compat switch
    assert anchors_for_dataset("referit", legacy_anchor_typo=True) == coco
    assert anchors_for_dataset("referit")[0] == (329, 285)


def test_scaled_anchors():
    cfg = DCNetConfig(image_size=256)
    # scale 0: grid 8, ratio 416/8=52
    got = cfg.scaled_anchors(0)
    for (gw, gh), (aw, ah) in zip(got, cfg.anchors_full[:3]):
        assert abs(gw - aw / 52.0) < 1e-9 and abs(gh - ah / 52.0) < 1e-9


# ---------------------------------------------------------------- boxes

def test_box_roundtrip():
    rng = np.random.RandomState(0)
    b = rng.rand(16, 4) * 200
    b[:, 2:] += b[:, :2] + 1.0  # proper xyxy
    out = np.asarray(xyxy2xywh(xywh2xyxy(xyxy2xywh(jnp.asarray(b)))))
    ref = np.stack([
        (b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
        b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_bbox_iou_matches_numpy():
    rng = np.random.RandomState(1)
    a = rng.rand(32, 4) * 100
    a[:, 2:] += a[:, :2]
    c = rng.rand(32, 4) * 100
    c[:, 2:] += c[:, :2]
    got = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(c)))
    # oracle
    x1 = np.maximum(a[:, 0], c[:, 0]); y1 = np.maximum(a[:, 1], c[:, 1])
    x2 = np.minimum(a[:, 2], c[:, 2]); y2 = np.minimum(a[:, 3], c[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    a2 = (c[:, 2] - c[:, 0]) * (c[:, 3] - c[:, 1])
    np.testing.assert_allclose(got, inter / (a1 + a2 - inter + 1e-16), rtol=1e-4, atol=1e-6)


def test_wh_iou_equals_corner_anchored_iou():
    # reference builds [0,0,w,h] xyxy boxes for anchor matching
    rng = np.random.RandomState(2)
    wh1 = rng.rand(8, 2) * 10 + 0.1
    wh2 = rng.rand(8, 2) * 10 + 0.1
    got = np.asarray(wh_iou(jnp.asarray(wh1), jnp.asarray(wh2)))
    a = np.concatenate([np.zeros((8, 2)), wh1], 1)
    b = np.concatenate([np.zeros((8, 2)), wh2], 1)
    ref = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_generate_coord():
    c = np.asarray(generate_coord(4, 4))
    assert c.shape == (8, 4, 4)
    # channel 0: (row*2 - W)/W
    np.testing.assert_allclose(c[0, 2, 1], (2 * 2 - 4) / 4)
    np.testing.assert_allclose(c[6], 0.25)  # 1/H
    np.testing.assert_allclose(c[4], (c[0] + c[2]) / 2)


# ---------------------------------------------------------------- target

def _oracle_build_target(bbox, cfg):
    """Literal numpy transcription of train_DCNet.py:265-332 semantics."""
    B = bbox.shape[0]
    anchors_full = np.array(cfg.anchors_full, np.float64)
    out = []
    for ii in range(B):
        anch_ious = []
        for s in range(3):
            grid = cfg.grids[s]
            coord = np.zeros(4)
            coord[0] = (bbox[ii, 0] + bbox[ii, 2]) / (2 * cfg.image_size) * grid
            coord[1] = (bbox[ii, 1] + bbox[ii, 3]) / (2 * cfg.image_size) * grid
            coord[2] = (bbox[ii, 2] - bbox[ii, 0]) / cfg.image_size * grid
            coord[3] = (bbox[ii, 3] - bbox[ii, 1]) / cfg.image_size * grid
            scaled = anchors_full[3 * s:3 * s + 3] / (cfg.anchor_imsize / grid)
            for aw, ah in scaled:
                inter = min(coord[2], aw) * min(coord[3], ah)
                anch_ious.append(inter / (coord[2] * coord[3] + aw * ah - inter + 1e-16))
        best_n = int(np.argmax(anch_ious))
        s = best_n // 3
        grid = cfg.grids[s]
        cx = (bbox[ii, 0] + bbox[ii, 2]) / (2 * cfg.image_size) * grid
        cy = (bbox[ii, 1] + bbox[ii, 3]) / (2 * cfg.image_size) * grid
        gw = (bbox[ii, 2] - bbox[ii, 0]) / cfg.image_size * grid
        gh = (bbox[ii, 3] - bbox[ii, 1]) / cfg.image_size * grid
        gi, gj = int(cx), int(cy)
        scaled = anchors_full[3 * s:3 * s + 3] / (cfg.anchor_imsize / grid)
        tw = np.log(gw / scaled[best_n % 3][0] + 1e-16)
        th = np.log(gh / scaled[best_n % 3][1] + 1e-16)
        out.append((best_n, gi, gj, cx - gi, cy - gj, tw, th))
    return out


def test_build_target_matches_reference_semantics():
    cfg = DCNetConfig(image_size=256)
    rng = np.random.RandomState(3)
    x1 = rng.rand(64) * 200
    y1 = rng.rand(64) * 200
    w = rng.rand(64) * 50 + 4
    h = rng.rand(64) * 50 + 4
    bbox = np.stack([x1, y1, np.minimum(x1 + w, 255), np.minimum(y1 + h, 255)], 1)
    tgt = build_target(jnp.asarray(bbox, jnp.float32), cfg)
    oracle = _oracle_build_target(bbox, cfg)
    for ii, (best_n, gi, gj, tx, ty, tw, th) in enumerate(oracle):
        assert int(tgt.best_n[ii]) == best_n, ii
        assert int(tgt.gi[ii]) == gi and int(tgt.gj[ii]) == gj
        np.testing.assert_allclose(
            np.asarray(tgt.txywh[ii]), [tx, ty, tw, th], rtol=1e-3, atol=1e-4)
        g = cfg.grids[best_n // 3]
        assert int(tgt.conf_idx[ii]) == cfg.scale_offsets()[best_n // 3] + \
            (best_n % 3) * g * g + gj * g + gi
        assert int(tgt.pos_idx[ii]) == cfg.position_offsets()[best_n // 3] + gj * g + gi


# ---------------------------------------------------------------- decode

def _random_outbox(rng, b, cfg):
    return [jnp.asarray(rng.randn(b, 3, 5, g, g).astype(np.float32))
            for g in cfg.grids]


def test_decode_best_matches_oracle():
    cfg = DCNetConfig(image_size=256)
    rng = np.random.RandomState(4)
    outbox = _random_outbox(rng, 6, cfg)
    dec = decode_best(outbox, cfg)
    conf = np.asarray(flatten_conf(outbox))
    for ii in range(6):
        idx = int(np.argmax(conf[ii]))
        # locate scale
        offs, s = cfg.scale_offsets(), 2
        for cand in range(3):
            g = cfg.grids[cand]
            if offs[cand] <= idx < offs[cand] + 3 * g * g:
                s = cand
                break
        g = cfg.grids[s]
        local = idx - offs[s]
        a, rem = local // (g * g), local % (g * g)
        gj, gi = rem // g, rem % g
        o = np.asarray(outbox[s])[ii, a, :, gj, gi]
        aw, ah = cfg.scaled_anchors(s)[a]
        stride = cfg.strides[s]
        cx = (1 / (1 + np.exp(-o[0])) + gi) * stride
        cy = (1 / (1 + np.exp(-o[1])) + gj) * stride
        bw = np.exp(o[2]) * aw * stride
        bh = np.exp(o[3]) * ah * stride
        ref = [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]
        np.testing.assert_allclose(np.asarray(dec.boxes[ii, 0]), ref, rtol=1e-4)
        assert int(dec.scale[ii, 0]) == s
        assert int(dec.best_n[ii, 0]) == s * 3 + a
        assert int(dec.gi[ii, 0]) == gi and int(dec.gj[ii, 0]) == gj
        np.testing.assert_allclose(float(dec.score[ii, 0]), o[4], rtol=1e-5)


def test_decode_topk_ordering():
    cfg = DCNetConfig(image_size=256)
    rng = np.random.RandomState(5)
    outbox = _random_outbox(rng, 2, cfg)
    dec = decode_topk(outbox, 5, cfg)
    assert dec.boxes.shape == (2, 5, 4)
    s = np.asarray(dec.score)
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # descending scores
    # top-1 of topk == best
    best = decode_best(outbox, cfg)
    np.testing.assert_allclose(np.asarray(best.boxes[:, 0]), np.asarray(dec.boxes[:, 0]), rtol=1e-5)


def test_dense_bn_relu_gram_factorization():
    """DenseBNReLU(gram_factors=...) equals the naive P x P Gram chain
    (both train and eval modes), including gradients."""
    import jax
    from dcnet_tpu.models.heads import DenseBNReLU

    rng = np.random.RandomState(0)
    B, P, E, C = 2, 84, 8, 16
    ce = rng.randn(B, P, E).astype(np.float32)
    ce = ce / np.linalg.norm(ce, axis=2, keepdims=True)
    obj = rng.randn(B, P).astype(np.float32)

    mod = DenseBNReLU(C)
    gram = np.einsum("bpe,bqe->bpq", ce, ce) * obj[:, None, :]
    flat = jnp.asarray(gram.reshape(-1, P))
    variables = mod.init(jax.random.PRNGKey(0), flat)

    for train in (False, True):
        naive = mod.apply(variables, flat, train, mutable=["batch_stats"])
        fact = mod.apply(variables, None, train,
                         gram_factors=(jnp.asarray(ce), jnp.asarray(obj)),
                         mutable=["batch_stats"])
        n_out, f_out = naive[0], fact[0]
        np.testing.assert_allclose(np.asarray(f_out), np.asarray(n_out),
                                   rtol=1e-4, atol=1e-4)
        if train:  # batch stats must update identically
            for leaf in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(fact[1]["batch_stats"]["bn"][leaf]),
                    np.asarray(naive[1]["batch_stats"]["bn"][leaf]),
                    rtol=1e-4, atol=1e-5)

    # gradients w.r.t. the Dense kernel agree
    def loss_naive(params):
        out = mod.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, flat)
        return jnp.sum(out ** 2)

    def loss_fact(params):
        out = mod.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        None, gram_factors=(jnp.asarray(ce), jnp.asarray(obj)))
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_naive)(variables["params"])
    g2 = jax.grad(loss_fact)(variables["params"])
    np.testing.assert_allclose(np.asarray(g2["fc"]["kernel"]),
                               np.asarray(g1["fc"]["kernel"]),
                               rtol=1e-3, atol=1e-4)
