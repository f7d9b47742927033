"""Tests for visualization, auxiliary losses, segmentation metrics, and the
vestigial YOLO detection layer."""

import numpy as np
import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.eval.metrics import compute_ap, multiclass_metrics, segmentation_metrics
from dcnet_tpu.eval.visualize import save_grounding_results
from dcnet_tpu.losses_extra import (
    confidence_loss, iou_loss, offset_loss, weighted_ce_loss,
)
from dcnet_tpu.ops.target import build_target
from dcnet_tpu.ops.yolo_detect import build_object_targets, yolo_detections

CFG = DCNetConfig(image_size=64)


def test_visualize_writes_jpegs(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.5
    pred = np.array([[5, 5, 30, 30], [10, 10, 50, 50]], np.float32)
    gt = pred + 3
    paths = save_grounding_results(pred, gt, imgs, ["a thing"], "train", 0,
                                   save_path=str(tmp_path))
    import os
    assert len(paths) == 2 and all(os.path.getsize(p) > 0 for p in paths)


def test_offset_and_confidence_losses_finite():
    rng = np.random.RandomState(1)
    outbox = [jnp.asarray(rng.randn(4, 3, 5, g, g).astype(np.float32))
              for g in CFG.grids]
    bbox = jnp.asarray(np.stack([
        rng.rand(4) * 20, rng.rand(4) * 20,
        rng.rand(4) * 20 + 30, rng.rand(4) * 20 + 30], 1).astype(np.float32))
    tgt = build_target(bbox, CFG)
    assert np.isfinite(float(offset_loss(outbox, tgt, CFG)))
    assert np.isfinite(float(confidence_loss(outbox)))
    # identical frames -> zero confidence loss
    same = [jnp.concatenate([o[0:1], o[0:1], o[2:3], o[2:3]]) for o in outbox]
    assert float(confidence_loss(same)) < 1e-10


def test_iou_and_weighted_ce():
    a = jnp.asarray([[0., 0., 10., 10.]])
    assert abs(float(iou_loss(a, a))) < 1e-6
    logits = jnp.asarray([[10.0, -10.0], [10.0, -10.0]])
    labels = jnp.asarray([0, 0])
    assert float(weighted_ce_loss(logits, labels)) < 1e-6


def test_segmentation_metrics_perfect():
    lt = [np.array([[0, 1], [2, 1]])]
    m = segmentation_metrics(lt, lt, 3)
    assert m["acc"] == 1.0 and m["mean_iu"] == 1.0


def test_compute_ap_and_multiclass():
    ap = compute_ap(np.array([0.5, 1.0]), np.array([1.0, 0.5]))
    assert 0.0 < ap <= 1.0
    m = multiclass_metrics(np.array([[0.9, 0.1]]), np.array([[1.0, 0.0]]))
    assert m["precision"] == 1.0 and m["recall"] == 1.0


def test_yolo_detections_decode():
    """Oracle: YOLOLayer eval decode (darknet.py:273-297) at one cell."""
    rng = np.random.RandomState(2)
    g, a, c = 4, 3, 80
    head = rng.randn(2, a * (5 + c), g, g).astype(np.float32)
    anchors = [(116, 90), (156, 198), (373, 326)]
    out = yolo_detections(jnp.asarray(head), anchors, c, img_dim=256)
    assert out.shape == (2, a * g * g, 85)
    pred = head.reshape(2, a, 5 + c, g, g)
    stride = 256 / g
    # check anchor 1, cell (2, 3) of batch 0
    i = 1 * g * g + 2 * g + 3
    sx = 1 / (1 + np.exp(-pred[0, 1, 0, 2, 3]))
    np.testing.assert_allclose(float(out[0, i, 0]), (sx + 3) * stride, rtol=1e-5)
    ew = np.exp(pred[0, 1, 2, 2, 3]) * (156 / (416 / g)) * stride
    np.testing.assert_allclose(float(out[0, i, 2]), ew, rtol=1e-4)


def test_build_object_targets_matches_loop_oracle():
    rng = np.random.RandomState(3)
    g, a = 8, 3
    anchors = [(1.5, 2.0), (3.0, 3.0), (5.0, 4.0)]
    targets = np.zeros((2, 4, 5), np.float32)
    # batch 0: two objects; batch 1: one object + padding
    targets[0, 0] = [5, 0.3, 0.4, 0.2, 0.3]
    targets[0, 1] = [12, 0.7, 0.2, 0.5, 0.4]
    targets[1, 0] = [3, 0.5, 0.5, 0.1, 0.1]
    out = build_object_targets(jnp.asarray(targets), anchors, g)

    for b in range(2):
        for t in range(4):
            row = targets[b, t]
            if np.abs(row).sum() == 0:
                continue
            gx, gy, gw, gh = row[1] * g, row[2] * g, row[3] * g, row[4] * g
            gi, gj = int(gx), int(gy)
            ious = []
            for aw, ah in anchors:
                inter = min(gw, aw) * min(gh, ah)
                ious.append(inter / (gw * gh + aw * ah - inter + 1e-16))
            bn = int(np.argmax(ious))
            assert float(out.mask[b, bn, gj, gi]) == 1.0
            assert float(out.tconf[b, bn, gj, gi]) == 1.0
            assert int(out.tcls[b, bn, gj, gi]) == int(row[0])
            np.testing.assert_allclose(
                np.asarray(out.txywh[b, bn, gj, gi]),
                [gx - gi, gy - gj,
                 np.log(gw / anchors[bn][0] + 1e-16),
                 np.log(gh / anchors[bn][1] + 1e-16)], rtol=1e-4, atol=1e-5)
            # ignore region zeroed except the responsible anchor
            for ai, iou in enumerate(ious):
                if iou > 0.5 and ai != bn:
                    assert float(out.conf_mask[b, ai, gj, gi]) == 0.0
    # padding rows must not mark anything at cell (0,0) unless a real obj is there
    assert float(out.mask[1, :, 0, 0].sum()) == 0.0


def test_offset_loss_matches_torch_oracle():
    """Oracle: train_DCNet.py:74-94 pairwise frame-offset MSE."""
    import torch
    rng = np.random.RandomState(9)
    outbox = [jnp.asarray(rng.randn(4, 3, 5, g, g).astype(np.float32))
              for g in CFG.grids]
    bbox = jnp.asarray(np.stack([
        rng.rand(4) * 20, rng.rand(4) * 20,
        rng.rand(4) * 20 + 30, rng.rand(4) * 20 + 30], 1).astype(np.float32))
    tgt = build_target(bbox, CFG)
    got = float(offset_loss(outbox, tgt, CFG))

    pred_bbox = torch.zeros(4, 4)
    gt_bbox = torch.zeros(4, 4)
    for ii in range(4):
        n = int(tgt.best_n[ii])
        gi, gj = int(tgt.gi[ii]), int(tgt.gj[ii])
        p = torch.from_numpy(np.asarray(outbox[n // 3]))
        pred_bbox[ii, 0:2] = torch.sigmoid(p[ii, n % 3, 0:2, gj, gi])
        pred_bbox[ii, 2:4] = p[ii, n % 3, 2:4, gj, gi]
        gt_bbox[ii] = torch.from_numpy(np.asarray(tgt.txywh[ii]))
    pred_bbox = pred_bbox.reshape(-1, 2, 4)
    gt_bbox = gt_bbox.reshape(-1, 2, 4)
    mse = torch.nn.MSELoss()
    ref = sum(
        mse(pred_bbox[:, 0, i] - pred_bbox[:, 1, i],
            gt_bbox[:, 0, i] - gt_bbox[:, 1, i]) for i in range(4)) * 5.0
    np.testing.assert_allclose(got, float(ref), rtol=1e-4)
