"""Vectorized YOLO target construction.

TPU-native rewrite of `build_target` (`/root/reference/train_DCNet.py:265-332`),
which in the reference is a per-sample Python loop mixing CPU numpy and GPU
tensors. Here the whole batch is computed with static-shape vector ops.

Instead of materializing the sparse per-scale target tensors
(B, 3, 5, grid, grid), we return a *compact* target: the matched anchor,
cell, regression targets, and the flat one-hot indices the losses actually
consume. This is mathematically identical — all downstream consumers
(yolo/rank/loc losses, train metrics) only ever read the single non-zero
entry (train_DCNet.py:52-70, 173-220).

Key simplification: the reference computes 9 anchor IoUs, three per scale,
but gt and anchors are both rescaled by the same grid factor per scale, and
IoU is invariant under common scaling — so the 9 IoUs equal
wh_iou(gt_wh / size, anchors_full / anchor_imsize). We exploit that.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.ops.boxes import wh_iou


class CompactTarget(NamedTuple):
    """Per-sample matched ground truth. All fields have leading dim B."""

    best_n: jnp.ndarray        # (B,) int32 in [0, 9): global anchor index
    best_scale: jnp.ndarray    # (B,) int32 in [0, 3)
    anchor: jnp.ndarray        # (B,) int32 in [0, 3): anchor within scale
    gi: jnp.ndarray            # (B,) int32 grid column at best scale
    gj: jnp.ndarray            # (B,) int32 grid row at best scale
    txywh: jnp.ndarray         # (B, 4) float: tx, ty, tw, th regression target
    conf_idx: jnp.ndarray      # (B,) int32 flat index into the 3*sum(g^2) conf vector
    pos_idx: jnp.ndarray       # (B,) int32 flat index into the sum(g^2) position vector


def build_target(bbox_xyxy: jnp.ndarray, cfg: DCNetConfig) -> CompactTarget:
    """bbox_xyxy: (B, 4) ground-truth boxes in letterboxed pixels."""
    size = float(cfg.image_size)
    cx = (bbox_xyxy[:, 0] + bbox_xyxy[:, 2]) / (2.0 * size)  # normalized center
    cy = (bbox_xyxy[:, 1] + bbox_xyxy[:, 3]) / (2.0 * size)
    w = (bbox_xyxy[:, 2] - bbox_xyxy[:, 0]) / size
    h = (bbox_xyxy[:, 3] - bbox_xyxy[:, 1]) / size

    # 9 anchor IoUs at normalized scale (see module docstring).
    anchors = jnp.asarray(cfg.anchors_full, jnp.float32) / float(cfg.anchor_imsize)
    gt_wh = jnp.stack([w, h], axis=-1)  # (B, 2)
    ious = wh_iou(gt_wh[:, None, :], anchors[None, :, :])  # (B, 9)
    best_n = jnp.argmax(ious, axis=1).astype(jnp.int32)
    best_scale = best_n // 3
    anchor = best_n % 3

    grids = jnp.asarray(cfg.grids, jnp.int32)          # (3,)
    grid = grids[best_scale].astype(jnp.float32)        # (B,)
    gx, gy = cx * grid, cy * grid
    gi = jnp.clip(gx.astype(jnp.int32), 0, grids[best_scale] - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, grids[best_scale] - 1)
    tx = gx - gi.astype(jnp.float32)
    ty = gy - gj.astype(jnp.float32)

    # Per-scale scaled anchors: anchors_full / (anchor_imsize / grid)
    scaled = anchors * grid[:, None, None]              # (B, 9, 2) at best grid
    aw = jnp.take_along_axis(scaled[:, :, 0], best_n[:, None], axis=1)[:, 0]
    ah = jnp.take_along_axis(scaled[:, :, 1], best_n[:, None], axis=1)[:, 0]
    tw = jnp.log(w * grid / aw + 1e-16)
    th = jnp.log(h * grid / ah + 1e-16)
    txywh = jnp.stack([tx, ty, tw, th], axis=-1)

    conf_offs = jnp.asarray(cfg.scale_offsets(), jnp.int32)
    pos_offs = jnp.asarray(cfg.position_offsets(), jnp.int32)
    g = grids[best_scale]
    conf_idx = conf_offs[best_scale] + anchor * g * g + gj * g + gi
    pos_idx = pos_offs[best_scale] + gj * g + gi

    return CompactTarget(
        best_n=best_n, best_scale=best_scale, anchor=anchor,
        gi=gi, gj=gj, txywh=txywh,
        conf_idx=conf_idx.astype(jnp.int32), pos_idx=pos_idx.astype(jnp.int32),
    )
