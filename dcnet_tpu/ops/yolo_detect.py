"""Full YOLOv3 80-class detection decode + target building (vestigial).

The reference carries a complete YOLO detection layer that DCNet executes
but discards (`/root/reference/model/darknet.py:245-375`, `obj_out=False`
at :427-431). Provided here (vectorized) for capability parity:
- `yolo_detections`: sigmoid/exp anchor decode of a (B, 3*(5+C), g, g) head
  output into (B, 3*g*g, 5+C) detections at image scale;
- `build_object_targets`: multi-object anchor assignment with the
  ignore-threshold conf mask (darknet.py:30-97), vectorized over the batch
  and padded object list.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from dcnet_tpu.ops.boxes import wh_iou

# COCO 91->80 category remap (darknet.py:18-28)
EXIST_ID = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90)


def coco_category_map() -> dict:
    return {cid: i for i, cid in enumerate(EXIST_ID)}


def yolo_detections(head_out: jnp.ndarray, anchors: Sequence[Tuple[float, float]],
                    num_classes: int, img_dim: int) -> jnp.ndarray:
    """head_out: (B, A*(5+C), g, g) NCHW-like (as produced by the backbone's
    det convs transposed) or (B, g, g, A*(5+C)) NHWC. Returns
    (B, A*g*g, 5+C): [x, y, w, h (image px), conf, class probs].
    Anchor scaling uses the hardcoded 416 of the reference (darknet.py:287).
    """
    a = len(anchors)
    attrs = 5 + num_classes
    if head_out.shape[1] == a * attrs:  # NCHW
        b, _, g, _ = head_out.shape
        pred = head_out.reshape(b, a, attrs, g, g).transpose(0, 1, 3, 4, 2)
    else:  # NHWC
        b, g, _, _ = head_out.shape
        pred = head_out.reshape(b, g, g, a, attrs).transpose(0, 3, 1, 2, 4)
    stride = img_dim / g
    gx = jax.lax.broadcasted_iota(jnp.float32, (g, g), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (g, g), 0)
    anchors_s = jnp.asarray(anchors, jnp.float32) / (416.0 / g)  # (A, 2)
    x = (jax.nn.sigmoid(pred[..., 0]) + gx) * stride
    y = (jax.nn.sigmoid(pred[..., 1]) + gy) * stride
    w = jnp.exp(pred[..., 2]) * anchors_s[None, :, None, None, 0] * stride
    h = jnp.exp(pred[..., 3]) * anchors_s[None, :, None, None, 1] * stride
    conf = jax.nn.sigmoid(pred[..., 4])
    cls = jax.nn.sigmoid(pred[..., 5:])
    out = jnp.concatenate(
        [jnp.stack([x, y, w, h, conf], axis=-1), cls], axis=-1)
    return out.reshape(b, a * g * g, attrs)


class ObjectTargets(NamedTuple):
    mask: jnp.ndarray       # (B, A, g, g) responsible-anchor mask
    conf_mask: jnp.ndarray  # (B, A, g, g) negatives mask (ignore region = 0)
    txywh: jnp.ndarray      # (B, A, g, g, 4)
    tconf: jnp.ndarray      # (B, A, g, g)
    tcls: jnp.ndarray       # (B, A, g, g) int class index


def build_object_targets(
    targets: jnp.ndarray, anchors: Sequence[Tuple[float, float]],
    grid_size: int, ignore_thres: float = 0.5,
) -> ObjectTargets:
    """targets: (B, T, 5) rows [class, cx, cy, w, h] normalized to [0, 1],
    zero rows = padding (darknet.py:48-57 skips all-zero rows).
    Vectorized over B and T with scatter updates."""
    b, t, _ = targets.shape
    a = len(anchors)
    g = grid_size
    anchors_a = jnp.asarray(anchors, jnp.float32)  # already grid-scaled
    valid = jnp.sum(jnp.abs(targets), axis=2) > 0                  # (B, T)
    gx = targets[..., 1] * g
    gy = targets[..., 2] * g
    gw = targets[..., 3] * g
    gh = targets[..., 4] * g
    gi = jnp.clip(gx.astype(jnp.int32), 0, g - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, g - 1)
    ious = wh_iou(jnp.stack([gw, gh], -1)[..., None, :],
                  anchors_a[None, None, :, :])                     # (B, T, A)
    best_n = jnp.argmax(ious, axis=2).astype(jnp.int32)

    mask = jnp.zeros((b, a, g, g), jnp.float32)
    conf_mask = jnp.ones((b, a, g, g), jnp.float32)
    txywh = jnp.zeros((b, a, g, g, 4), jnp.float32)
    tconf = jnp.zeros((b, a, g, g), jnp.float32)
    tcls = jnp.zeros((b, a, g, g), jnp.int32)

    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    # ignore region: anchors with IoU > thres at the object cell
    ign = (ious > ignore_thres) & valid[..., None]                  # (B, T, A)
    aidx = jnp.broadcast_to(jnp.arange(a)[None, None], (b, t, a))
    conf_mask = conf_mask.at[
        bidx[..., None].repeat(a, axis=2).reshape(-1),
        aidx.reshape(-1),
        gj[..., None].repeat(a, axis=2).reshape(-1),
        gi[..., None].repeat(a, axis=2).reshape(-1),
    ].add(-ign.astype(jnp.float32).reshape(-1))
    conf_mask = jnp.clip(conf_mask, 0.0, 1.0)

    # responsible anchor
    vw = valid.astype(jnp.float32)
    mask = mask.at[bidx.reshape(-1), best_n.reshape(-1),
                   gj.reshape(-1), gi.reshape(-1)].max(vw.reshape(-1))
    conf_mask = conf_mask.at[bidx.reshape(-1), best_n.reshape(-1),
                             gj.reshape(-1), gi.reshape(-1)].max(vw.reshape(-1))
    aw = anchors_a[best_n, 0]
    ah = anchors_a[best_n, 1]
    tx = gx - gi
    ty = gy - gj
    tw = jnp.log(gw / aw + 1e-16)
    th = jnp.log(gh / ah + 1e-16)
    vals = jnp.stack([tx, ty, tw, th], -1) * vw[..., None]
    txywh = txywh.at[bidx.reshape(-1), best_n.reshape(-1),
                     gj.reshape(-1), gi.reshape(-1)].set(vals.reshape(-1, 4))
    tconf = tconf.at[bidx.reshape(-1), best_n.reshape(-1),
                     gj.reshape(-1), gi.reshape(-1)].max(vw.reshape(-1))
    tcls = tcls.at[bidx.reshape(-1), best_n.reshape(-1),
                   gj.reshape(-1), gi.reshape(-1)].set(
        (targets[..., 0].astype(jnp.int32) * valid).reshape(-1))
    return ObjectTargets(mask, conf_mask, txywh, tconf, tcls)
