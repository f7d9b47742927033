"""Vectorized box utilities (JAX).

TPU-native rewrite of `/root/reference/utils/utils.py:25-104`. All functions
are pure, jit-safe, and operate on arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyxy2xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[x1, y1, x2, y2] -> [cx, cy, w, h] (utils/utils.py:25-31)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[cx, cy, w, h] -> [x1, y1, x2, y2] (utils/utils.py:34-40)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, xyxy: bool = True) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays (..., 4) (utils/utils.py:76-104)."""
    if not xyxy:
        box1 = xywh2xyxy(box1)
        box2 = xywh2xyxy(box2)
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    a2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    return inter / (a1 + a2 - inter + 1e-16)


def bbox_iou_pairwise(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU matrix (utils/utils.py:42-73)."""
    return bbox_iou(box1[:, None, :], box2[None, :, :])


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU of boxes described only by (w, h), both centered at the origin.

    Used for anchor matching (train_DCNet.py:299-303 builds [0,0,w,h] boxes
    in xyxy form; for zero-origin corners that IoU reduces to this).
    """
    w1, h1 = wh1[..., 0], wh1[..., 1]
    w2, h2 = wh2[..., 0], wh2[..., 1]
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    return inter / (w1 * h1 + w2 * h2 - inter + 1e-16)
