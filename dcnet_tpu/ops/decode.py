"""Jitted YOLO box decoding.

TPU-native rewrite of the numpy/python decode paths in the reference
(`/root/reference/train_DCNet.py:779-810`, `test_DCNet.py:501-543,657-701`):
flat argmax over the concatenated conf maps, scale selection by index range,
then box = (sigmoid(tx)+gi, sigmoid(ty)+gj, exp(tw)*aw, exp(th)*ah) * stride.

The reference re-finds the argmax cell with `np.where(conf == max)` on CPU;
here the flat index is decomposed arithmetically, which is equivalent
(modulo ties, which np.where also resolves by first occurrence).
Supports top-k decoding in one pass for the cache writer (test_DCNet.py:602).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.ops.boxes import xywh2xyxy


class DecodedBoxes(NamedTuple):
    boxes: jnp.ndarray   # (B, K, 4) xyxy in letterboxed pixel coords
    score: jnp.ndarray   # (B, K) conf value at the decoded slot
    best_n: jnp.ndarray  # (B, K) global anchor index (scale*3 + anchor)
    scale: jnp.ndarray   # (B, K)
    gi: jnp.ndarray      # (B, K)
    gj: jnp.ndarray      # (B, K)


def flatten_conf(outbox: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-scale (B, 3, 5, g, g) -> (B, 3*sum(g^2)) conf vector.

    Matches the reference layout: per scale, anchor-major then row then col
    (train_DCNet.py:62-66 uses .view(batch, -1) on (B, 3, g, g)).
    """
    b = outbox[0].shape[0]
    return jnp.concatenate([o[:, :, 4].reshape(b, -1) for o in outbox], axis=1)


def flatten_scores(scores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-scale (B, g, g) score maps -> (B, sum(g^2)) position vector."""
    b = scores[0].shape[0]
    return jnp.concatenate([s.reshape(b, -1) for s in scores], axis=1)


def decode_indices(
    outbox: Sequence[jnp.ndarray], flat_idx: jnp.ndarray, cfg: DCNetConfig
) -> DecodedBoxes:
    """Decode boxes at flat conf indices. flat_idx: (B, K) int32."""
    offs = cfg.scale_offsets()
    strides = cfg.strides
    grids = cfg.grids
    b, k = flat_idx.shape

    cand_boxes: List[jnp.ndarray] = []
    cand_score: List[jnp.ndarray] = []
    cand_meta: List[jnp.ndarray] = []  # (B, K, 4): anchor, gj, gi, valid
    for s, o in enumerate(outbox):
        g = grids[s]
        local = flat_idx - offs[s]
        valid = (local >= 0) & (local < 3 * g * g)
        local = jnp.clip(local, 0, 3 * g * g - 1)
        anchor = local // (g * g)
        rem = local % (g * g)
        gj, gi = rem // g, rem % g
        # Gather the 5 box attrs at (anchor, :, gj, gi) for each (b, k).
        flat = o.reshape(b, 3, 5, g * g)  # (B, 3, 5, g*g)
        cell = gj * g + gi                # (B, K)
        picked = jax.vmap(  # over batch
            lambda fo, a, c: fo[a, :, c], in_axes=(0, 0, 0)
        )(flat, anchor, cell)             # (B, K, 5)
        anchors_s = jnp.asarray(cfg.scaled_anchors(s), jnp.float32)  # (3, 2)
        aw = anchors_s[anchor, 0]
        ah = anchors_s[anchor, 1]
        cx = (jax.nn.sigmoid(picked[..., 0]) + gi) * strides[s]
        cy = (jax.nn.sigmoid(picked[..., 1]) + gj) * strides[s]
        bw = jnp.exp(picked[..., 2]) * aw * strides[s]
        bh = jnp.exp(picked[..., 3]) * ah * strides[s]
        cand_boxes.append(xywh2xyxy(jnp.stack([cx, cy, bw, bh], axis=-1)))
        cand_score.append(picked[..., 4])
        cand_meta.append(jnp.stack([anchor, gj, gi, valid.astype(jnp.int32)], -1))

    boxes = jnp.zeros((b, k, 4))
    score = jnp.zeros((b, k))
    best_n = jnp.zeros((b, k), jnp.int32)
    scale = jnp.zeros((b, k), jnp.int32)
    gi_out = jnp.zeros((b, k), jnp.int32)
    gj_out = jnp.zeros((b, k), jnp.int32)
    for s in range(len(outbox)):
        m = cand_meta[s][..., 3] == 1
        boxes = jnp.where(m[..., None], cand_boxes[s], boxes)
        score = jnp.where(m, cand_score[s], score)
        best_n = jnp.where(m, s * 3 + cand_meta[s][..., 0], best_n)
        scale = jnp.where(m, s, scale)
        gj_out = jnp.where(m, cand_meta[s][..., 1], gj_out)
        gi_out = jnp.where(m, cand_meta[s][..., 2], gi_out)
    return DecodedBoxes(boxes, score, best_n, scale, gi_out, gj_out)


def decode_best(outbox: Sequence[jnp.ndarray], cfg: DCNetConfig) -> DecodedBoxes:
    """Argmax decode — the validate/test path (train_DCNet.py:775-810)."""
    conf = flatten_conf(outbox)
    idx = jnp.argmax(conf, axis=1).astype(jnp.int32)[:, None]
    return decode_indices(outbox, idx, cfg)


def decode_topk(outbox: Sequence[jnp.ndarray], k: int, cfg: DCNetConfig) -> DecodedBoxes:
    """Top-k decode for the temporal cache writer (test_DCNet.py:602-637)."""
    conf = flatten_conf(outbox)
    _, idx = jax.lax.top_k(conf, k)
    return decode_indices(outbox, idx.astype(jnp.int32), cfg)


def inverse_letterbox(
    boxes: jnp.ndarray, ratio: jnp.ndarray, dw: jnp.ndarray, dh: jnp.ndarray,
    orig_w: jnp.ndarray, orig_h: jnp.ndarray,
) -> jnp.ndarray:
    """Map letterboxed-pixel xyxy boxes back to original image coords.

    Mirrors test_DCNet.py:440-446,538-543: subtract padding, divide by
    ratio, clamp to the original image extent.
    """
    x1 = jnp.clip((boxes[..., 0] - dw) / ratio, 0)
    y1 = jnp.clip((boxes[..., 1] - dh) / ratio, 0)
    x2 = jnp.minimum((boxes[..., 2] - dw) / ratio, orig_w)
    y2 = jnp.minimum((boxes[..., 3] - dh) / ratio, orig_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
