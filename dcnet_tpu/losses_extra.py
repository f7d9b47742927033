"""Auxiliary losses kept for drop-in parity with the reference.

These exist in the reference but are dead on its main path; they are
provided (vectorized) so users migrating custom forks find them:
- offset_loss / confidence_loss (`/root/reference/train_DCNet.py:74-108`):
  pairwise frame-offset MSE and pair conf-consistency MSE, defined but
  never called (commented at :631).
- IoULoss (`utils/losses.py:11-34`): soft-IoU objective.
- WeightedCELoss (`utils/weighted_ce_loss.py`): focal-style weighted CE.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.losses import gather_pred_at_target
from dcnet_tpu.ops.decode import flatten_conf
from dcnet_tpu.ops.target import CompactTarget


def offset_loss(outbox: Sequence[jnp.ndarray], tgt: CompactTarget,
                cfg: DCNetConfig, w_coord: float = 5.0) -> jnp.ndarray:
    """MSE between within-clip frame-pair coordinate offsets of prediction
    and ground truth (train_DCNet.py:74-94). Batch is interleaved pairs."""
    picked = gather_pred_at_target(outbox, tgt, cfg)  # (2B, 5)
    pred = jnp.concatenate(
        [jax.nn.sigmoid(picked[:, 0:2]), picked[:, 2:4]], axis=1)
    gt = tgt.txywh
    pred = pred.reshape(-1, 2, 4)
    gt = gt.reshape(-1, 2, 4)
    d_pred = pred[:, 0] - pred[:, 1]
    d_gt = gt[:, 0] - gt[:, 1]
    return jnp.mean(jnp.square(d_pred - d_gt), axis=0).sum() * w_coord


def confidence_loss(outbox: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """MSE between the conf maps of the two frames of each clip
    (train_DCNet.py:96-108)."""
    conf = flatten_conf(outbox)                 # (2B, n_slots)
    conf = conf.reshape(-1, 2, conf.shape[-1])
    return jnp.mean(jnp.square(conf[:, 0] - conf[:, 1]))


def iou_loss(pred_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Soft-IoU loss: 1 - mean IoU (utils/losses.py:11-34)."""
    from dcnet_tpu.ops.boxes import bbox_iou

    return 1.0 - jnp.mean(bbox_iou(pred_xyxy, gt_xyxy))


def weighted_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                     gamma: float = 2.0) -> jnp.ndarray:
    """Focal-style weighted CE (utils/weighted_ce_loss.py): CE scaled by
    (1 - p_correct)^gamma."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    p = jnp.exp(picked)
    return -jnp.mean(((1.0 - p) ** gamma) * picked)
