"""Training losses, fully vectorized.

Rebuilds the five-loss objective of `/root/reference/train_DCNet.py:45-220,
631-642`: YOLO grounding loss, rank (hinge) loss, location CE loss, and the
two InfoNCE correspondence losses. All reductions reproduce the reference's
averaging structure exactly (per-list means collapse to global means because
every list has identical batch size).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models.heads import l2_normalize
from dcnet_tpu.ops.correspondence import ContrastiveSamples
from dcnet_tpu.ops.decode import flatten_conf
from dcnet_tpu.ops.target import CompactTarget


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch (torch CrossEntropyLoss(size_average=True))."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def gather_pred_at_target(
    outbox: Sequence[jnp.ndarray], tgt: CompactTarget, cfg: DCNetConfig
) -> jnp.ndarray:
    """Gather the 5 predicted box attrs at each sample's matched
    (scale, anchor, cell) (train_DCNet.py:52-55). Returns (B, 5)."""
    b = outbox[0].shape[0]
    picked = jnp.zeros((b, 5))
    for s, o in enumerate(outbox):
        g = cfg.grids[s]
        flat = o.reshape(b, 3, 5, g * g)
        cell = jnp.clip(tgt.gj, 0, g - 1) * g + jnp.clip(tgt.gi, 0, g - 1)
        vals = jax.vmap(lambda fo, a, c: fo[a, :, c])(flat, tgt.anchor, cell)
        picked = jnp.where((tgt.best_scale == s)[:, None], vals, picked)
    return picked


def yolo_loss(
    outbox: Sequence[jnp.ndarray], tgt: CompactTarget, cfg: DCNetConfig,
    w_coord: float = 5.0,
) -> jnp.ndarray:
    """MSE on (sigmoid(x), sigmoid(y), w, h) at the matched anchor cell +
    CE over all anchor-conf logits vs the one-hot target slot
    (train_DCNet.py:45-72)."""
    picked = gather_pred_at_target(outbox, tgt, cfg)
    pred_xy = jax.nn.sigmoid(picked[:, 0:2])
    pred_wh = picked[:, 2:4]
    loss_xy = jnp.mean(jnp.square(pred_xy - tgt.txywh[:, 0:2]), axis=0)
    loss_wh = jnp.mean(jnp.square(pred_wh - tgt.txywh[:, 2:4]), axis=0)
    loss_coord = (loss_xy.sum() + loss_wh.sum()) * w_coord
    conf = flatten_conf(outbox)
    loss_conf = _cross_entropy(conf, tgt.conf_idx)
    return loss_coord + loss_conf


def rank_loss(
    sim_flat: jnp.ndarray, neg_sim_flat: jnp.ndarray, pos_idx: jnp.ndarray,
    margin: float = 0.1,
) -> jnp.ndarray:
    """Hinge on positive vs two negative pairings (train_DCNet.py:173-203):
    (a) unaligned language at the GT position, (b) aligned sim at the
    reversed-batch GT position. sim_flat/neg_sim_flat: (B, all_positions)."""
    pos = jnp.take_along_axis(sim_flat, pos_idx[:, None], axis=1)[:, 0]
    neg1 = jnp.take_along_axis(neg_sim_flat, pos_idx[:, None], axis=1)[:, 0]
    neg2 = jnp.take_along_axis(sim_flat, pos_idx[::-1][:, None], axis=1)[:, 0]
    b = sim_flat.shape[0]
    loss = jnp.maximum(margin + neg1 - pos, 0) + jnp.maximum(margin + neg2 - pos, 0)
    return loss.sum() / (2 * b)


def loc_loss(loc_flat: jnp.ndarray, pos_idx: jnp.ndarray) -> jnp.ndarray:
    """CE on the flattened location-score map vs the GT position
    (train_DCNet.py:205-220)."""
    return _cross_entropy(loc_flat, pos_idx)


def infonce_loss(
    samples: ContrastiveSamples, temperature: float = 0.07
) -> jnp.ndarray:
    """InfoNCE over (q, k+, negs), channel-normalized, label = positive
    (train_DCNet.py:114-166). With Kpos>1 positive keys the loss is averaged
    over keys (the cross-modal variant's inner loop)."""
    q = l2_normalize(samples.q, axis=-1)          # (B, K, C)
    k = l2_normalize(samples.k, axis=-1)          # (B, K, P, C)
    neg = l2_normalize(samples.neg, axis=-1)      # (B, K, N, C)
    l_neg = jnp.einsum("bkc,bknc->bkn", q, neg)   # (B, K, N)
    l_pos = jnp.einsum("bkc,bkpc->bkp", q, k)     # (B, K, P)
    # per positive key p: logits = [pos_p, negs] / T, label 0
    logits = jnp.concatenate(
        [l_pos[..., :, None], jnp.broadcast_to(
            l_neg[:, :, None, :], l_pos.shape + (l_neg.shape[-1],))], axis=-1
    ) / temperature                                # (B, K, P, 1+N)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[..., 0])


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    yolo: jnp.ndarray
    rank: jnp.ndarray
    loc: jnp.ndarray
    interframe: jnp.ndarray
    crossmodal: jnp.ndarray


def total_loss(
    outbox: Sequence[jnp.ndarray],
    sim_flat: jnp.ndarray,
    neg_sim_flat: jnp.ndarray,
    loc_flat: jnp.ndarray,
    interframe: ContrastiveSamples,
    crossmodal: ContrastiveSamples,
    tgt: CompactTarget,
    cfg: DCNetConfig,
) -> LossBreakdown:
    """loss = yolo + 100*rank + loc + 100*interframe + crossmodal
    (train_DCNet.py:642)."""
    l_yolo = yolo_loss(outbox, tgt, cfg, w_coord=cfg.yolo_coord_weight)
    l_rank = rank_loss(sim_flat, neg_sim_flat, tgt.pos_idx, margin=cfg.rank_margin)
    l_loc = loc_loss(loc_flat, tgt.pos_idx)
    l_inter = infonce_loss(interframe, cfg.infonce_temperature)
    l_cross = infonce_loss(crossmodal, cfg.infonce_temperature)
    total = (l_yolo + cfg.w_rank * l_rank + cfg.w_loc * l_loc
             + cfg.w_interframe * l_inter + cfg.w_crossmodal * l_cross)
    return LossBreakdown(total, l_yolo, l_rank, l_loc, l_inter, l_cross)
