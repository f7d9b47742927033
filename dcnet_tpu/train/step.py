"""Jitted train / eval steps.

Rebuilds the inner loop of `train_epoch` / `validate_epoch`
(`/root/reference/train_DCNet.py:563-846`) as pure functions: one traced
step = forward + 5-loss sum + RMSprop update + train metrics. Under a
`jax.sharding.Mesh` with the batch sharded on the 'data' axis, XLA inserts
the gradient all-reduce that DDP/NCCL performed in the reference
(train_DCNet.py:483,645).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.losses import total_loss
from dcnet_tpu.ops.boxes import bbox_iou, xywh2xyxy
from dcnet_tpu.ops.decode import decode_best, flatten_scores
from dcnet_tpu.ops.target import CompactTarget, build_target
from dcnet_tpu.train.state import TrainState


def neg_sim_scores(corr_feat, flang_attn) -> jnp.ndarray:
    """Reversed-batch phrase attention dotted with the fused visual features
    (train_DCNet.py:623-627). Returns the flattened (B, all_positions) map."""
    return flatten_scores([
        jnp.einsum("bc,bhwc->bhw", flang_attn[::-1], f) for f in corr_feat])


def pred_box_at_target(outbox, tgt: CompactTarget, cfg: DCNetConfig) -> jnp.ndarray:
    """Decode the predicted box at the ground-truth anchor/cell — the
    train-time accuracy probe (train_DCNet.py:656-672). Returns (B, 4) xyxy."""
    from dcnet_tpu.losses import gather_pred_at_target

    picked = gather_pred_at_target(outbox, tgt, cfg)
    grids = jnp.asarray(cfg.grids, jnp.float32)
    strides = jnp.asarray(cfg.strides, jnp.float32)
    anchors = jnp.asarray(cfg.anchors_full, jnp.float32) / cfg.anchor_imsize
    grid = grids[tgt.best_scale]
    stride = strides[tgt.best_scale]
    aw = anchors[tgt.best_n, 0] * grid
    ah = anchors[tgt.best_n, 1] * grid
    cx = (jax.nn.sigmoid(picked[:, 0]) + tgt.gi) * stride
    cy = (jax.nn.sigmoid(picked[:, 1]) + tgt.gj) * stride
    bw = jnp.exp(picked[:, 2]) * aw * stride
    bh = jnp.exp(picked[:, 3]) * ah * stride
    return xywh2xyxy(jnp.stack([cx, cy, bw, bh], axis=-1))


def _train_step_impl(
    model, cfg: DCNetConfig, state: TrainState, batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """batch: images (2B, H, W, 3), word_ids (2B, L), bbox (2B, 4)."""
    rng_s, rng_d = jax.random.split(jax.random.fold_in(rng, state.step))
    bbox = jnp.clip(batch["bbox"], 0, cfg.image_size - 1)

    def loss_fn(params):
        out, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], batch["word_ids"], train=True,
            rngs={"sampling": rng_s, "dropout": rng_d},
            mutable=["batch_stats"])
        tgt = build_target(bbox, cfg)
        lb = total_loss(
            out.outbox,
            flatten_scores(out.sim_score),
            neg_sim_scores(out.corr_feat, out.flang_attn),
            flatten_scores(out.loc_score),
            out.interframe, out.crossmodal, tgt, cfg)
        return lb.total, (lb, out, tgt, mutated["batch_stats"])

    (loss, (lb, out, tgt, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads, new_stats)

    # train metrics (no grad)
    pred = pred_box_at_target(out.outbox, tgt, cfg)
    iou = bbox_iou(pred, bbox)
    from dcnet_tpu.ops.decode import flatten_conf
    conf = flatten_conf(out.outbox)
    center_ok = jnp.argmax(conf, axis=1) == tgt.conf_idx
    metrics = {
        "loss": loss, "loss_yolo": lb.yolo, "loss_rank": lb.rank,
        "loss_loc": lb.loc, "loss_interframe": lb.interframe,
        "loss_crossmodal": lb.crossmodal,
        "acc50": jnp.mean((iou > 0.5).astype(jnp.float32)),
        "acc_center": jnp.mean(center_ok.astype(jnp.float32)),
        "miou": jnp.mean(iou),
    }
    return new_state, metrics


# plain variant: inputs stay valid (tests, side-by-side comparisons)
train_step = functools.partial(
    jax.jit, static_argnames=("cfg", "model"))(_train_step_impl)
# production variant: donates the state pytree so params/opt buffers are
# updated in place (halves peak HBM for the optimizer state)
train_step_donated = functools.partial(
    jax.jit, static_argnames=("cfg", "model"),
    donate_argnames=("state",))(_train_step_impl)


@functools.partial(jax.jit, static_argnames=("cfg", "model"))
def eval_step(
    model, cfg: DCNetConfig, state: TrainState, batch: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """validate_epoch body (train_DCNet.py:728-846): eval-mode forward on
    2-frame pairs, full decode, acc@0.5/center/mIoU."""
    bbox = jnp.clip(batch["bbox"], 0, cfg.image_size - 1)
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"], batch["word_ids"], train=False)
    tgt = build_target(bbox, cfg)
    dec = decode_best(out.outbox, cfg)
    iou = bbox_iou(dec.boxes[:, 0], bbox)
    center_ok = ((dec.gi[:, 0] == tgt.gi) & (dec.gj[:, 0] == tgt.gj)
                 & (dec.scale[:, 0] == tgt.best_scale))
    return {
        "acc50": jnp.mean((iou > 0.5).astype(jnp.float32)),
        "acc_center": jnp.mean(center_ok.astype(jnp.float32)),
        "miou": jnp.mean(iou),
    }
