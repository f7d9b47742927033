"""Epoch-level training orchestration.

Rebuilds the outer loop of `/root/reference/train_DCNet.py:543-560` +
`train_epoch`/`validate_epoch` bookkeeping: per-epoch track reshuffle
(`sampler.set_epoch`), metric meters, logging every `print_freq`, per-epoch
checkpointing, and the clip (B, k, ...) -> (B*k, ...) flattening the loss
stack expects (train_DCNet.py:584-587).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.eval.metrics import AverageMeter
from dcnet_tpu.train.state import TrainState
from dcnet_tpu.train.step import eval_step, train_step_donated

log = logging.getLogger("dcnet_tpu")


_CLIP_NDIM = {"images": 5, "word_ids": 3, "word_mask": 3, "bbox": 3}


def flatten_clip_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """(B, k, ...) -> (B*k, ...) for images/word_ids/bbox. Idempotent:
    already-flat batches pass through unchanged."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim == _CLIP_NDIM.get(k, -1):
            out[k] = v.reshape(-1, *v.shape[2:])
        else:
            out[k] = v
    return out


def train_epoch(
    model, cfg: DCNetConfig, state: TrainState,
    batches: Iterable[Dict[str, np.ndarray]], rng: jax.Array, epoch: int,
    print_freq: int = 100, max_steps: Optional[int] = None,
    device_put: Callable = lambda b: b,
    should_stop: Optional[Callable[[], bool]] = None,
) -> TrainState:
    """`should_stop` is polled between steps — the preemption hook: when it
    turns true the epoch ends early so the caller can checkpoint and exit."""
    meters = {k: AverageMeter() for k in
              ("loss", "loss_yolo", "loss_rank", "loss_loc",
               "loss_interframe", "loss_crossmodal", "acc50", "acc_center",
               "miou", "batch_time")}
    end = time.time()
    for i, batch in enumerate(batches):
        if max_steps is not None and i >= max_steps:
            break
        if should_stop is not None and should_stop():
            log.info("stop requested at step %d of epoch %d", i, epoch)
            break
        batch = device_put(flatten_clip_batch(batch))
        n = batch["images"].shape[0]
        state, metrics = train_step_donated(model, cfg, state, batch, rng)
        for k, v in metrics.items():
            meters[k].update(float(v), n)
        meters["batch_time"].update(time.time() - end)
        end = time.time()
        if i % print_freq == 0:
            msg = (f"Epoch [{epoch}][{i}] "
                   + " ".join(f"{k} {m.val:.4f} ({m.avg:.4f})"
                              for k, m in meters.items()))
            print(msg)
            log.info(msg)
    return state


def validate(
    model, cfg: DCNetConfig, state: TrainState,
    batches: Iterable[Dict[str, np.ndarray]],
    device_put: Callable = lambda b: b, max_steps: Optional[int] = None,
) -> Dict[str, float]:
    meters = {k: AverageMeter() for k in ("acc50", "acc_center", "miou")}
    for i, batch in enumerate(batches):
        if max_steps is not None and i >= max_steps:
            break
        batch = device_put(flatten_clip_batch(batch))
        n = batch["images"].shape[0]
        metrics = eval_step(model, cfg, state, batch)
        for k, v in metrics.items():
            meters[k].update(float(v), n)
    result = {k: m.avg for k, m in meters.items()}
    log.info("%f,%f,%f", result["acc50"], result["miou"], result["acc_center"])
    return result
