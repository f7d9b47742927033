"""Standalone temporal post-processing entry point (pass 2 of 2).

Rebuilds `post_processing.py` (`/root/reference/post_processing.py:65-352`)
for the reference's two-step workflow (README.md:44-55): step 1 writes a
cache with `dcnet_tpu.cli.test --cache --cache_dir ...`, step 2 fuses it
here. The cache is one `.npz` per run (struct-of-arrays over all frames)
instead of one torch pickle per frame.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from dcnet_tpu.cli.common import base_parser, setup_logging
from dcnet_tpu.eval.metrics import AverageMeter
from dcnet_tpu.eval.temporal import FrameCache, temporal_fuse
from dcnet_tpu.ops.boxes import bbox_iou


def save_cache_npz(path: str, cache: FrameCache, gt_boxes: np.ndarray,
                   ratios: np.ndarray, dws: np.ndarray, dhs: np.ndarray,
                   paths=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, boxes=np.asarray(cache.boxes), scores=np.asarray(cache.scores),
        feats=np.asarray(cache.feats), gt_boxes=gt_boxes, ratios=ratios,
        dws=dws, dhs=dhs,
        paths=np.asarray(paths if paths is not None else [], dtype=object))


def load_cache_npz(path: str):
    data = np.load(path, allow_pickle=True)
    cache = FrameCache(jnp.asarray(data["boxes"]), jnp.asarray(data["scores"]),
                       jnp.asarray(data["feats"]))
    return cache, data


def main(argv=None):
    parser = base_parser("dcnet_tpu temporal post-processing")
    parser.add_argument("--cache_dir", default="./cache", type=str)
    args = parser.parse_args(argv)
    if args.savename == "default":
        args.savename = f"model_{args.dataset}_batch{args.batch_size}"
    setup_logging(args.savename, test=True)

    cache_path = os.path.join(args.cache_dir, args.savename, "cache.npz")
    cache, data = load_cache_npz(cache_path)
    k = args.num_frame_k if args.num_frame_k != 2 else 5
    fused = np.asarray(temporal_fuse(cache, ref_frames=k))

    acc, miou = AverageMeter(), AverageMeter()
    size = args.size
    for t in range(fused.shape[0]):
        ratio, dw, dh = (float(data["ratios"][t]), float(data["dws"][t]),
                         float(data["dhs"][t]))
        gt = data["gt_boxes"][t].astype(np.float64)
        pred = fused[t].astype(np.float64)
        for b in (gt, pred):
            b[[0, 2]] = (b[[0, 2]] - dw) / ratio
            b[[1, 3]] = (b[[1, 3]] - dh) / ratio
        iou = float(bbox_iou(jnp.asarray(pred[None]), jnp.asarray(gt[None]))[0])
        acc.update(float(iou > 0.5))
        miou.update(iou)
    print(f"{acc.avg:.6f},{miou.avg:.6f}")
    return acc.avg


if __name__ == "__main__":
    main()
