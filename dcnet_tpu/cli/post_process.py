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
from dcnet_tpu.eval.temporal import FrameCache, fuse_per_video
from dcnet_tpu.ops.boxes import bbox_iou


def save_cache_npz(path: str, cache: FrameCache, gt_boxes: np.ndarray,
                   ratios: np.ndarray, dws: np.ndarray, dhs: np.ndarray,
                   paths=None, video_ids=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, boxes=np.asarray(cache.boxes), scores=np.asarray(cache.scores),
        feats=np.asarray(cache.feats), gt_boxes=gt_boxes, ratios=ratios,
        dws=dws, dhs=dhs,
        video_ids=np.asarray(
            video_ids if video_ids is not None
            else np.zeros(len(gt_boxes), np.int32)),
        paths=np.asarray(paths if paths is not None else [], dtype=object))


def load_cache_npz(path: str):
    data = np.load(path, allow_pickle=True)
    cache = FrameCache(jnp.asarray(data["boxes"]), jnp.asarray(data["scores"]),
                       jnp.asarray(data["feats"]))
    return cache, data


def main(argv=None):
    parser = base_parser("dcnet_tpu temporal post-processing")
    parser.add_argument("--cache_dir", default="./cache", type=str)
    parser.add_argument("--ref_cache", action="store_true",
                        help="read the reference's per-frame .pth cache "
                             "(post_processing.py:181-202 format) instead of "
                             "our .npz — runs a mixed pipeline: reference "
                             "pass 1, our fusion pass 2")
    args = parser.parse_args(argv)
    if args.savename == "default":
        args.savename = f"model_{args.dataset}_batch{args.batch_size}"
    setup_logging(args.savename, test=True)

    if args.ref_cache:
        return _ref_cache_main(args)

    cache_path = os.path.join(args.cache_dir, args.savename, "cache.npz")
    cache, data = load_cache_npz(cache_path)
    k = args.num_frame_k if args.num_frame_k != 2 else 5
    # per-video fusion: out-of-video neighbors count as missing
    # (post_processing.py:188-193); legacy caches without video ids fuse as
    # one video
    video_ids = (data["video_ids"] if "video_ids" in data.files
                 else np.zeros(int(cache.boxes.shape[0]), np.int32))
    fused = np.asarray(fuse_per_video(cache, video_ids, ref_frames=k))

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


def _ref_cache_main(args):
    """Fuse a cache written in the reference's per-frame .pth format (by the
    reference itself or by `cli.test --cache --ref_cache_format`). GT comes
    from the dataset index like the reference's post_processing.py, and both
    cache boxes and GT are in original image coordinates."""
    from dcnet_tpu.cli.common import build_dataset
    from dcnet_tpu.eval.ref_cache import read_reference_cache
    from dcnet_tpu.eval.temporal import fuse_per_video

    ds, _ = build_dataset(args, "test", testmode=True)
    k = args.num_frame_k if args.num_frame_k != 2 else 5
    center = k // 2

    paths, gts, vids = [], [], []
    for cpaths, cboxes, _, vid in ds.chunks:
        paths.append(cpaths[center])
        gts.append(np.asarray(cboxes[center], np.float64))
        vids.append(vid)

    root = os.path.join(args.cache_dir, args.savename)
    cache = read_reference_cache(root, paths)
    fused = np.asarray(fuse_per_video(cache, np.asarray(vids), ref_frames=k))

    acc, miou = AverageMeter(), AverageMeter()
    for t in range(fused.shape[0]):
        iou = float(bbox_iou(jnp.asarray(fused[t][None]),
                             jnp.asarray(gts[t][None]))[0])
        acc.update(float(iou > 0.5))
        miou.update(iou)
    print(f"{acc.avg:.6f},{miou.avg:.6f}")
    return acc.avg


if __name__ == "__main__":
    main()
