"""Reference per-frame `.pth` cache interop.

The reference's two-pass temporal pipeline persists one torch pickle per
frame at `./cache/<savename>/<vid_name>/<frame_stem>_<batch_idx>.pth` with
keys `pred_bbox_topk` (topk, 1, 4) original-image-scale xyxy boxes,
`pred_score_topk` (list of topk floats), and `visu_feat` (topk, 1, C)
(`/root/reference/test_DCNet.py:641-655`, read back by
`post_processing.py:181-202`). These converters bridge that format to our
struct-of-arrays `FrameCache`, so mixed pipelines work both ways:
reference pass 1 -> our fusion, or our pass 1 -> the reference's
post_processing.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from dcnet_tpu.eval.temporal import FrameCache


def _frame_file(root: str, img_path: str, batch_idx: int) -> str:
    """Reproduce the reference's cache path scheme (test_DCNet.py:641-648):
    `<root>/<vid_dir>/<img_name split on '.JPEG'>_<batch_idx>.pth`."""
    parts = img_path.replace("\\", "/").split("/")
    vid_name, img_name = parts[-2], parts[-1]
    stem = img_name.split(".JPEG")[0]
    return os.path.join(root, vid_name, f"{stem}_{batch_idx}.pth")


def write_reference_cache(
    root: str, frame_paths: Sequence[str], cache: FrameCache,
    batch_indices: Optional[Sequence[int]] = None,
) -> None:
    """Write one reference-format `.pth` per cache row. `frame_paths[t]` is
    the center-frame image path of row t (the reference keys files by it);
    boxes must already be in original image coordinates like the
    reference's (it inverse-letterboxes before saving, test_DCNet.py:657+).
    """
    import torch

    boxes = np.asarray(cache.boxes, np.float32)
    scores = np.asarray(cache.scores, np.float32)
    feats = np.asarray(cache.feats, np.float32)
    for t, p in enumerate(frame_paths):
        bi = t if batch_indices is None else int(batch_indices[t])
        path = _frame_file(root, p, bi)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        torch.save({
            "pred_bbox_topk": torch.from_numpy(boxes[t][:, None, :].copy()),
            "pred_score_topk": [float(s) for s in scores[t]],
            "visu_feat": torch.from_numpy(feats[t][:, None, :].copy()),
        }, path)


def read_reference_cache(
    root: str, frame_paths: Sequence[str],
    batch_indices: Optional[Sequence[int]] = None,
) -> FrameCache:
    """Load reference-format per-frame `.pth` files into one FrameCache
    (rows ordered as `frame_paths`). Accepts caches written by the actual
    reference code or by `write_reference_cache`."""
    import torch

    boxes, scores, feats = [], [], []
    for t, p in enumerate(frame_paths):
        bi = t if batch_indices is None else int(batch_indices[t])
        data = torch.load(_frame_file(root, p, bi), map_location="cpu",
                          weights_only=False)
        b = np.asarray(data["pred_bbox_topk"], np.float32)
        f = np.asarray(
            torch.stack(list(data["visu_feat"]))
            if isinstance(data["visu_feat"], (list, tuple))
            else data["visu_feat"], np.float32)
        boxes.append(b.reshape(b.shape[0], 4))
        scores.append(np.asarray([float(s) for s in data["pred_score_topk"]],
                                 np.float32))
        feats.append(f.reshape(f.shape[0], -1))
    return FrameCache(boxes=jnp.asarray(np.stack(boxes)),
                      scores=jnp.asarray(np.stack(scores)),
                      feats=jnp.asarray(np.stack(feats)))
