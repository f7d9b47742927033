"""Temporal cache + cross-frame score fusion.

Rebuilds the two-pass post-processing subsystem (SURVEY.md §3.4):
- cache writer (`/root/reference/test_DCNet.py:546-701`): per center frame,
  top-k conf peaks -> boxes/scores + the 512-d fused feature at each peak;
- temporal fuser (`post_processing.py:181-352`): for each frame, similarity
  of its top-k features against the top-k features of +-floor(k/2) neighbor
  frames, max-pooled over neighbor candidates, softmaxed over frames,
  invalid frames zeroed, fused score = sum(softmax(sim) * neighbor_score),
  argmax box.

TPU-first: instead of one `.pth` file per frame, the cache is a struct of
arrays over the whole video (features stay in HBM) and the fusion pass is a
single jitted computation over all frames at once.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.ops.decode import DecodedBoxes, decode_topk


class FrameCache(NamedTuple):
    """Per-frame top-k grounding cache for one video (T frames)."""

    boxes: jnp.ndarray    # (T, K, 4) xyxy, letterboxed coords
    scores: jnp.ndarray   # (T, K)
    feats: jnp.ndarray    # (T, K, C) fused feature at each peak cell


def build_frame_cache(
    outbox: Sequence[jnp.ndarray], corr_feat: Sequence[jnp.ndarray],
    k: int, cfg: DCNetConfig,
) -> FrameCache:
    """From a batch of per-frame model outputs (treating batch as T frames):
    top-k decode + feature gather (test_DCNet.py:602-654)."""
    dec: DecodedBoxes = decode_topk(outbox, k, cfg)
    t = dec.boxes.shape[0]
    feats = jnp.zeros((t, k, corr_feat[0].shape[-1]))
    for s, f in enumerate(corr_feat):
        g = f.shape[1]
        flat = f.reshape(t, g * g, -1)
        cell = jnp.clip(dec.gj, 0, g - 1) * g + jnp.clip(dec.gi, 0, g - 1)
        vals = jnp.take_along_axis(flat, cell[..., None], axis=1)  # (T, K, C)
        feats = jnp.where((dec.scale == s)[..., None], vals, feats)
    return FrameCache(boxes=dec.boxes, scores=dec.score, feats=feats)


def temporal_fuse(cache: FrameCache, ref_frames: int,
                  t_valid=None) -> jnp.ndarray:
    """Fuse each frame's top-k scores with its temporal neighborhood and pick
    the winning box (post_processing.py:205-276). Returns (T, 4) boxes.

    Frames whose neighbors fall off the ends mirror the reference's
    missing-cache fallback: the center frame substitutes and its similarity
    is zeroed (post_processing.py:188-193, 267-268). `t_valid` marks the real
    frame count when the cache is padded (the vmapped per-video path); rows
    at or past `t_valid` produce unspecified boxes the caller discards.
    """
    t, k, c = cache.feats.shape
    t_real = t if t_valid is None else t_valid
    half = ref_frames // 2
    offsets = jnp.arange(-half, half + 1)                 # (R,)
    frame_idx = jnp.arange(t)[:, None] + offsets[None, :]  # (T, R)
    valid = (frame_idx >= 0) & (frame_idx < t_real)
    frame_idx = jnp.clip(frame_idx, 0, t - 1)

    neigh_feats = cache.feats[frame_idx]     # (T, R, K, C)
    neigh_scores = cache.scores[frame_idx]   # (T, R, K)

    # sim[t, i, r, j] = <feat_t_i, feat_{t+r}_j>
    sim = jnp.einsum("tic,trjc->tirj", cache.feats, neigh_feats)
    sim_max = jnp.max(sim, axis=3)                       # (T, K, R)
    best_j = jnp.argmax(sim, axis=3)                     # (T, K, R)
    # score of the best-matching neighbor candidate:
    # ref_score[t, i, r] = neigh_scores[t, r, best_j[t, i, r]]
    r_count = offsets.shape[0]
    ref_score = jnp.take_along_axis(
        jnp.broadcast_to(neigh_scores[:, None], (t, k, r_count, k)),
        best_j[..., None], axis=3)[..., 0]               # (T, K, R)

    w = jax.nn.softmax(sim_max, axis=2)                  # over frames
    w = w * valid[:, None, :]
    fused = jnp.sum(w * ref_score, axis=2)               # (T, K)
    best = jnp.argmax(fused, axis=1)                     # (T,)
    return jnp.take_along_axis(cache.boxes, best[:, None, None], axis=1)[:, 0]


def fuse_per_video(cache: FrameCache, video_ids, ref_frames: int) -> jnp.ndarray:
    """Temporal fusion over a multi-video cache, respecting video boundaries.

    The reference keys cache files by video directory so fusion never mixes
    videos (test_DCNet.py:641-648, post_processing.py:181-202: a neighbor
    outside the video is 'missing' and its similarity zeroed). `video_ids`
    gives each cache row's video; rows of each video are padded to the
    longest video and fused in one vmapped pass. Returns (T, 4) fused boxes
    in the original row order.
    """
    import numpy as np

    video_ids = np.asarray(jax.device_get(video_ids))
    uids = list(dict.fromkeys(video_ids.tolist()))
    groups = [np.nonzero(video_ids == u)[0] for u in uids]
    tmax = max(len(g) for g in groups)

    def pad(arr, idxs):
        arr = np.asarray(arr)[idxs]
        width = [(0, tmax - len(idxs))] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, width)

    boxes = jnp.asarray(np.stack([pad(cache.boxes, g) for g in groups]))
    scores = jnp.asarray(np.stack([pad(cache.scores, g) for g in groups]))
    feats = jnp.asarray(np.stack([pad(cache.feats, g) for g in groups]))
    lengths = jnp.asarray([len(g) for g in groups], jnp.int32)

    fused = jax.vmap(
        lambda b, s, f, n: temporal_fuse(FrameCache(b, s, f), ref_frames,
                                         t_valid=n)
    )(boxes, scores, feats, lengths)

    out = np.zeros((len(video_ids), 4), np.float32)
    fused_np = np.asarray(fused)
    for vi, g in enumerate(groups):
        out[g] = fused_np[vi, :len(g)]
    return jnp.asarray(out)
