"""Temporal cache + fusion tests against a numpy transcription of
post_processing.py:205-276."""

import numpy as np
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.eval.temporal import FrameCache, build_frame_cache, temporal_fuse

CFG = DCNetConfig(image_size=64)


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _oracle_fuse(boxes, scores, feats, ref_frames):
    """Literal per-frame transcription of the reference fuser, including the
    missing-neighbor fallback (center substitution + zeroed similarity)."""
    t, k, c = feats.shape
    half = ref_frames // 2
    out = np.zeros((t, 4))
    for ti in range(t):
        neigh_feats, neigh_scores, invalid = [], [], []
        for r, off in enumerate(range(-half, half + 1)):
            j = ti + off
            if j < 0 or j >= t:
                j = ti          # fallback to center frame
                invalid.append(r)
            neigh_feats.append(feats[j])
            neigh_scores.append(scores[j])
        sim = np.einsum("ic,rjc->irj", feats[ti], np.stack(neigh_feats))
        sim_max = sim.max(axis=2)           # (K, R)
        best_j = sim.argmax(axis=2)
        ref_score = np.stack(neigh_scores)  # (R, K)
        n_r = ref_score.shape[0]
        picked = np.zeros((k, n_r))
        for i in range(k):
            for r in range(n_r):
                picked[i, r] = ref_score[r, best_j[i, r]]
        w = _softmax(sim_max, axis=1)
        for r in invalid:
            w[:, r] = 0
        fused = (w * picked).sum(axis=1)
        out[ti] = boxes[ti, int(np.argmax(fused))]
    return out


def test_temporal_fuse_matches_oracle():
    rng = np.random.RandomState(0)
    T, K, C = 7, 5, 16
    boxes = rng.rand(T, K, 4).astype(np.float32) * 64
    scores = rng.rand(T, K).astype(np.float32)
    feats = rng.randn(T, K, C).astype(np.float32)
    cache = FrameCache(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(feats))
    got = np.asarray(temporal_fuse(cache, ref_frames=5))
    ref = _oracle_fuse(boxes, scores, feats, 5)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_build_frame_cache_features_match_peak_cells():
    rng = np.random.RandomState(1)
    T, k = 3, 4
    outbox = [jnp.asarray(rng.randn(T, 3, 5, g, g).astype(np.float32))
              for g in CFG.grids]
    corr = [jnp.asarray(rng.randn(T, g, g, 8).astype(np.float32))
            for g in CFG.grids]
    cache = build_frame_cache(outbox, corr, k, CFG)
    assert cache.boxes.shape == (T, k, 4)
    assert cache.feats.shape == (T, k, 8)
    from dcnet_tpu.ops.decode import decode_topk
    dec = decode_topk(outbox, k, CFG)
    for t in range(T):
        for i in range(k):
            s = int(dec.scale[t, i])
            gi, gj = int(dec.gi[t, i]), int(dec.gj[t, i])
            np.testing.assert_allclose(
                np.asarray(cache.feats[t, i]),
                np.asarray(corr[s][t, gj, gi]), rtol=1e-6)
