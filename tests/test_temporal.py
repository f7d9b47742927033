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


def test_fuse_per_video_respects_boundaries():
    """Frames of video A never borrow candidates from video B: per-video
    fusion equals fusing each video's cache separately, and differs from the
    flat concatenated fuse at the boundary."""
    from dcnet_tpu.eval.temporal import fuse_per_video

    rng = np.random.RandomState(2)
    ta, tb, K, C = 6, 5, 4, 16
    T = ta + tb
    boxes = rng.rand(T, K, 4).astype(np.float32) * 64
    scores = rng.rand(T, K).astype(np.float32)
    feats = rng.randn(T, K, C).astype(np.float32)
    vids = np.asarray([0] * ta + [1] * tb, np.int32)
    cache = FrameCache(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(feats))

    got = np.asarray(fuse_per_video(cache, vids, ref_frames=5))

    # oracle: run the per-frame reference transcription per video
    ref_a = _oracle_fuse(boxes[:ta], scores[:ta], feats[:ta], 5)
    ref_b = _oracle_fuse(boxes[ta:], scores[ta:], feats[ta:], 5)
    np.testing.assert_allclose(got[:ta], ref_a, rtol=1e-4)
    np.testing.assert_allclose(got[ta:], ref_b, rtol=1e-4)

    # the flat (boundary-ignoring) fuse must disagree somewhere near the
    # boundary for this random cache — guards against fuse_per_video
    # silently degrading to the old behavior
    flat = np.asarray(temporal_fuse(cache, ref_frames=5))
    assert not np.allclose(flat[ta - 2:ta + 2], got[ta - 2:ta + 2])


def test_fuse_per_video_interleaved_ids():
    """Row order is preserved even when video ids are not contiguous."""
    from dcnet_tpu.eval.temporal import fuse_per_video

    rng = np.random.RandomState(3)
    T, K, C = 8, 3, 8
    boxes = rng.rand(T, K, 4).astype(np.float32)
    scores = rng.rand(T, K).astype(np.float32)
    feats = rng.randn(T, K, C).astype(np.float32)
    cache = FrameCache(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(feats))
    vids = np.asarray([0, 1, 0, 1, 0, 1, 0, 1], np.int32)
    got = np.asarray(fuse_per_video(cache, vids, ref_frames=3))
    for u in (0, 1):
        idx = np.nonzero(vids == u)[0]
        ref = _oracle_fuse(boxes[idx], scores[idx], feats[idx], 3)
        np.testing.assert_allclose(got[idx], ref, rtol=1e-4)


def test_reference_cache_roundtrip(tmp_path):
    """Our FrameCache survives the reference's per-frame .pth format and
    feeds the fuser identically (mixed-pipeline interop)."""
    from dcnet_tpu.eval.ref_cache import (
        read_reference_cache, write_reference_cache)

    rng = np.random.RandomState(4)
    T, K, C = 5, 4, 8
    cache = FrameCache(
        jnp.asarray(rng.rand(T, K, 4).astype(np.float32) * 300),
        jnp.asarray(rng.rand(T, K).astype(np.float32)),
        jnp.asarray(rng.randn(T, K, C).astype(np.float32)))
    paths = [f"vid_{t % 2}/frame_{t:04d}.JPEG" for t in range(T)]
    write_reference_cache(str(tmp_path), paths, cache)
    # files land under the video dir with the reference naming scheme
    assert (tmp_path / "vid_0" / "frame_0000_0.pth").exists()

    back = read_reference_cache(str(tmp_path), paths)
    np.testing.assert_allclose(np.asarray(back.boxes), np.asarray(cache.boxes),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.scores),
                               np.asarray(cache.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.feats), np.asarray(cache.feats),
                               rtol=1e-6)
    got = np.asarray(temporal_fuse(back, ref_frames=3))
    want = np.asarray(temporal_fuse(cache, ref_frames=3))
    np.testing.assert_allclose(got, want, rtol=1e-5)


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


def test_topk_exceeding_coarse_scale_slots_spans_scales():
    """k larger than the two coarser scales' combined anchor slots must
    spill into the finest scale, stay sorted, and keep every (scale, cell)
    reference valid — the cross-scale top-k edge the reference's per-scale
    loop never hits (test_DCNet.py:602 gathers from a flat concat too)."""
    from dcnet_tpu.ops.decode import decode_topk
    rng = np.random.RandomState(3)
    T = 2
    coarse_slots = 3 * sum(g * g for g in CFG.grids[:-1])
    k = coarse_slots + 20
    outbox = [jnp.asarray(rng.randn(T, 3, 5, g, g).astype(np.float32))
              for g in CFG.grids]
    corr = [jnp.asarray(rng.randn(T, g, g, 8).astype(np.float32))
            for g in CFG.grids]
    dec = decode_topk(outbox, k, CFG)
    assert dec.boxes.shape == (T, k, 4)
    # scores strictly non-increasing (flat top-k across all scales)
    sc = np.asarray(dec.score)
    assert (np.diff(sc, axis=1) <= 1e-6).all()
    # at least one pick from the finest scale on every frame
    assert (np.asarray(dec.scale) == len(CFG.grids) - 1).any(axis=1).all()
    # cells stay in range per assigned scale
    for t in range(T):
        for i in range(k):
            g = CFG.grids[int(dec.scale[t, i])]
            assert 0 <= int(dec.gi[t, i]) < g
            assert 0 <= int(dec.gj[t, i]) < g
    cache = build_frame_cache(outbox, corr, k, CFG)
    assert np.isfinite(np.asarray(cache.feats)).all()
    assert cache.boxes.shape == (T, k, 4)
