"""Streaming engine tests: ring-buffer correctness vs the offline clip path,
multi-stream batching, and mesh sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import mini_backbone_defs
from dcnet_tpu.models.dcnet import DCNet as DCNetCls
from dcnet_tpu.serving.engine import GroundingEngine

CFG = DCNetConfig(image_size=64, corpus_size=50,
                  interframe_top_k=4, interframe_neg_n=3, crossmodal_neg_n=3)


@pytest.fixture(scope="module")
def setup():
    model = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 50, (4, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, images, ids, train=False)
    return model, variables


def test_streaming_matches_offline_clip(setup):
    """After n_frame steps the streaming raw prediction must equal the
    offline eval_clip on the same 5 frames."""
    model, variables = setup
    rng = np.random.RandomState(1)
    n_frame = 5
    frames = rng.rand(n_frame, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (1, 20)).astype(np.int32)

    engine = GroundingEngine(model, variables, CFG, n_streams=1,
                             n_frame=n_frame, topk=3, fuse_window=3)
    state = engine.init_state(word_ids)
    for t in range(n_frame):
        state, fused, raw, score = engine.step(state, frames[t][None])

    offline = model.apply(variables, jnp.asarray(frames),
                          jnp.asarray(word_ids), n_frame=n_frame,
                          method=DCNetCls.eval_clip)
    from dcnet_tpu.ops.decode import decode_best
    dec = decode_best(offline.outbox, CFG)
    np.testing.assert_allclose(np.asarray(raw[0]), np.asarray(dec.boxes[0, 0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(score[0]), float(dec.score[0, 0]),
                               rtol=1e-4, atol=1e-5)


def test_multi_stream_independence(setup):
    """Stream 0's outputs must not depend on stream 1's content."""
    model, variables = setup
    rng = np.random.RandomState(2)
    frames_a = rng.rand(5, 2, 64, 64, 3).astype(np.float32)
    frames_b = frames_a.copy()
    frames_b[:, 1] = rng.rand(5, 64, 64, 3)  # different stream-1 content
    ids = rng.randint(1, 50, (2, 20)).astype(np.int32)

    engine = GroundingEngine(model, variables, CFG, n_streams=2,
                             n_frame=5, topk=3, fuse_window=3)
    sa = engine.init_state(ids)
    sb = engine.init_state(ids)
    for t in range(5):
        sa, fa, ra, _ = engine.step(sa, frames_a[t])
        sb, fb, rb, _ = engine.step(sb, frames_b[t])
    np.testing.assert_allclose(np.asarray(ra[0]), np.asarray(rb[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fa[0]), np.asarray(fb[0]),
                               rtol=1e-4, atol=1e-4)


def test_stream_count_alignment_hint(setup, caplog):
    """Non-8-aligned deployment-scale stream counts log the measured perf
    hint (BENCH_NOTES round-5: 140 streams ran 12% below 120); tiny debug
    counts (<=8) and aligned counts stay quiet."""
    model, variables = setup
    import logging

    with caplog.at_level(logging.WARNING, "dcnet_tpu.serving.engine"):
        GroundingEngine(model, variables, CFG, n_streams=28,
                        n_frame=5, topk=3, fuse_window=3)
    assert any("multiple of 8" in r.getMessage() for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, "dcnet_tpu.serving.engine"):
        GroundingEngine(model, variables, CFG, n_streams=2,
                        n_frame=5, topk=3, fuse_window=3)
        GroundingEngine(model, variables, CFG, n_streams=16,
                        n_frame=5, topk=3, fuse_window=3)
    assert not caplog.records


def test_streaming_on_mesh(setup, devices):
    """Stream axis sharded over the 8-device mesh executes and matches."""
    from dcnet_tpu.parallel import make_mesh
    model, variables = setup
    rng = np.random.RandomState(3)
    frames = rng.rand(8, 64, 64, 3).astype(np.float32)
    ids = rng.randint(1, 50, (8, 20)).astype(np.int32)

    plain = GroundingEngine(model, variables, CFG, n_streams=8,
                            n_frame=5, topk=3, fuse_window=3)
    s0 = plain.init_state(ids)
    s0, f0, r0, _ = plain.step(s0, frames)

    mesh = make_mesh()
    with mesh:
        sharded = GroundingEngine(model, variables, CFG, n_streams=8,
                                  n_frame=5, topk=3, fuse_window=3, mesh=mesh)
        s1 = sharded.init_state(ids)
        s1, f1, r1, _ = sharded.step(s1, frames)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-3, atol=1e-3)


def test_query_hot_swap(setup):
    """update_queries changes only the masked stream's predictions and
    resets its fusion cache."""
    model, variables = setup
    rng = np.random.RandomState(5)
    frames = rng.rand(5, 2, 64, 64, 3).astype(np.float32)
    ids_a = rng.randint(1, 50, (2, 20)).astype(np.int32)
    ids_b = rng.randint(1, 50, (2, 20)).astype(np.int32)

    # donate_state=False: the test deliberately steps BOTH the pre-swap and
    # post-swap states from the same snapshot (they share ring buffers)
    engine = GroundingEngine(model, variables, CFG, n_streams=2,
                             n_frame=5, topk=3, fuse_window=3,
                             donate_state=False)
    state = engine.init_state(ids_a)
    for t in range(5):
        state, _, raw_before, _ = engine.step(state, frames[t])

    # swap only stream 0's phrase
    state2 = engine.update_queries(state, ids_b,
                                   mask=np.array([True, False]))
    assert int(state2.frames_seen[0]) == 0
    assert int(state2.frames_seen[1]) == int(state.frames_seen[1])
    np.testing.assert_array_equal(np.asarray(state2.word_ids[0]), ids_b[0])
    np.testing.assert_array_equal(np.asarray(state2.word_ids[1]), ids_a[1])

    # cached language features swapped for stream 0 only
    d0 = np.abs(np.asarray(state2.language[0][0])
                - np.asarray(state.language[0][0])).max()
    d1 = np.abs(np.asarray(state2.language[0][1])
                - np.asarray(state.language[0][1])).max()
    assert d0 > 1e-4 and d1 < 1e-6

    # same frame: stream 0's prediction shifts (untrained weights -> small
    # but nonzero), stream 1 matches the unswapped continuation
    s_ref, _, raw_ref, _ = engine.step(state, frames[0])
    s_new, _, raw_new, _ = engine.step(state2, frames[0])
    assert np.abs(np.asarray(raw_new[0]) - np.asarray(raw_ref[0])).max() > 0
    np.testing.assert_allclose(np.asarray(raw_new[1]), np.asarray(raw_ref[1]),
                               rtol=1e-4, atol=1e-4)


def test_quantized_engine_close_to_float(setup):
    """engine.quantize() (int8 backbone) tracks the float engine's raw
    predictions: boxes near-identical after a full window."""
    model, variables = setup
    rng = np.random.RandomState(5)
    n_frame = 5
    frames = rng.rand(n_frame, 2, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (2, 20)).astype(np.int32)

    def run(engine):
        state = engine.init_state(word_ids)
        for t in range(n_frame):
            state, fused, raw, score = engine.step(state, frames[t])
        return np.asarray(raw), np.asarray(score)

    fp = GroundingEngine(model, variables, CFG, n_streams=2,
                         n_frame=n_frame, topk=3, fuse_window=3)
    q8 = GroundingEngine(model, variables, CFG, n_streams=2,
                         n_frame=n_frame, topk=3, fuse_window=3)
    q8.quantize(frames.reshape(-1, 64, 64, 3),
                calib_word_ids=word_ids, trunk=True)
    raw_fp, score_fp = run(fp)
    raw_q8, score_q8 = run(q8)
    from dcnet_tpu.ops.boxes import bbox_iou
    iou = np.asarray(bbox_iou(jnp.asarray(raw_q8), jnp.asarray(raw_fp)))
    assert (iou > 0.9).all(), iou
    np.testing.assert_allclose(score_q8, score_fp, rtol=0.2, atol=0.05)


def test_int8_chain_engine_matches_unchained(setup):
    """int8_chain=True (sole-consumer backbone activations stay int8 in
    HBM, requantize fused into the producer epilogue) tracks the unchained
    int8 engine: the chain only moves WHERE requantization happens, so raw
    boxes stay near-identical after a full window."""
    model, variables = setup
    rng = np.random.RandomState(11)
    n_frame = 5
    frames = rng.rand(n_frame, 2, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (2, 20)).astype(np.int32)

    def run(engine):
        engine.quantize(frames.reshape(-1, 64, 64, 3),
                        calib_word_ids=word_ids, trunk=True)
        state = engine.init_state(word_ids)
        for t in range(n_frame):
            state, fused, raw, score = engine.step(state, frames[t])
        return np.asarray(raw), np.asarray(score)

    raw_u, score_u = run(GroundingEngine(model, variables, CFG, n_streams=2,
                                         n_frame=n_frame, topk=3,
                                         fuse_window=3))
    raw_c, score_c = run(GroundingEngine(model, variables, CFG, n_streams=2,
                                         n_frame=n_frame, topk=3,
                                         fuse_window=3, int8_chain=True))
    from dcnet_tpu.ops.boxes import bbox_iou
    iou = np.asarray(bbox_iou(jnp.asarray(raw_c), jnp.asarray(raw_u)))
    assert (iou > 0.9).all(), iou
    np.testing.assert_allclose(score_c, score_u, rtol=0.2, atol=0.05)


def test_query_hot_swap_on_quantized_engine(setup):
    """update_queries composes with the int8 step: after a swap the
    quantized engine's unswapped stream continues exactly as without the
    swap, and the swapped stream's fusion history resets."""
    model, variables = setup
    rng = np.random.RandomState(13)
    frames = rng.rand(5, 2, 64, 64, 3).astype(np.float32)
    ids_a = rng.randint(1, 50, (2, 20)).astype(np.int32)
    ids_b = rng.randint(1, 50, (2, 20)).astype(np.int32)

    engine = GroundingEngine(model, variables, CFG, n_streams=2,
                             n_frame=5, topk=3, fuse_window=3,
                             donate_state=False)  # steps a stale snapshot
    engine.quantize(frames.reshape(-1, 64, 64, 3),
                    calib_word_ids=ids_a, trunk=True)
    state = engine.init_state(ids_a)
    for t in range(5):
        state, *_ = engine.step(state, frames[t])

    state2 = engine.update_queries(state, ids_b,
                                   mask=np.array([True, False]))
    assert int(state2.frames_seen[0]) == 0
    assert float(np.abs(np.asarray(state2.cache_scores[0])).max()) == 0.0

    s_ref, _, raw_ref, _ = engine.step(state, frames[0])
    s_new, _, raw_new, _ = engine.step(state2, frames[0])
    np.testing.assert_allclose(np.asarray(raw_new[1]),
                               np.asarray(raw_ref[1]),
                               rtol=1e-4, atol=1e-4)
    # the quantized path keeps running: finite outputs, ring advanced
    assert np.isfinite(np.asarray(raw_new)).all()
    assert int(s_new.frames_seen[0]) == 1


def test_exported_runtime_matches_engine(setup, tmp_path):
    """jax.export bundle: the deserialized step/encoder programs reproduce
    the live engine bit-for-bit, including the int8 backbone constants."""
    from dcnet_tpu.serving.export import ServingRuntime, export_engine

    model, variables = setup
    rng = np.random.RandomState(7)
    n_frame = 5
    frames = rng.rand(n_frame, 2, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (2, 20)).astype(np.int32)

    engine = GroundingEngine(model, variables, CFG, n_streams=2,
                             n_frame=n_frame, topk=3, fuse_window=3)
    engine.quantize(frames.reshape(-1, 64, 64, 3))
    bundle = str(tmp_path / "bundle")
    export_engine(engine, bundle)

    rt = ServingRuntime(bundle, variables)
    assert rt.meta["quantized"] is True

    s_e = engine.init_state(word_ids)
    s_r = rt.init_state(word_ids)
    for a, b in zip(s_e.language, s_r.language):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for t in range(n_frame):
        s_e, fused_e, raw_e, score_e = engine.step(s_e, frames[t])
        s_r, fused_r, raw_r, score_r = rt.step(s_r, frames[t])
    np.testing.assert_allclose(np.asarray(raw_r), np.asarray(raw_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused_r), np.asarray(fused_e),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(score_r), np.asarray(score_e),
                               rtol=1e-4, atol=1e-4)


def test_bf16_engine_state_and_roundtrip(setup, tmp_path):
    """A bf16-compute engine stores its rings/cache feats in bf16 (the
    serving deployment config — halves ring HBM traffic), tracks the fp32
    engine's predictions, and its state survives the .npz round-trip
    (npy can't serialize bf16; save/load casts through fp32)."""
    from dcnet_tpu.serving.engine import load_stream_state, save_stream_state

    _, variables = setup
    model16 = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs(),
                    dtype=jnp.bfloat16)
    rng = np.random.RandomState(11)
    frames = rng.rand(5, 1, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (1, 20)).astype(np.int32)

    eng = GroundingEngine(model16, variables, CFG, n_streams=1,
                          n_frame=5, topk=3, fuse_window=3)
    state = eng.init_state(word_ids)
    assert all(r.dtype == jnp.bfloat16 for r in state.feat_rings)
    assert state.cache_feats.dtype == jnp.bfloat16
    for t in range(5):
        state, fused, raw, score = eng.step(state, frames[t])
    assert all(r.dtype == jnp.bfloat16 for r in state.feat_rings)

    path = str(tmp_path / "streams16.npz")
    save_stream_state(path, state)
    resumed = load_stream_state(path)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(resumed)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (No cross-dtype box comparison here: on untrained weights the conf
    # argmax flips at any rounding — the bf16-vs-fp accuracy claim is
    # locked on the trained checkpoint in tests/test_cli.py instead.)
    assert np.isfinite(np.asarray(fused)).all()
    assert np.isfinite(np.asarray(raw)).all()


def test_query_hot_swap_preserves_bf16_state(setup):
    """update_queries on a bf16-dtype engine must NOT promote the cache
    rings to fp32 (a promoted state would recompile the jitted step and be
    rejected by an exported bundle's fixed input specs)."""
    _, variables = setup
    model16 = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs(),
                    dtype=jnp.bfloat16)
    rng = np.random.RandomState(17)
    frames = rng.rand(2, 2, 64, 64, 3).astype(np.float32)
    ids_a = rng.randint(1, 50, (2, 20)).astype(np.int32)
    ids_b = rng.randint(1, 50, (2, 20)).astype(np.int32)

    eng = GroundingEngine(model16, variables, CFG, n_streams=2,
                          n_frame=5, topk=3, fuse_window=3)
    state = eng.init_state(ids_a)
    state, *_ = eng.step(state, frames[0])
    swapped = eng.update_queries(state, ids_b, mask=np.array([True, False]))
    assert swapped.cache_feats.dtype == jnp.bfloat16
    assert all(r.dtype == jnp.bfloat16 for r in swapped.feat_rings)
    for a, b in zip(state.language, swapped.language):
        assert a.dtype == b.dtype
    # the swapped state still feeds the SAME compiled step (no recompile,
    # no dtype mismatch)
    s2, fused, raw, _ = eng.step(swapped, frames[1])
    assert s2.cache_feats.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(raw)).all()


def test_stream_state_roundtrip_resume(setup, tmp_path):
    """Mid-stream save/load: a resumed engine continues identically to an
    uninterrupted one (serving preemption safety)."""
    from dcnet_tpu.serving.engine import load_stream_state, save_stream_state

    model, variables = setup
    rng = np.random.RandomState(9)
    frames = rng.rand(6, 2, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (2, 20)).astype(np.int32)
    engine = GroundingEngine(model, variables, CFG, n_streams=2,
                             n_frame=5, topk=3, fuse_window=3)
    state = engine.init_state(word_ids)
    for t in range(3):
        state, *_ = engine.step(state, frames[t])
    path = str(tmp_path / "streams.npz")
    save_stream_state(path, state)
    resumed = load_stream_state(path)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for t in range(3, 6):
        state, fused_a, raw_a, _ = engine.step(state, frames[t])
        resumed, fused_b, raw_b, _ = engine.step(resumed, frames[t])
    np.testing.assert_array_equal(np.asarray(raw_a), np.asarray(raw_b))
    np.testing.assert_array_equal(np.asarray(fused_a), np.asarray(fused_b))


def test_rotate_rings_match_shift_rings(setup):
    """The rotating single-slot ring write (default) must produce the same
    predictions as the shifted-buffer layout at every step — the buffer
    order is rotated, the temporal order read by the trunk is identical."""
    model, variables = setup
    rng = np.random.RandomState(7)
    n_steps = 8
    frames = rng.rand(n_steps, 2, 64, 64, 3).astype(np.float32)
    word_ids = rng.randint(1, 50, (2, 20)).astype(np.int32)

    rot = GroundingEngine(model, variables, CFG, n_streams=2, n_frame=5,
                          topk=3, fuse_window=3, donate_state=False,
                          rotate_rings=True)
    shf = GroundingEngine(model, variables, CFG, n_streams=2, n_frame=5,
                          topk=3, fuse_window=3, donate_state=False,
                          rotate_rings=False)
    s_rot = rot.init_state(word_ids)
    s_shf = shf.init_state(word_ids)
    for t in range(n_steps):
        s_rot, f_rot, r_rot, sc_rot = rot.step(s_rot, frames[t])
        s_shf, f_shf, r_shf, sc_shf = shf.step(s_shf, frames[t])
        np.testing.assert_allclose(np.asarray(r_rot), np.asarray(r_shf),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_rot), np.asarray(f_shf),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc_rot), np.asarray(sc_shf),
                                   rtol=1e-5, atol=1e-6)
    # ring CONTENTS are a rotation of each other: same frame set
    got = np.sort(np.asarray(s_rot.feat_rings[0]).ravel())
    want = np.sort(np.asarray(s_shf.feat_rings[0]).ravel())
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_stream_state_loads_pre_slot_checkpoint(setup, tmp_path):
    """Round-3 .npz stream states have no `slot` entry; loading must
    default to newest==last (the shift layout's invariant) so old
    checkpoints resume correctly on a rotate-mode engine."""
    import os

    from dcnet_tpu.serving.engine import (load_stream_state,
                                          save_stream_state)

    model, variables = setup
    rng = np.random.RandomState(8)
    word_ids = rng.randint(1, 50, (1, 20)).astype(np.int32)
    engine = GroundingEngine(model, variables, CFG, n_streams=1, n_frame=5,
                             topk=3, fuse_window=3, donate_state=False,
                             rotate_rings=False)  # shift layout writer
    state = engine.init_state(word_ids)
    for t in range(5):
        state, *_ = engine.step(
            state, rng.rand(1, 64, 64, 3).astype(np.float32))

    path = os.path.join(tmp_path, "state.npz")
    save_stream_state(path, state)
    # simulate a round-3 checkpoint: strip the slot entry
    data = dict(np.load(path))
    data.pop("slot")
    np.savez(path, **data)

    resumed = load_stream_state(path)
    assert int(resumed.slot) == 4  # newest == last slot
    # stepping the resumed state on a rotate engine matches continuing
    # the original shift engine (the first rotate write replaces slot 0
    # = the oldest frame, preserving temporal order)
    rot = GroundingEngine(model, variables, CFG, n_streams=1, n_frame=5,
                          topk=3, fuse_window=3, donate_state=False,
                          rotate_rings=True)
    nxt = rng.rand(1, 64, 64, 3).astype(np.float32)
    _, _, raw_rot, _ = rot.step(resumed, nxt)
    _, _, raw_shf, _ = engine.step(state, nxt)
    np.testing.assert_allclose(np.asarray(raw_rot), np.asarray(raw_shf),
                               rtol=1e-5, atol=1e-5)


def test_compiler_options_aot_step_matches_jit(setup):
    """compiler_options routes the step through AOT lower/compile (the
    axon deployment rejects TPU flags in XLA_FLAGS, so options like
    xla_tpu_scoped_vmem_limit_kib must ride the PJRT compile call).
    The AOT executable must be cached across steps and bit-match the
    plain jit engine."""
    model, variables = setup
    rng = np.random.RandomState(11)
    word_ids = rng.randint(1, 50, (2, 20)).astype(np.int32)
    frames = [rng.rand(2, 64, 64, 3).astype(np.float32) for _ in range(3)]

    # xla_backend_optimization_level is accepted by every backend; the
    # real deployments pass TPU-only options here
    aot = GroundingEngine(model, variables, CFG, n_streams=2, n_frame=3,
                          topk=3, fuse_window=3,
                          compiler_options={
                              "xla_backend_optimization_level": "1"})
    plain = GroundingEngine(model, variables, CFG, n_streams=2, n_frame=3,
                            topk=3, fuse_window=3)
    sa, sp = aot.init_state(word_ids), plain.init_state(word_ids)
    for f in frames:
        sa, fa, ra, _ = aot.step(sa, f)
        sp, fp, rp, _ = plain.step(sp, f)
    assert aot._step_aot is not None
    exe = aot._step_aot[1]
    sa, fa, ra, _ = aot.step(sa, frames[0])
    sp, fp, rp, _ = plain.step(sp, frames[0])
    assert aot._step_aot[1] is exe  # cached, not recompiled
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fp),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rp),
                               rtol=1e-5, atol=1e-5)
