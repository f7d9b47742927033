"""Streaming multi-query grounding engine (BASELINE.json config 5).

The reference has no serving layer (SURVEY.md §1: "no serving layer, no
scheduler"); its closest analog is the offline 2-pass cache + fusion
(test_DCNet.py --cache + post_processing.py). This engine is the online,
TPU-native version designed for v5e-slice deployment:

- N independent video streams, each with its own referring phrase, batched
  into one jitted step; shard the stream axis over the 'data' mesh axis.
- Per-stream ring buffer of the last `n_frame` *mapped backbone features*
  in HBM — each step runs the Darknet backbone ONLY on the newly arrived
  frames (a ~n_frame x backbone-FLOP saving over the reference, which
  re-runs all 5 frames per clip, test_DCNet.py:373).
- Per-stream ring of recent top-k (box, score, fused-feature) tuples; the
  temporal fusion of post_processing.py runs inside the same jitted step.

Predictions are for the window center, i.e. delayed by n_frame//2 frames —
the same temporal contract as the reference's offline pipeline.
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.eval.temporal import build_frame_cache
from dcnet_tpu.models.dcnet import DCNet
from dcnet_tpu.ops.decode import decode_best


class StreamState(NamedTuple):
    """Ring buffers for all streams. Leading dim = n_streams."""

    feat_rings: Tuple[jnp.ndarray, ...]  # per scale (N, n_frame, h, w, C)
    cache_boxes: jnp.ndarray             # (N, fuse_window, K, 4)
    cache_scores: jnp.ndarray            # (N, fuse_window, K)
    cache_feats: jnp.ndarray             # (N, fuse_window, K, C)
    frames_seen: jnp.ndarray             # (N,) int32
    word_ids: jnp.ndarray                # (N, L) each stream's phrase
    language: Tuple[jnp.ndarray, ...]    # cached (flang, context, embedded)
    slot: jnp.ndarray                    # () int32 — physical ring index of
    #   the NEWEST frame (rotate mode); carried but unused in shift mode


class GroundingEngine:
    """Batched streaming server. Not a flax module — owns variables + jits."""

    def __init__(self, model: DCNet, variables, cfg: DCNetConfig,
                 n_streams: int, n_frame: int = 5, topk: int = 5,
                 fuse_window: int = 5, mesh=None,
                 donate_state: bool = True, rotate_rings: bool = True,
                 int8_rings: bool = False, int8_chain: bool = False,
                 compiler_options=None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.n_streams = n_streams
        if n_streams > 8 and n_streams % 8:
            # Measured cliff, not a guess: the per-tick backbone batch is
            # n_streams, and TPU pads batch rows to the sublane multiple
            # (8). 140 streams ran 12% BELOW 120 AND 4% below 160 on the
            # v5e (BENCH_NOTES round-5 stream curve) — pad rows are paid
            # in full. Throughput peak: 120 streams.
            logging.getLogger(__name__).warning(
                "n_streams=%d is not a multiple of 8: the TPU pads the "
                "per-tick batch to the sublane multiple and throughput "
                "drops measurably (e.g. 140 streams ran 12%% below 120). "
                "Prefer a multiple of 8 (120 is the measured v5e peak).",
                n_streams)
        self.n_frame = n_frame
        self.topk = topk
        self.fuse_window = fuse_window
        self.mesh = mesh
        # Ring/cache storage dtype follows the model compute dtype: the
        # trunk reads the rings in that dtype anyway, and at bf16 the
        # full-ring shift + trunk reads halve their HBM traffic (the rings
        # are by far the largest serving state, ~N*n_frame*Σg²*C).
        self.state_dtype = model.dtype
        # int8 feature rings: mapped features are l2-normalized per
        # position, so the static symmetric scale 1/127 quantizes them
        # without calibration (same bound as the int8 co-attention logits,
        # ops.coattention._int8_logits). Halves ring HBM again vs bf16;
        # the trunk dequantizes slices on read (DCNet.corr_features._deq)
        # and the multiref Pallas kernel reads int8 rings natively. The
        # top-k cache feats stay in state_dtype (tiny, fp32 fusion math).
        self.int8_rings = int8_rings
        # int8_chain: sole-consumer backbone activations stay int8 in HBM
        # (requantize fused into the producer's epilogue, ops/quant.py).
        # Round-5 serving trace motivation: clamp_convert fusions (the
        # quantize edges) are ~28% of the 27 ms step; the round-3
        # "neutral" serving A/B (2,154 vs 2,157) predates bf16 rings.
        self.int8_chain = int8_chain
        self.ring_dtype = jnp.int8 if int8_rings else self.state_dtype
        # Donate the state pytree (mirrors train_step_donated,
        # train/step.py): the shifted rings and top-k caches are written
        # into the incoming buffers instead of fresh allocations — at 80
        # streams that is ~1.1 GB of ring state per tick that no longer
        # doubles up in HBM. The old state is INVALID after step(); pass
        # donate_state=False to keep stepping stale states (tests,
        # side-by-side comparisons).
        self.donate_state = donate_state
        # Rotating ring (default): each step writes the new frame's features
        # into ONE slot (slot = (t) mod n_frame) instead of shifting the
        # whole ring down by one — the shift re-materialized all
        # N*n_frame*Σg²*C ring bytes every tick (2.2 ms of the 29 ms
        # 80-stream step, serving breakdown, BENCH_NOTES round 4). The
        # trunk reads slices by dynamic index in temporal order, so outputs
        # are identical; frame order inside the buffer is rotated only.
        # rotate_rings=False preserves the shift layout for A/B.
        self.rotate_rings = rotate_rings
        self.qparams = None
        self.trunk_qcol = None   # trunk PTQ scales (baked as constants)
        self._qmodel = None      # cfg.trunk_quant="int8" model variant
        # XLA compiler options for the step executable (e.g.
        # xla_tpu_scoped_vmem_limit_kib). The axon deployment rejects TPU
        # flags in XLA_FLAGS (parsed client-side), so options must ride
        # the PJRT compile call — which means AOT lower/compile on first
        # step() instead of plain jit dispatch.
        self.compiler_options = (dict(compiler_options)
                                 if compiler_options else None)
        self._step = self._jit_step()
        self._encode_lang = jax.jit(
            lambda v, ids: self.model.apply(v, ids,
                                            method=DCNet.encode_language))

    def _jit_step(self):
        self._step_aot = None  # any re-jit invalidates the AOT executable
        kw = {"donate_argnums": (1,)} if self.donate_state else {}
        return jax.jit(self._step_impl, **kw)

    def quantize(self, calib_frames, calib_word_ids=None,
                 trunk: bool = True) -> "GroundingEngine":
        """Switch the per-frame backbone to the int8 path (ops/quant.py):
        calibrates activation scales on `calib_frames` (M, H, W, 3) — use
        representative stream frames — and re-jits the step. With
        trunk=True (default) the trunk convs (mapping_visu/corr_conv/fcn)
        also run static-PTQ int8 via cfg.trunk_quant; pass representative
        `calib_word_ids` (B, L) so the fcn stacks calibrate on realistic
        language tiles. The trunk default matches offline eval: with bf16
        feature rings the v5e A/B is 2,684 (trunk on) vs 2,659 pred/s
        (off) at 80 streams — neutral-positive, and the int8 trunk
        shrinks the AOT bundle. (Under the old fp32 rings it was -4.5%:
        the quantize edges then ran from fp32.) Fusion, attention, and
        language paths stay float. Call AFTER cast_params_for_serving
        (the documented artifact flow)."""
        from dcnet_tpu.ops import quant as Q
        self.qparams = Q.quantize_model_backbone(
            self.model, self.variables, jnp.asarray(calib_frames))
        if trunk:
            n_frame = self.n_frame
            frames = jnp.asarray(calib_frames)[:n_frame]
            if frames.shape[0] < n_frame:
                raise ValueError(
                    f"trunk calibration needs >= n_frame={n_frame} frames, "
                    f"got {frames.shape[0]}")
            if calib_word_ids is None:
                calib_word_ids = jnp.ones((1, self.cfg.query_len), jnp.int32)
            wid = jnp.asarray(calib_word_ids)[:1]
            # calibrate on the SAME features the served step will see:
            # raw int8-backbone outputs (not the float backbone), so
            # mapping_visu's act_max matches the deployed activation range
            raw = Q.backbone_apply_int8(
                Q.model_layer_defs(self.model), self.qparams, frames,
                act_dtype=getattr(self.model, "dtype", jnp.float32))

            def calib_path(mdl):
                # one pass covering BOTH step halves: extract (mapping_visu)
                # and the eval trunk (corr_conv/fcn)
                feats = mdl.map_features(raw)
                per_frame = [f.reshape(1, n_frame, *f.shape[1:])
                             for f in feats]
                return mdl.eval_features(per_frame, wid)

            self.trunk_qcol = Q.calibrate_trunk(
                self.model, self.variables,
                lambda m, v: m.apply(v, method=calib_path,
                                     mutable=["quant"]))
            self._qmodel = Q.trunk_quant_variant(self.model, "int8")
        self._step = self._jit_step()
        return self

    def _trunk_model_vars(self, variables):
        """(model, variables) for the quantized-trunk paths: the calibrated
        scales ride as closure constants (like the backbone qparams), so
        `variables` keeps its original pytree structure — the exported
        bundle's contract (serving/export.py)."""
        if self.trunk_qcol is None:
            return self.model, variables
        return self._qmodel, {**variables, "quant": self.trunk_qcol}

    def _extract(self, variables, frames):
        if self.qparams is not None:
            from dcnet_tpu.ops import quant as Q
            model, v = self._trunk_model_vars(variables)
            return Q.quant_extract_features(model, v, self.qparams, frames,
                                            int8_chain=self.int8_chain)
        return self.model.apply(variables, frames,
                                method=DCNet.extract_features)

    def init_state(self, word_ids) -> StreamState:
        """word_ids: (N, L) — each stream's referring phrase. The language
        encoder runs ONCE here and is cached in the state (phrases are
        per-stream constants, so the per-frame step skips the text encoder
        entirely)."""
        cfg = self.cfg
        n = self.n_streams
        word_ids = jnp.asarray(word_ids)
        rings = tuple(
            jnp.zeros((n, self.n_frame, g, g, cfg.emb_size),
                      self.ring_dtype)
            for g in cfg.grids)
        language = self._encode_lang(self.variables, word_ids)
        return StreamState(
            feat_rings=rings,
            cache_boxes=jnp.zeros((n, self.fuse_window, self.topk, 4)),
            cache_scores=jnp.zeros((n, self.fuse_window, self.topk)),
            cache_feats=jnp.zeros((n, self.fuse_window, self.topk,
                                   cfg.emb_size), self.state_dtype),
            frames_seen=jnp.zeros((n,), jnp.int32),
            word_ids=word_ids,
            language=tuple(language),
            slot=jnp.int32(self.n_frame - 1),  # first step writes slot 0
        )

    def update_queries(self, state: StreamState, word_ids,
                       mask=None) -> StreamState:
        """Hot-swap referring phrases for some or all streams mid-flight.

        word_ids: (N, L); mask: (N,) host bool array — True where the
        stream's phrase changed (None = all). The text encoder runs only on
        the changed streams (compacted to an (M, L) batch, results scattered
        back into the language cache), and the affected streams' score
        caches reset (their history grounded a different phrase). Distinct
        change-counts M trigger one jit specialization each; query swaps are
        rare relative to frame steps, so this trades a few recompiles for an
        N/M encoder saving on every swap."""
        word_ids = jnp.asarray(word_ids)
        if mask is None:
            changed = np.arange(self.n_streams)
        else:
            changed = np.nonzero(np.asarray(mask))[0]
        if changed.size == 0:
            return state
        changed = jnp.asarray(changed, jnp.int32)
        changed_ids = word_ids[changed]
        lang_new = self._encode_lang(self.variables, changed_ids)
        language = tuple(
            full.at[changed].set(part.astype(full.dtype))
            for full, part in zip(state.language, lang_new))
        keep = jnp.ones((self.n_streams,), jnp.float32).at[changed].set(0.0)
        # cache_feats rides in state_dtype (bf16 in production) — cast the
        # mask, not the cache: an fp32 multiply would silently promote the
        # ring and break the jitted step's (and exported bundle's) dtype
        # contract.
        keep_f = keep.astype(state.cache_feats.dtype)
        return state._replace(
            word_ids=state.word_ids.at[changed].set(changed_ids),
            language=language,
            cache_boxes=state.cache_boxes * keep[:, None, None, None],
            cache_scores=state.cache_scores * keep[:, None, None],
            cache_feats=state.cache_feats * keep_f[:, None, None, None],
            frames_seen=(state.frames_seen
                         * keep.astype(state.frames_seen.dtype)),
        )

    # ------------------------------------------------------------------

    def _step_impl(self, variables, state: StreamState,
                   frames: jnp.ndarray):
        """frames: (N, H, W, 3) — one new frame per stream. Returns
        (new_state, fused_box (N, 4), raw_box (N, 4), score (N,))."""
        model, cfg = self.model, self.cfg

        # 1. backbone only on the new frames (int8 path after .quantize())
        new_feats = self._extract(variables, frames)
        if self.int8_rings:
            new_feats = [jnp.clip(jnp.round(f.astype(jnp.float32) * 127.0),
                                  -127, 127).astype(jnp.int8)
                         for f in new_feats]
        # 2. ring update: rotate mode writes the new frame into one slot;
        #    shift mode re-materializes the whole ring (A/B baseline)
        if self.rotate_rings:
            new_slot = jax.lax.rem(state.slot + 1, self.n_frame)
            rings = tuple(
                jax.lax.dynamic_update_index_in_dim(
                    ring, f.astype(ring.dtype), new_slot, axis=1)
                for ring, f in zip(state.feat_rings, new_feats))
        else:
            new_slot = state.slot
            rings = tuple(
                jnp.concatenate([ring[:, 1:],
                                 f[:, None].astype(ring.dtype)], axis=1)
                for ring, f in zip(state.feat_rings, new_feats))

        # 3. center-frame grounding from cached visual + language features
        tmodel, tvars = self._trunk_model_vars(variables)
        out = tmodel.apply(tvars, rings, state.word_ids,
                           language=state.language,
                           newest_slot=new_slot if self.rotate_rings
                           else None,
                           method=DCNet.eval_features)
        dec = decode_best(out.outbox, cfg)
        raw_box = dec.boxes[:, 0]
        raw_score = dec.score[:, 0]

        # 4. per-stream top-k cache ring update
        cache_now = build_frame_cache(out.outbox, out.corr_feat,
                                      self.topk, cfg)
        cache_boxes = jnp.concatenate(
            [state.cache_boxes[:, 1:], cache_now.boxes[:, None]], axis=1)
        cache_scores = jnp.concatenate(
            [state.cache_scores[:, 1:], cache_now.scores[:, None]], axis=1)
        cache_feats = jnp.concatenate(
            [state.cache_feats[:, 1:],
             cache_now.feats[:, None].astype(state.cache_feats.dtype)],
            axis=1)

        # 5. temporal fusion over the cache window for each stream:
        #    center entry = fuse_window//2 (post_processing.py:222-276).
        #    vmapped single-center variant of eval.temporal.temporal_fuse.
        def fuse_one(boxes, scores, feats, seen):
            c = self.fuse_window // 2
            # fusion math stays fp32 even when feats are stored bf16
            sim = jnp.einsum("ic,rjc->irj", feats[c], feats,
                             preferred_element_type=jnp.float32)  # (K, R, K)
            sim_max = jnp.max(sim, axis=2)
            best_j = jnp.argmax(sim, axis=2)                   # (K, R)
            picked = jnp.take_along_axis(
                jnp.broadcast_to(scores[None], (self.topk, self.fuse_window,
                                                self.topk)),
                best_j[..., None], axis=2)[..., 0]             # (K, R)
            w = jax.nn.softmax(sim_max, axis=1)
            # ring slots not yet filled are invalid
            slot_age = jnp.arange(self.fuse_window - 1, -1, -1)
            valid = (seen > slot_age).astype(w.dtype)          # (R,)
            w = w * valid[None, :]
            fused = jnp.sum(w * picked, axis=1)
            best = jnp.argmax(fused)
            return boxes[c, best], fused[best]

        fused_box, fused_score = jax.vmap(fuse_one)(
            cache_boxes, cache_scores, cache_feats, state.frames_seen + 1)

        new_state = state._replace(
            feat_rings=rings, cache_boxes=cache_boxes,
            cache_scores=cache_scores, cache_feats=cache_feats,
            frames_seen=state.frames_seen + 1, slot=new_slot)
        return new_state, fused_box, raw_box, raw_score

    # ------------------------------------------------------------------

    def step(self, state: StreamState, frames):
        """Feed one new frame per stream. Returns
        (state, fused_boxes (N,4), raw_boxes (N,4), scores (N,)).
        Predictions are valid once frames_seen >= n_frame.
        With donate_state (the default), the INPUT state's buffers are
        donated to the step — always continue from the returned state."""
        if self.mesh is not None:
            from dcnet_tpu.parallel.mesh import batch_sharding
            sh = batch_sharding(self.mesh)
            frames = jax.device_put(jnp.asarray(frames), sh)
        frames = jnp.asarray(frames)
        if self.compiler_options:
            key = (frames.shape, str(frames.dtype),
                   tuple((l.shape, str(l.dtype))
                         for l in jax.tree_util.tree_leaves(state)))
            if self._step_aot is None or self._step_aot[0] != key:
                self._step_aot = (key, self._step.lower(
                    self.variables, state, frames).compile(
                        compiler_options=self.compiler_options))
            return self._step_aot[1](self.variables, state, frames)
        return self._step(self.variables, state, frames)


def cast_params_for_serving(variables, dtype=None):
    """Cast float params to bf16 for serving: halves weight HBM traffic
    (BN stats stay fp32 for the folded affines)."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16

    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return {
        "params": jax.tree_util.tree_map(cast, variables["params"]),
        "batch_stats": variables["batch_stats"],
    }


def save_stream_state(path: str, state: StreamState) -> None:
    """Persist all stream rings/caches to one .npz — streams survive an
    engine restart or migrate between hosts (the serving analog of
    --auto_resume; the reference has no serving layer to preempt)."""
    import os

    def storable(x):
        # .npy can't serialize bfloat16 — store as float32 (lossless
        # upcast) and record the dtype for the load side to cast back.
        a = np.asarray(x)
        if a.dtype.name not in ("float64", "float32", "float16", "int64",
                                "int32", "int8", "uint8", "bool"):
            return a.astype(np.float32)
        return a

    flat = {}
    for i, r in enumerate(state.feat_rings):
        flat[f"feat_rings/{i}"] = storable(r)
        flat[f"feat_rings_dtype/{i}"] = np.str_(np.asarray(r).dtype.name)
    for i, l in enumerate(state.language):
        flat[f"language/{i}"] = storable(l)
        flat[f"language_dtype/{i}"] = np.str_(np.asarray(l).dtype.name)
    for k in ("cache_boxes", "cache_scores", "cache_feats", "frames_seen",
              "word_ids", "slot"):
        flat[k] = storable(getattr(state, k))
    flat["cache_feats_dtype"] = np.str_(
        np.asarray(state.cache_feats).dtype.name)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_stream_state(path: str) -> StreamState:
    data = np.load(path)

    def restore(key, arr):
        dkey = key.replace("/", "_dtype/", 1) if "/" in key \
            else key + "_dtype"
        x = jnp.asarray(arr)
        if dkey in data.files:
            x = x.astype(jnp.dtype(str(data[dkey])))
        return x

    def seq(prefix):
        keys = sorted((k for k in data.files if k.startswith(prefix + "/")),
                      key=lambda k: int(k.split("/")[1]))
        return tuple(restore(k, data[k]) for k in keys)

    rings = seq("feat_rings")
    return StreamState(
        feat_rings=rings,
        cache_boxes=jnp.asarray(data["cache_boxes"]),
        cache_scores=jnp.asarray(data["cache_scores"]),
        cache_feats=restore("cache_feats", data["cache_feats"]),
        frames_seen=jnp.asarray(data["frames_seen"]),
        word_ids=jnp.asarray(data["word_ids"]),
        language=seq("language"),
        # pre-slot checkpoints (shift layout) resume at newest == last slot
        slot=(jnp.asarray(data["slot"], jnp.int32) if "slot" in data.files
              else jnp.int32(rings[0].shape[1] - 1)),
    )
