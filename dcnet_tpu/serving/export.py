"""AOT serving artifacts: serialize the compiled serving step to StableHLO.

`jax.export` captures the engine's jitted step (and the language encoder)
as portable StableHLO programs. The deployment side loads them with
`ServingRuntime` and serves WITHOUT the model code — no flax, no DCNet
class, no Python forward; just the two programs plus the weight pytree.
When the engine was `.quantize()`d first, the int8 backbone weights are
baked into the program as constants, so the artifact IS the quantized
deployment bundle.

The reference has no analog (its serving story is re-running the eval
script); this is the TPU-native production packaging: trace/compile once
on the build machine, ship bytes, execute on any host with the same JAX
runtime + platform.

    engine = GroundingEngine(model, variables, cfg, ...)
    engine.quantize(calib)                      # optional int8 backbone
    export_engine(engine, "artifacts/engine")   # writes 3 files
    ...
    rt = ServingRuntime("artifacts/engine", variables)
    state = rt.init_state(word_ids)
    state, fused, raw, score = rt.step(state, frames)
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dcnet_tpu.serving.engine import GroundingEngine, StreamState

jax_export.register_namedtuple_serialization(
    StreamState, serialized_name="dcnet_tpu.serving.StreamState")

_META = "meta.json"
_STEP = "step.stablehlo"
_LANG = "encode_lang.stablehlo"


def _state_specs(engine: GroundingEngine, language) -> StreamState:
    """ShapeDtypeStructs matching engine.init_state's output."""
    cfg = engine.cfg
    n = engine.n_streams
    sd = jax.ShapeDtypeStruct
    st = jnp.dtype(engine.state_dtype)
    return StreamState(
        feat_rings=tuple(
            sd((n, engine.n_frame, g, g, cfg.emb_size), st)
            for g in cfg.grids),
        cache_boxes=sd((n, engine.fuse_window, engine.topk, 4), jnp.float32),
        cache_scores=sd((n, engine.fuse_window, engine.topk), jnp.float32),
        cache_feats=sd((n, engine.fuse_window, engine.topk, cfg.emb_size),
                       st),
        frames_seen=sd((n,), jnp.int32),
        word_ids=sd((n, cfg.query_len), jnp.int32),
        language=tuple(sd(x.shape, x.dtype) for x in language),
        slot=sd((), jnp.int32),
    )


def export_engine(engine: GroundingEngine, out_dir: str,
                  platforms: Optional[Sequence[str]] = None) -> None:
    """Write the serving bundle: step + language-encoder programs + meta.

    platforms defaults to the current backend; pass e.g. ("tpu", "cpu")
    for a multi-platform artifact."""
    cfg = engine.cfg
    os.makedirs(out_dir, exist_ok=True)
    n = engine.n_streams
    ids_spec = jax.ShapeDtypeStruct((n, cfg.query_len), jnp.int32)
    var_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
        engine.variables)
    kw = {"platforms": tuple(platforms)} if platforms else {}

    lang_exp = jax_export.export(engine._encode_lang, **kw)(
        var_specs, ids_spec)
    language = jax.eval_shape(engine._encode_lang, var_specs, ids_spec)

    frames_spec = jax.ShapeDtypeStruct(
        (n, cfg.image_size, cfg.image_size, 3), jnp.float32)
    step_exp = jax_export.export(engine._step, **kw)(
        var_specs, _state_specs(engine, language), frames_spec)

    with open(os.path.join(out_dir, _STEP), "wb") as f:
        f.write(step_exp.serialize())
    with open(os.path.join(out_dir, _LANG), "wb") as f:
        f.write(lang_exp.serialize())
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({
            "n_streams": n, "n_frame": engine.n_frame,
            "topk": engine.topk, "fuse_window": engine.fuse_window,
            "grids": list(cfg.grids), "emb_size": cfg.emb_size,
            "query_len": cfg.query_len, "image_size": cfg.image_size,
            "quantized": engine.qparams is not None,
            "state_dtype": jnp.dtype(engine.state_dtype).name,
            "platforms": list(step_exp.platforms),
        }, f, indent=2)


class ServingRuntime:
    """Execute an exported serving bundle — no model code required.

    Mirrors GroundingEngine's step/init_state contract; `variables` is the
    same pytree the engine was exported with (weights are NOT baked into
    the artifact, except int8 qparams which are program constants)."""

    def __init__(self, bundle_dir: str, variables):
        with open(os.path.join(bundle_dir, _META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(bundle_dir, _STEP), "rb") as f:
            self._step = jax_export.deserialize(f.read())
        with open(os.path.join(bundle_dir, _LANG), "rb") as f:
            self._lang = jax_export.deserialize(f.read())
        self.variables = variables

    def encode_language(self, word_ids) -> Tuple[jnp.ndarray, ...]:
        return tuple(self._lang.call(
            self.variables, jnp.asarray(word_ids, jnp.int32)))

    def init_state(self, word_ids) -> StreamState:
        m = self.meta
        n = m["n_streams"]
        st = jnp.dtype(m.get("state_dtype", "float32"))
        word_ids = jnp.asarray(word_ids, jnp.int32)
        return StreamState(
            feat_rings=tuple(
                jnp.zeros((n, m["n_frame"], g, g, m["emb_size"]),
                          st) for g in m["grids"]),
            cache_boxes=jnp.zeros((n, m["fuse_window"], m["topk"], 4)),
            cache_scores=jnp.zeros((n, m["fuse_window"], m["topk"])),
            cache_feats=jnp.zeros((n, m["fuse_window"], m["topk"],
                                   m["emb_size"]), st),
            frames_seen=jnp.zeros((n,), jnp.int32),
            word_ids=word_ids,
            language=self.encode_language(word_ids),
            slot=jnp.int32(m["n_frame"] - 1),
        )

    def step(self, state: StreamState, frames):
        out = self._step.call(self.variables, state,
                              jnp.asarray(frames, jnp.float32))
        new_state, fused, raw, score = out
        if not isinstance(new_state, StreamState):
            new_state = StreamState(*new_state)
        return new_state, fused, raw, score
