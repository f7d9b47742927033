"""Post-training int8 quantization of the Darknet backbone (eval/serving).

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate; a static-scale
quantized conv stage measured 1.5-1.9x faster than bf16 on the heavy
darknet-53 stages (BENCH_NOTES.md, round 2). Design:

- weights: symmetric per-OUTPUT-CHANNEL int8 (scale = max|w[..., c]| / 127);
- activations: symmetric per-tensor int8 with STATIC calibrated scales
  (scale = calibration abs-max / 127) — the quantize op is a pure
  round/clip/cast that XLA fuses into the previous layer's epilogue, so
  there is no runtime max-reduce (dynamic quant measured SLOWER than bf16
  for 1x1 convs);
- BatchNorm (eval, running stats) folds into the conv's per-channel output
  scale and bias:  y = conv_s32 * (s_in * s_w * gamma * rsqrt(var+eps))
                       + (beta - mean * gamma * rsqrt(var+eps));
- routing (shortcut add, route concat, upsample) runs in float32 between
  quantized convs, exactly mirroring `DarknetBackbone.__call__`
  (models/darknet.py:215-249, itself rebuilding
  /root/reference/model/darknet.py:391-431).

The same traversal runs three ways: float (reference semantics, used by
calibration and tests), calibration (float + per-conv input abs-max taps),
and int8. `tests/test_quant.py` holds the float traversal bit-close to the
flax module and bounds the int8 feature error.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dcnet_tpu.models.darknet import LayerDef, upsample2

_DN = ("NHWC", "HWIO", "NHWC")
_EPS = 1e-5  # backbone BN epsilon (models/darknet.py:233)


def conv_layer_ids(layer_defs: Sequence[LayerDef]) -> List[int]:
    return [i for i, ld in enumerate(layer_defs)
            if ld.type in ("convolutional", "yoloconvolutional")]


def traverse(layer_defs: Sequence[LayerDef], x: jnp.ndarray,
             conv_fn: Callable[[int, LayerDef, jnp.ndarray], jnp.ndarray]
             ) -> List[jnp.ndarray]:
    """Replicates DarknetBackbone routing with a pluggable conv executor.

    Returns the 3 captured pre-head feature maps (coarsest first)."""
    captured: List[jnp.ndarray] = []
    outs: List[jnp.ndarray] = []
    for i, ld in enumerate(layer_defs):
        if ld.type in ("convolutional", "yoloconvolutional"):
            if ld.type == "yoloconvolutional":
                captured.append(x)
            x = conv_fn(i, ld, x)
        elif ld.type == "maxpool":
            from flax import linen as nn
            pad = (((0, 1), (0, 1)) if (ld.size == 2 and ld.stride == 1)
                   else "SAME")
            x = nn.max_pool(x, (ld.size, ld.size), (ld.stride, ld.stride),
                            padding=pad)
        elif ld.type == "upsample":
            x = upsample2(x)
        elif ld.type == "route":
            x = jnp.concatenate([outs[s] for s in ld.layers], axis=-1)
        elif ld.type == "shortcut":
            x = outs[-1] + outs[ld.from_]
        elif ld.type == "yolo":
            pass
        outs.append(x)
    return captured


def _fold_bn(params: Dict, stats: Dict, i: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(a, b) with  bn_eval(x) == x * a + b  (flax BatchNorm running-stats
    form: (x - mean) * rsqrt(var + eps) * scale + bias)."""
    bn_p, bn_s = params[f"bn_{i}"], stats[f"bn_{i}"]
    # fp32 regardless of stored param dtype: quantization math must work on
    # bf16-cast serving params too (ADVICE r2).
    scale, var = (jnp.asarray(bn_p["scale"], jnp.float32),
                  jnp.asarray(bn_s["var"], jnp.float32))
    a = scale * lax.rsqrt(var + _EPS)
    return a, jnp.asarray(bn_p["bias"], jnp.float32) - jnp.asarray(
        bn_s["mean"], jnp.float32) * a


def fp_conv_fn(params: Dict, stats: Dict
               ) -> Callable[[int, LayerDef, jnp.ndarray], jnp.ndarray]:
    """Float executor: conv + folded eval-BN + leaky. Matches
    DarknetBackbone(train=False) within BN-reassociation rounding."""
    def fn(i: int, ld: LayerDef, x: jnp.ndarray) -> jnp.ndarray:
        y = lax.conv_general_dilated(
            x, jnp.asarray(params[f"conv_{i}"]["kernel"], x.dtype),
            (ld.stride, ld.stride),
            [(ld.pad, ld.pad), (ld.pad, ld.pad)], dimension_numbers=_DN)
        if ld.batch_normalize:
            a, b = _fold_bn(params, stats, i)
            y = y * a + b
        else:
            y = y + jnp.asarray(params[f"conv_{i}"]["bias"], y.dtype)
        if ld.activation == "leaky":
            y = jax.nn.leaky_relu(y, 0.1)
        return y
    return fn


def calibrate(layer_defs: Sequence[LayerDef], params: Dict, stats: Dict,
              images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-conv input abs-max over a calibration batch (jitted float pass).

    Call over several batches and reduce with `merge_calibration`."""
    fp = fp_conv_fn(params, stats)
    maxes: Dict[str, jnp.ndarray] = {}

    def tap(i: int, ld: LayerDef, x: jnp.ndarray) -> jnp.ndarray:
        maxes[str(i)] = jnp.max(jnp.abs(x))
        return fp(i, ld, x)

    traverse(layer_defs, images, tap)
    return maxes


def merge_calibration(batches: Sequence[Dict[str, Any]]) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for m in batches:
        for k, v in m.items():
            out[k] = max(out.get(k, 0.0), float(v))
    return out


def quantize_backbone(layer_defs: Sequence[LayerDef], params: Dict,
                      stats: Dict, act_max: Dict[str, float]) -> Dict:
    """Build the int8 parameter pytree from float params + calibration.

    Per conv i: {"w": int8 [k,k,ci,co], "inv_in": f32 (=1/s_in),
    "scale": f32 [co] (= s_in * s_w * bn_a), "bias": f32 [co]}."""
    q: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i in conv_layer_ids(layer_defs):
        ld = layer_defs[i]
        w = np.asarray(params[f"conv_{i}"]["kernel"], np.float32)
        s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
        wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
        s_in = max(act_max[str(i)], 1e-12) / 127.0
        if ld.batch_normalize:
            a, b = _fold_bn(params, stats, i)
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
        else:
            a = np.ones(w.shape[-1], np.float32)
            b = np.asarray(params[f"conv_{i}"]["bias"], np.float32)
        q[str(i)] = {
            "w": jnp.asarray(wq),
            "inv_in": jnp.float32(1.0 / s_in),
            "scale": jnp.asarray(s_in * s_w * a, jnp.float32),
            "bias": jnp.asarray(b, jnp.float32),
        }
    return q


def sole_conv_consumer(layer_defs: Sequence[LayerDef]) -> Dict[int, int]:
    """{producer conv i -> consumer conv j} for convs whose output feeds
    EXACTLY ONE other conv. Those activations can be stored in HBM already
    quantized with the consumer's input scale (requantize fused into the
    producer's epilogue) — int8 instead of bf16 halves the traffic of the
    bandwidth-bound residual chains (the 1x1 -> 3x3 halves of every
    darknet-53 block qualify; shortcut/route/capture traffic does not).

    Consumer rules mirror `traverse`: layer m+1 reads layer m implicitly
    (except route, which reads only its listed layers); route reads
    `layers`; shortcut reads m-1 AND `from_`; a yoloconvolutional's input
    is ALSO captured as a feature map (extra consumer)."""
    n = len(layer_defs)
    consumers: Dict[int, List] = {i: [] for i in range(-1, n)}
    for m, ld in enumerate(layer_defs):
        if ld.type == "route":
            for s in ld.layers:
                consumers[s if s >= 0 else m + s].append(("any", m))
        else:
            kind = ("conv" if ld.type in ("convolutional",
                                          "yoloconvolutional") else "any")
            consumers[m - 1].append((kind, m))
            if ld.type == "yoloconvolutional":
                consumers[m - 1].append(("capture", m))
            if ld.type == "shortcut":
                f = ld.from_ if ld.from_ >= 0 else m + ld.from_
                consumers[f].append(("any", m))
    out: Dict[int, int] = {}
    for i, ld in enumerate(layer_defs):
        if ld.type not in ("convolutional", "yoloconvolutional"):
            continue
        cons = consumers[i]
        if len(cons) == 1 and cons[0][0] == "conv":
            out[i] = cons[0][1]
    return out


def int8_conv_fn(qparams: Dict, act_dtype: Any = jnp.float32,
                 out_quant: Optional[Dict[int, int]] = None
                 ) -> Callable[[int, LayerDef, jnp.ndarray], jnp.ndarray]:
    """Int8 executor: static-scale quantize (fuses into the previous
    epilogue) + s8 conv (MXU int path) + scale/bias/leaky epilogue.

    act_dtype: dtype of the float activations BETWEEN quantized convs
    (the route/shortcut traffic). bfloat16 halves the HBM traffic of the
    bandwidth-bound high-resolution early stages; the epilogue arithmetic
    (scale/bias in fp32) is unaffected.

    out_quant: `sole_conv_consumer` map — producers listed there emit
    int8 directly (requantized to the consumer's scale in the epilogue),
    skipping the bf16 round-trip through HBM entirely."""
    out_quant = out_quant or {}

    def fn(i: int, ld: LayerDef, x: jnp.ndarray) -> jnp.ndarray:
        qp = qparams[str(i)]
        if x.dtype == jnp.int8:
            xq = x  # producer already stored it at OUR input scale
        else:
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * qp["inv_in"]),
                          -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, qp["w"], (ld.stride, ld.stride),
            [(ld.pad, ld.pad), (ld.pad, ld.pad)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * qp["scale"] + qp["bias"]
        if ld.activation == "leaky":
            y = jax.nn.leaky_relu(y, 0.1)
        j = out_quant.get(i)
        if j is not None:
            return jnp.clip(
                jnp.round(y * qparams[str(j)]["inv_in"]),
                -127, 127).astype(jnp.int8)
        return y.astype(act_dtype)
    return fn


def backbone_apply_fp(layer_defs: Sequence[LayerDef], params: Dict,
                      stats: Dict, images: jnp.ndarray) -> List[jnp.ndarray]:
    """Float traversal (DarknetBackbone eval semantics, folded BN)."""
    return traverse(layer_defs, images, fp_conv_fn(params, stats))


def backbone_apply_int8(layer_defs: Sequence[LayerDef], qparams: Dict,
                        images: jnp.ndarray, act_dtype: Any = jnp.float32,
                        int8_chain: bool = False) -> List[jnp.ndarray]:
    """Quantized traversal: the 3 captured feature maps (act_dtype out).

    int8_chain stores sole-consumer conv activations as int8 in HBM
    (see sole_conv_consumer); the v5e A/B is PATH-DEPENDENT (round 3):
    +1-2% on the batched offline eval step (where the trunk competes for
    HBM), -9% backbone-only, and neutral on the serving step (2,154 vs
    2,157 pred/s same-day A/B, BENCH_NOTES round 3) — so it defaults OFF
    here and only the offline eval bench opts in explicitly."""
    oq = sole_conv_consumer(layer_defs) if int8_chain else None
    return traverse(layer_defs, images,
                    int8_conv_fn(qparams, act_dtype, out_quant=oq))


# --------------------------------------------------------------------------
# Model-level conveniences
# --------------------------------------------------------------------------

def model_layer_defs(model) -> Tuple[LayerDef, ...]:
    from dcnet_tpu.models.darknet import yolov3_layer_defs
    return (model.backbone_defs if model.backbone_defs is not None
            else yolov3_layer_defs())


def quantize_model_backbone(model, variables, calib_images,
                            calib_batch: int = 8) -> Dict:
    """Calibrate + quantize a DCNet's backbone. `calib_images` (N,H,W,3)
    float32 (normalized, as fed to the model); batched to bound memory."""
    defs = model_layer_defs(model)
    params = variables["params"]["visumodel"]
    stats = variables["batch_stats"]["visumodel"]
    cal = jax.jit(lambda im: calibrate(defs, params, stats, im))
    batches = []
    n = calib_images.shape[0]
    for s in range(0, n, calib_batch):
        batches.append(cal(calib_images[s:s + calib_batch]))
    return quantize_backbone(defs, params, stats, merge_calibration(batches))


def quant_extract_features(model, variables, qparams,
                           images: jnp.ndarray,
                           int8_chain: bool = False) -> List[jnp.ndarray]:
    """Drop-in for DCNet.extract_features with the int8 backbone: quantized
    conv stack + float mapping_visu/l2-norm (jit the caller). Inter-conv
    activations ride in the model's compute dtype (bf16 in production),
    or already-quantized int8 on sole-consumer chains (int8_chain)."""
    from dcnet_tpu.models.dcnet import DCNet
    act_dtype = getattr(model, "dtype", jnp.float32)
    raw = backbone_apply_int8(model_layer_defs(model), qparams, images,
                              act_dtype=act_dtype, int8_chain=int8_chain)
    return model.apply(variables, raw, method=DCNet.map_features)


# --------------------------------------------------------------------------
# Trunk quantization (the ~20% of the eval step outside the backbone)
# --------------------------------------------------------------------------
#
# The trunk convs (mapping_visu / corr_conv / fcn emb+out stacks — 1x1 and
# 3x3 ConvBNReLUs, models/heads.py) carry ~230 GFLOP of the ~14 ms eval step
# at clip-batch 16. They quantize through the model itself: DCNetConfig
# .trunk_quant selects the mode and models/heads.py::QuantConv2D implements
# the same static-scale PTQ design as the backbone path above (per-channel
# int8 weights, per-tensor calibrated activations, dequant folded into the
# following BN affine). The helpers here wrap the calibrate -> int8 flow.


def trunk_quant_variant(model, mode: str):
    """The same model with cfg.trunk_quant=mode (params are shared — the
    variant only changes which conv executor traces)."""
    import dataclasses
    cfg = dataclasses.replace(model.cfg, trunk_quant=mode)
    return type(model)(cfg=cfg, dtype=model.dtype,
                       backbone_defs=model.backbone_defs)


def calibrate_trunk(model, variables, apply_fn) -> Dict:
    """Run `apply_fn(calib_model, variables, mutable=["quant"])` over a
    calibration batch and return the 'quant' collection (per-conv input
    abs-max). `apply_fn` should execute the same eval path that will run
    quantized (eval_clip / eval_features / single_image)."""
    calib = trunk_quant_variant(model, "calib")
    _, col = apply_fn(calib, variables)
    return col["quant"]


def save_trunk_scales(path: str, quant_col: Dict) -> None:
    """One .npz of the calibrated trunk activation scales."""
    from flax.traverse_util import flatten_dict
    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(quant_col).items()}
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_trunk_scales(path: str) -> Dict:
    from flax.traverse_util import unflatten_dict
    data = np.load(path)
    return unflatten_dict({tuple(k.split("/")): jnp.asarray(data[k])
                           for k in data.files})


# --------------------------------------------------------------------------
# Quantized-artifact serialization (deployment format)
# --------------------------------------------------------------------------

def save_qparams(path: str, qparams: Dict) -> None:
    """Write the quantized backbone to one .npz (int8 weights + fp32
    scales/biases — ~4x smaller than the float backbone)."""
    flat = {}
    for i, d in qparams.items():
        for k, v in d.items():
            flat[f"{i}/{k}"] = np.asarray(v)
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_qparams(path: str) -> Dict:
    data = np.load(path)
    q: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key in data.files:
        i, k = key.split("/", 1)
        q.setdefault(i, {})[k] = jnp.asarray(data[key])
    return q
