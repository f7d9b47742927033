"""Darknet-53 / YOLOv3 backbone, TPU-native (flax linen, NHWC).

Rebuilds the cfg-driven backbone of `/root/reference/model/darknet.py:99-513`:
conv/BN/leaky blocks, residual shortcuts, route concats, exact expand-reshape
x2 upsampling, and capture of the three pre-head feature maps at the
`yoloconvolutional` markers (darknet.py:406-408). Returns
[C1024 @ /32, C512 @ /16, C256 @ /8] like the reference (darknet.py:431).

Differences by design (TPU-first):
- NHWC layout (XLA's native conv layout on TPU) instead of NCHW; the
  `.weights` converter transposes Darknet's (out, in, kh, kw) kernels to HWIO.
- The whole 75-layer stack is one traced function; routes/shortcuts are plain
  jnp ops, so XLA fuses BN+leaky into the convs.
- Binary `.weights` IO (darknet.py:433-513) is reimplemented as a
  pytree converter (`load_darknet_weights` / `save_darknet_weights`).
"""

from __future__ import annotations

import dataclasses
import io
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LayerDef:
    """One parsed cfg block (everything after [net])."""

    type: str
    filters: int = 0
    size: int = 0
    stride: int = 1
    pad: int = 0
    batch_normalize: bool = False
    activation: str = "linear"
    layers: Tuple[int, ...] = ()   # route sources
    from_: int = 0                 # shortcut source
    in_filters: int = 0            # derived: conv input channels
    out_filters: int = 0           # derived: block output channels


def parse_darknet_cfg(path_or_text: str) -> Tuple[Dict[str, str], Tuple[LayerDef, ...]]:
    """Parse a Darknet INI cfg into (net hyperparams, static layer list).

    Mirrors `parse_model_config` (darknet.py:99-116) plus the filter-tracking
    walk of `create_modules` (darknet.py:162-237) so each LayerDef knows its
    input/output channel counts (needed by the weights converter).
    """
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    blocks: List[Dict[str, str]] = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("["):
            blocks.append({"type": line[1:-1].strip()})
        else:
            k, v = line.split("=", 1)
            blocks[-1][k.strip()] = v.strip()

    net = blocks.pop(0)
    assert net["type"] == "net"
    defs = _blocks_to_defs(blocks, int(net.get("channels", 3)))
    return net, defs


def _blocks_to_defs(blocks: Sequence[Dict[str, str]], channels: int) -> Tuple[LayerDef, ...]:
    out_filters = [channels]
    defs: List[LayerDef] = []
    for b in blocks:
        t = b["type"]
        if t in ("convolutional", "yoloconvolutional"):
            filters = int(b["filters"])
            ld = LayerDef(
                type=t,
                filters=filters,
                size=int(b["size"]),
                stride=int(b.get("stride", 1)),
                pad=(int(b["size"]) - 1) // 2 if int(b.get("pad", 0)) else 0,
                batch_normalize=bool(int(b.get("batch_normalize", 0))),
                activation=b.get("activation", "linear"),
                in_filters=out_filters[-1],
                out_filters=filters,
            )
        elif t == "maxpool":
            ld = LayerDef(type=t, size=int(b["size"]), stride=int(b["stride"]),
                          out_filters=out_filters[-1])
        elif t == "upsample":
            assert int(b["stride"]) == 2, "only x2 upsample supported (as reference)"
            ld = LayerDef(type=t, stride=2, out_filters=out_filters[-1])
        elif t == "route":
            srcs = tuple(int(x) for x in b["layers"].split(","))
            # python-style indexing into the per-layer output list
            filters = sum(out_filters[1:][s] for s in srcs)
            ld = LayerDef(type=t, layers=srcs, out_filters=filters)
        elif t == "shortcut":
            ld = LayerDef(type=t, from_=int(b["from"]),
                          activation=b.get("activation", "linear"),
                          out_filters=out_filters[1:][int(b["from"])])
        elif t == "yolo":
            # vestigial in the DCNet path: placeholder slot keeps route
            # indexing aligned (darknet.py:409-421)
            ld = LayerDef(type=t, out_filters=out_filters[-1])
        else:
            raise ValueError(f"unsupported layer type: {t}")
        defs.append(ld)
        out_filters.append(ld.out_filters)
    return tuple(defs)


def yolov3_layer_defs(num_classes: int = 80) -> Tuple[LayerDef, ...]:
    """Construct the exact YOLOv3 layer sequence programmatically.

    Produces the same 107-layer list as parsing the reference's
    `model/yolov3.cfg` (verified by test): Darknet-53 trunk
    (stages of 1/2/8/8/4 residual blocks) + 3-scale FPN-style head, with the
    third 1x1 conv of each head marked `yoloconvolutional` so the backbone
    captures the [1024 @ /32, 512 @ /16, 256 @ /8] features.
    """
    blocks: List[Dict[str, str]] = []

    def conv(filters: int, size: int, stride: int = 1, t: str = "convolutional",
             bn: bool = True, act: str = "leaky") -> None:
        blocks.append({
            "type": t, "filters": str(filters), "size": str(size),
            "stride": str(stride), "pad": "1",
            "batch_normalize": "1" if bn else "0", "activation": act,
        })

    def residual(mid: int, out: int) -> None:
        conv(mid, 1)
        conv(out, 3)
        blocks.append({"type": "shortcut", "from": "-3"})

    # Darknet-53 trunk
    conv(32, 3)
    for out, n_blocks in ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)):
        conv(out, 3, stride=2)
        for _ in range(n_blocks):
            residual(out // 2, out)

    # Head, 3 scales. Per scale: [1x1, 3x3] x2, marked 1x1, 3x3, det conv.
    det_filters = 3 * (5 + num_classes)
    head = ((512, 1024), (256, 512), (128, 256))
    route_back = (None, "61", "36")  # trunk taps for scales 1 and 2
    for s, (mid, out) in enumerate(head):
        if s > 0:
            blocks.append({"type": "route", "layers": "-4"})
            conv(mid, 1)
            blocks.append({"type": "upsample", "stride": "2"})
            blocks.append({"type": "route", "layers": f"-1, {route_back[s]}"})
        for _ in range(2):
            conv(mid, 1)
            conv(out, 3)
        conv(mid, 1, t="yoloconvolutional")
        conv(out, 3)
        conv(det_filters, 1, bn=False, act="linear")
        blocks.append({"type": "yolo"})

    return _blocks_to_defs(blocks, 3)


def mini_backbone_defs() -> Tuple[LayerDef, ...]:
    """A tiny 3-scale backbone with the same capture contract as YOLOv3
    (features at /32, /16, /8, coarsest first). For tests, smoke runs, and
    fast iteration — NOT weight-compatible with `.weights` files."""
    blocks: List[Dict[str, str]] = []

    def conv(filters: int, size: int, stride: int = 1,
             t: str = "convolutional") -> None:
        blocks.append({
            "type": t, "filters": str(filters), "size": str(size),
            "stride": str(stride), "pad": "1", "batch_normalize": "1",
            "activation": "leaky"})

    conv(8, 3, 2)    # 0: /2
    conv(16, 3, 2)   # 1: /4
    conv(24, 3, 2)   # 2: /8
    conv(32, 3, 2)   # 3: /16
    conv(48, 3, 2)   # 4: /32
    conv(16, 1, t="yoloconvolutional")        # 5: capture 48ch @ /32
    blocks.append({"type": "upsample", "stride": "2"})   # 6: /16
    blocks.append({"type": "route", "layers": "-1, 3"})  # 7: 16+32 @ /16
    conv(16, 1, t="yoloconvolutional")        # 8: capture 48ch @ /16
    blocks.append({"type": "upsample", "stride": "2"})   # 9: /8
    blocks.append({"type": "route", "layers": "-1, 2"})  # 10: 16+24 @ /8
    conv(8, 1, t="yoloconvolutional")         # 11: capture 40ch @ /8
    return _blocks_to_defs(blocks, 3)


def upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact MyUpsample2 (darknet.py:158-160): nearest x2 by expand-reshape."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class DarknetBackbone(nn.Module):
    """cfg-driven backbone. __call__ returns the 3 captured feature maps
    (coarsest first) in NHWC."""

    layer_defs: Tuple[LayerDef, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        captured: List[jnp.ndarray] = []
        outs: List[jnp.ndarray] = []
        for i, ld in enumerate(self.layer_defs):
            if ld.type in ("convolutional", "yoloconvolutional"):
                if ld.type == "yoloconvolutional":
                    captured.append(x)  # capture BEFORE the head conv (darknet.py:406-408)
                x = nn.Conv(
                    ld.filters, (ld.size, ld.size),
                    strides=(ld.stride, ld.stride),
                    padding=[(ld.pad, ld.pad), (ld.pad, ld.pad)],
                    use_bias=not ld.batch_normalize,
                    dtype=self.dtype, name=f"conv_{i}",
                )(x)
                if ld.batch_normalize:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,  # torch default 0.1 => flax 1-0.1
                        epsilon=1e-5, dtype=jnp.float32, name=f"bn_{i}",
                    )(x)
                    if self.dtype != jnp.float32:
                        # BN math stays fp32; the stored activation rides
                        # HBM in the compute dtype (the train-path analog
                        # of the int8 executor's act_dtype — halves the
                        # fwd/bwd activation traffic in bf16 runs)
                        x = x.astype(self.dtype)
                if ld.activation == "leaky":
                    x = nn.leaky_relu(x, negative_slope=0.1)
            elif ld.type == "maxpool":
                pad = ((0, 1), (0, 1)) if (ld.size == 2 and ld.stride == 1) else "SAME"
                x = nn.max_pool(x, (ld.size, ld.size), (ld.stride, ld.stride), padding=pad)
            elif ld.type == "upsample":
                x = upsample2(x)
            elif ld.type == "route":
                x = jnp.concatenate([outs[s] for s in ld.layers], axis=-1)
            elif ld.type == "shortcut":
                x = outs[-1] + outs[ld.from_]
            elif ld.type == "yolo":
                pass  # placeholder slot; DCNet discards detection heads
            outs.append(x)
        return captured


# --------------------------------------------------------------------------
# Binary .weights converter (Darknet layout -> flax pytree and back)
# --------------------------------------------------------------------------

def load_darknet_weights(
    layer_defs: Sequence[LayerDef], path: str, header_len: int = 5
) -> Tuple[Dict[str, Any], np.ndarray]:
    """Parse a Darknet `.weights` blob into flax variables.

    Walk order per conv block (darknet.py:450-483): BN beta, gamma,
    running_mean, running_var (or conv bias when no BN), then conv kernel
    stored as (out, in, kh, kw) — transposed here to flax HWIO.
    Returns ({'params':..., 'batch_stats':...}, header).
    """
    with open(path, "rb") as f:
        header = np.frombuffer(f.read(4 * header_len), dtype=np.int32)
        weights = np.frombuffer(f.read(), dtype=np.float32)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    ptr = 0

    def take(n: int) -> np.ndarray:
        nonlocal ptr
        out = weights[ptr:ptr + n]
        if out.size != n:
            raise ValueError(
                f"weights file exhausted: wanted {n} floats at offset {ptr}, "
                f"have {weights.size - ptr}")
        ptr += n
        return out

    for i, ld in enumerate(layer_defs):
        if ld.type not in ("convolutional", "yoloconvolutional"):
            continue
        c_out, c_in, k = ld.out_filters, ld.in_filters, ld.size
        conv: Dict[str, Any] = {}
        if ld.batch_normalize:
            bias = take(c_out)
            scale = take(c_out)
            mean = take(c_out)
            var = take(c_out)
            params[f"bn_{i}"] = {"bias": jnp.asarray(bias), "scale": jnp.asarray(scale)}
            stats[f"bn_{i}"] = {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}
        else:
            conv["bias"] = jnp.asarray(take(c_out))
        kernel = take(c_out * c_in * k * k).reshape(c_out, c_in, k, k)
        conv["kernel"] = jnp.asarray(kernel.transpose(2, 3, 1, 0))  # OIHW->HWIO
        params[f"conv_{i}"] = conv

    if ptr != weights.size:
        raise ValueError(f"trailing weights: consumed {ptr} of {weights.size}")
    return {"params": params, "batch_stats": stats}, header


def save_darknet_weights(
    layer_defs: Sequence[LayerDef], variables: Dict[str, Any], path: str,
    header: Optional[np.ndarray] = None,
) -> None:
    """Inverse of `load_darknet_weights` (darknet.py:490-513)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    buf = io.BytesIO()
    hdr = np.asarray(header if header is not None else [0, 0, 0, 0, 0], np.int32)
    buf.write(hdr.tobytes())
    for i, ld in enumerate(layer_defs):
        if ld.type not in ("convolutional", "yoloconvolutional"):
            continue
        if ld.batch_normalize:
            buf.write(np.asarray(params[f"bn_{i}"]["bias"], np.float32).tobytes())
            buf.write(np.asarray(params[f"bn_{i}"]["scale"], np.float32).tobytes())
            buf.write(np.asarray(stats[f"bn_{i}"]["mean"], np.float32).tobytes())
            buf.write(np.asarray(stats[f"bn_{i}"]["var"], np.float32).tobytes())
        else:
            buf.write(np.asarray(params[f"conv_{i}"]["bias"], np.float32).tobytes())
        kernel = np.asarray(params[f"conv_{i}"]["kernel"], np.float32)
        buf.write(kernel.transpose(3, 2, 0, 1).tobytes())  # HWIO->OIHW
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def random_darknet_weights_file(
    layer_defs: Sequence[LayerDef], path: str, seed: int = 0, scale: float = 0.05
) -> None:
    """Write a synthetic `.weights` blob (for tests and data-free init)."""
    rng = np.random.RandomState(seed)
    buf = io.BytesIO()
    buf.write(np.asarray([0, 2, 0, 0, 0], np.int32).tobytes())
    for ld in layer_defs:
        if ld.type not in ("convolutional", "yoloconvolutional"):
            continue
        c_out, c_in, k = ld.out_filters, ld.in_filters, ld.size
        if ld.batch_normalize:
            buf.write((rng.randn(c_out) * scale).astype(np.float32).tobytes())      # beta
            buf.write((1 + rng.randn(c_out) * scale).astype(np.float32).tobytes())  # gamma
            buf.write((rng.randn(c_out) * scale).astype(np.float32).tobytes())      # mean
            buf.write(np.abs(1 + rng.randn(c_out) * scale).astype(np.float32).tobytes())  # var
        else:
            buf.write((rng.randn(c_out) * scale).astype(np.float32).tobytes())
        buf.write((rng.randn(c_out * c_in * k * k) * scale).astype(np.float32).tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())
