"""Shared fusion-head building blocks (flax linen, NHWC).

Rebuilds the head modules of `/root/reference/model/DCNet_model.py:254-338`:
ConvBatchNormReLU (darknet.py:118-156, BN eps 1e-5 / torch momentum 0.999),
the 3-scale visual mapping, the language MLP, the per-scale fusion FCN +
box head (full and `light` variants), and the location-embedding MLPs.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcnet_tpu.config import ANCHORS_PER_SCALE, BOX_ATTRS


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2) equivalent.

    Clamps the *squared* norm before rsqrt so the gradient at an exactly-zero
    vector is 0 rather than NaN (ReLU'd feature maps do produce all-zero
    slices; torch's clamp_min(eps) backward has the same zero-grad behavior).
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


class QuantConv2D(nn.Module):
    """Bias-free NHWC conv with an optional static-scale int8 eval path.

    Drop-in for the `nn.Conv(use_bias=False)` inside ConvBNReLU: same param
    name ("kernel"), shape, init, and float arithmetic, so checkpoints and
    the reference bridge are unaffected. The extra modes extend the
    backbone's PTQ design (ops/quant.py) to the trunk convs:

    - mode="calib": float conv + record the per-conv input abs-max into the
      mutable 'quant' collection (apply with mutable=["quant"]).
    - mode="int8": per-OUTPUT-CHANNEL int8 weights (scale = max|w|/127,
      quantized at trace time from the stored float kernel — negligible
      next to the conv itself) x per-tensor static int8 activations
      (scale = calibrated abs-max/127; the round/clip/cast fuses into the
      previous layer's epilogue, no runtime max-reduce). The s8xs8->s32
      conv rides the v5e MXU int path at 2x bf16 peak; the dequant is a
      per-channel fp32 scale XLA folds into the following BN affine.

    Split input (`x = (shared, [part_0, ..., part_{R-1}])`): evaluates the
    conv on R concatenations `[shared, part_r]` while computing the shared
    half's contraction ONCE — `W @ concat(s, p) = W_s @ s + W_p @ p` with
    `W_s = kernel[..., :C_s, :]`. The kernel param keeps the single
    (1, 1, C_s + C_p, out) concat shape, so checkpoints/bridges are
    unaffected. Used by DCNet.eval_features, where corr_conv consumes the
    SAME center features against n_frame-1 attended reference maps
    (test_DCNet_model.py:303-332): the center half of the contraction is
    (R-1)/(2R) of the corr_conv FLOPs, recomputed R times by the naive
    loop. int8 mode quantizes both halves with the concat-calibrated
    act scale and sums in int32 — bit-identical to the concat conv.
    1x1/stride-1 only. Returns a list of R outputs.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32
    mode: str = "off"  # off | calib | int8 (cfg.trunk_quant)

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        split = isinstance(x, tuple)
        if split:
            shared, parts = x
            assert self.kernel == 1 and self.stride == 1, \
                "split-input QuantConv2D is 1x1/stride-1 only (corr_conv)"
            # parts: list of (B, H, W, C_p) arrays, or one STACKED
            # (B, R, H, W, C_p) array (cfg.coattn_batch_refs) — the
            # stacked form runs the R part-convs as ONE conv on the
            # flattened (B*R) batch and returns a stacked result
            stacked = not isinstance(parts, (list, tuple))
            c_s = shared.shape[-1]
            in_ch = c_s + (parts.shape[-1] if stacked else parts[0].shape[-1])
        else:
            in_ch = x.shape[-1]
        pad = (self.kernel - 1) // 2
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, in_ch, self.features),
                       jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        strides = (self.stride, self.stride)
        padding = [(pad, pad), (pad, pad)]

        def conv(inp, ker, acc_t=None):
            return jax.lax.conv_general_dilated(
                inp, ker, strides, padding, dimension_numbers=dn,
                **({"preferred_element_type": acc_t} if acc_t else {}))

        if self.mode in ("calib", "int8"):
            amax = self.variable("quant", "act_max",
                                 lambda: jnp.zeros((), jnp.float32))
        if self.mode == "calib" and not self.is_initializing():
            if split:
                pieces = [shared, parts] if stacked else [shared, *parts]
            else:
                pieces = [x]
            m = jnp.max(jnp.stack(
                [jnp.max(jnp.abs(p.astype(jnp.float32))) for p in pieces]))
            amax.value = jnp.maximum(amax.value, m)
        if self.mode == "int8" and not self.is_initializing():
            w32 = w.astype(jnp.float32)
            s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)),
                              1e-12) / 127.0
            s_in = jnp.maximum(amax.value, 1e-12) / 127.0

            def quant(a):
                return jnp.clip(jnp.round(a.astype(jnp.float32) / s_in),
                                -127, 127).astype(jnp.int8)

            wq = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
            if split:
                y_s = conv(quant(shared), wq[:, :, :c_s], jnp.int32)
                if stacked:
                    b, r = parts.shape[:2]
                    y_p = conv(quant(parts.reshape(b * r, *parts.shape[2:])),
                               wq[:, :, c_s:], jnp.int32)
                    y = y_s[:, None] + y_p.reshape(b, r, *y_p.shape[1:])
                    return y.astype(jnp.float32) * (s_in * s_w)
                return [(y_s + conv(quant(p), wq[:, :, c_s:], jnp.int32)
                         ).astype(jnp.float32) * (s_in * s_w)
                        for p in parts]
            return conv(quant(x), wq, jnp.int32
                        ).astype(jnp.float32) * (s_in * s_w)
        wd = w.astype(self.dtype)
        if split:
            y_s = conv(shared.astype(self.dtype), wd[:, :, :c_s])
            if stacked:
                b, r = parts.shape[:2]
                y_p = conv(parts.reshape(
                    b * r, *parts.shape[2:]).astype(self.dtype),
                    wd[:, :, c_s:])
                return y_s[:, None] + y_p.reshape(b, r, *y_p.shape[1:])
            return [y_s + conv(p.astype(self.dtype), wd[:, :, c_s:])
                    for p in parts]
        return conv(x.astype(self.dtype), wd)


class ConvBNReLU(nn.Module):
    """Conv -> BN(eps 1e-5, torch momentum 0.999) -> ReLU/LeakyReLU.

    Torch momentum 0.999 means running stats track the latest batch almost
    exactly; flax momentum = 1 - 0.999 = 0.001.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    leaky: bool = False
    relu: bool = True
    dtype: Any = jnp.float32
    quant: str = "off"  # cfg.trunk_quant, see QuantConv2D

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: NHWC array, or a `(shared, [parts...])` split input (eval
        only — see QuantConv2D); the split form returns a list, or one
        stacked (B, R, H, W, F) array when parts came stacked (BN in
        eval mode and leaky are per-channel elementwise, rank-agnostic)."""
        split = isinstance(x, tuple)
        assert not (split and train), \
            "split ConvBNReLU input is an eval-path optimization"
        x = QuantConv2D(self.features, self.kernel, self.stride,
                        dtype=self.dtype, mode="off" if train else self.quant,
                        name="conv")(x)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.001,
                          epsilon=1e-5, dtype=jnp.float32, name="bn")

        def finish(y):
            y = bn(y)
            if self.dtype != jnp.float32:
                # BN math fp32, stored activation in the compute dtype
                y = y.astype(self.dtype)
            if self.leaky:
                y = nn.leaky_relu(y, negative_slope=0.1)
            elif self.relu:
                y = nn.relu(y)
            return y

        return [finish(y) for y in x] if isinstance(x, list) else finish(x)


class DenseBNReLU(nn.Module):
    """Linear -> BatchNorm1d (torch default momentum 0.1) -> ReLU."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 gram_factors=None) -> jnp.ndarray:
        """Standard path: ReLU(BN(x @ W + b)).

        gram_factors=(ce (B,P,E), obj (B,P)) computes the location branch's
        ReLU(BN((ce ceᵀ diag(obj)) @ W + b)) (DCNet_model.py:585-597)
        WITHOUT the (P, P) Gram matrix: ce ceᵀ has rank ≤ E (=8), so
        (ce ceᵀ diag(obj)) W = ce (ceᵀ (obj ∘ W)) by associativity — exact,
        ~P/(2E) fewer FLOPs (≈84x at P=1344) and no quadratic intermediate
        in HBM or VMEM. `x` is ignored on this path; output is (B*P, C) to
        match the standard path's flattened layout.
        """
        dense = nn.Dense(self.features, dtype=self.dtype, name="fc")
        if gram_factors is None:
            x = dense(x)
        else:
            ce, obj = gram_factors
            a = jnp.swapaxes(ce, 1, 2) * obj[:, None, :]     # (B, E, P)
            h = dense(a)                                     # ceᵀ(obj∘W) + b
            bias = dense(jnp.zeros_like(a[:1, :1]))          # (1, 1, C) == b
            lin = jnp.einsum("bpe,bec->bpc", ce, h - bias) + bias
            x = lin.reshape(-1, self.features)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        if self.dtype != jnp.float32:
            x = x.astype(self.dtype)
        return nn.relu(x)


class MappingLang(nn.Module):
    """textdim -> emb -> emb MLP with BN/ReLU/Dropout (DCNet_model.py:268-276)."""

    emb_size: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DenseBNReLU(self.emb_size, dtype=self.dtype, name="l0")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBNReLU(self.emb_size, dtype=self.dtype, name="l1")(x, train)
        return x


class FusionFCN(nn.Module):
    """Per-scale fusion trunk + box head (DCNet_model.py:293-338).

    full: fcn_emb = 1x1 -> 3x3 -> 1x1 ConvBNReLU, fcn_out = 1x1 ConvBNReLU
    (emb->emb/2) + plain 1x1 conv to 15 channels.
    light: single 1x1 ConvBNReLU + plain 1x1 conv.
    Returns (intermediate features NHWC, outbox (B, 3, 5, h, w)).
    """

    emb_size: int
    light: bool = False
    leaky: bool = False
    dtype: Any = jnp.float32
    quant: str = "off"  # cfg.trunk_quant, see QuantConv2D

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        e = self.emb_size
        q = self.quant
        if self.light:
            x = ConvBNReLU(e, 1, leaky=self.leaky, dtype=self.dtype,
                           quant=q, name="emb0")(x, train)
        else:
            x = ConvBNReLU(e, 1, leaky=self.leaky, dtype=self.dtype,
                           quant=q, name="emb0")(x, train)
            x = ConvBNReLU(e, 3, leaky=self.leaky, dtype=self.dtype,
                           quant=q, name="emb1")(x, train)
            x = ConvBNReLU(e, 1, leaky=self.leaky, dtype=self.dtype,
                           quant=q, name="emb2")(x, train)
        intmd = x
        if not self.light:
            x = ConvBNReLU(e // 2, 1, leaky=self.leaky, dtype=self.dtype,
                           quant=q, name="out0")(x, train)
        x = nn.Conv(ANCHORS_PER_SCALE * BOX_ATTRS, (1, 1), dtype=self.dtype,
                    name="out1")(x)
        b, h, w, _ = x.shape
        outbox = x.reshape(b, h, w, ANCHORS_PER_SCALE, BOX_ATTRS)
        outbox = jnp.transpose(outbox, (0, 3, 4, 1, 2))  # (B, 3, 5, h, w)
        return intmd, outbox


def tile_language(flang: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, C) -> (B, h, w, C) tile (DCNet_model.py:492-493)."""
    return jnp.broadcast_to(flang[:, None, None, :],
                            (flang.shape[0], h, w, flang.shape[1]))
