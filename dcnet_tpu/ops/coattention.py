"""Dense dual-direction co-attention between two frames' feature maps.

Rebuilds the co-attention block of `/root/reference/model/DCNet_model.py:
440-469` (train) and `model/test_DCNet_model.py:247-282` (eval):

    A   = K^T V                    with K = frame1 patches, V = frame2 patches
    attn1(frame1) = V softmax(A^T * T, axis=patches_of_A^T)
    attn2(frame2) = K softmax(A   * T, axis=patches_of_A)

Expressed as einsums over NHWC features so XLA maps the (h*w)x(h*w)
correlation straight onto the MXU and fuses the softmax scaling.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def coattention_pair(
    f1: jnp.ndarray, f2: jnp.ndarray, temperature: float = 10.0,
    tp_shard: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f1, f2: (B, H, W, C). Returns (attended_for_f1, attended_for_f2), NHWC.

    attended_for_f1 = f2-patches aggregated by softmax over f2 positions
    (reference `input1_attn`); attended_for_f2 symmetric (`input2_attn`).
    With tp_shard=True the (P, P) logits are annotated for sharding over a
    'model' mesh axis (tensor parallelism via GSPMD).
    """
    b, h, w, c = f1.shape
    k = f1.reshape(b, h * w, c)  # key: frame1 patches (b, p, c)
    v = f2.reshape(b, h * w, c)  # value: frame2 patches (b, q, c)
    # co_attn_1[b, p, q] = <f1_p, f2_q>
    logits = jnp.einsum("bpc,bqc->bpq", k, v) * temperature
    if tp_shard:
        from jax.sharding import PartitionSpec as P
        logits = jax.lax.with_sharding_constraint(
            logits, P("data", "model", None))
    # co_attn_2 = softmax over dim=1 of transpose(A) * T => over q for fixed p
    # reference softmax(dim=1) on (b, q, p): normalizes over q.
    attn_for_f1 = jax.nn.softmax(logits, axis=2)   # normalize over f2 patches
    # co_attn_1 softmaxed over dim=1 => over p for fixed q
    attn_for_f2 = jax.nn.softmax(logits, axis=1)   # normalize over f1 patches
    # input1_attn = V @ co_attn_2 : out[:, c, p] = sum_q v[c, q] attn[q, p]
    f1_att = jnp.einsum("bqc,bpq->bpc", v, attn_for_f1).reshape(b, h, w, c)
    # input2_attn = K^T... out[:, c, q] = sum_p k[c, p] attn[p, q]
    f2_att = jnp.einsum("bpc,bpq->bqc", k, attn_for_f2).reshape(b, h, w, c)
    return f1_att, f2_att


def _int8_logits(k: jnp.ndarray, v: jnp.ndarray, eq: str,
                 temperature: float) -> jnp.ndarray:
    """QK^T correlation on the int8 MXU path (2x bf16 peak on v5e).

    The eval/serving corr stage feeds l2-NORMALIZED features
    (DCNet.map_features l2-normalizes over channels per position), so
    every element is bounded by 1 and the symmetric int8 scale is the
    STATIC constant 1/127 — no calibration pass, and `<k_p, v_q> <= 1`
    (Cauchy-Schwarz) keeps the int32 accumulator exact. Worst-case
    per-element quantization error on the logits is ~2/127 * sqrt(C)
    before the temperature scale; the softmax downstream sees ~0.1
    absolute logit noise at T=10 (bounded in test_ops.py)."""
    kq = jnp.clip(jnp.round(k.astype(jnp.float32) * 127.0),
                  -127, 127).astype(jnp.int8)
    vq = jnp.clip(jnp.round(v.astype(jnp.float32) * 127.0),
                  -127, 127).astype(jnp.int8)
    raw = jnp.einsum(eq, kq, vq, preferred_element_type=jnp.int32)
    # dequant back to the caller's compute dtype: the float path's logits
    # intermediate is bf16 on TPU, and widening the (P, P) tensor to fp32
    # would double the softmax's HBM traffic
    return (raw.astype(jnp.float32)
            * (temperature / (127.0 * 127.0))).astype(k.dtype)


def coattention_center(
    center: jnp.ndarray, ref: jnp.ndarray, temperature: float = 10.0,
    tp_shard: bool = False, int8_logits: bool = False,
) -> jnp.ndarray:
    """Eval-path single direction: attended features for the center frame
    against one reference frame (test_DCNet_model.py:247-274 uses only the
    `input1` concat direction). Computed directly — direction 2's softmax
    and apply matmul are never built (outside jit there is no DCE to
    remove them)."""
    b, h, w, c = center.shape
    k = center.reshape(b, h * w, c)
    v = ref.reshape(b, h * w, c)
    if int8_logits:
        logits = _int8_logits(k, v, "bpc,bqc->bpq", temperature)
    else:
        logits = jnp.einsum("bpc,bqc->bpq", k, v) * temperature
    if tp_shard:
        from jax.sharding import PartitionSpec as P
        logits = jax.lax.with_sharding_constraint(
            logits, P("data", "model", None))
    attn_for_f1 = jax.nn.softmax(logits, axis=2)
    return jnp.einsum("bqc,bpq->bpc", v, attn_for_f1).reshape(b, h, w, c)


def coattention_center_batched(
    center: jnp.ndarray, refs: jnp.ndarray, temperature: float = 10.0,
    int8_logits: bool = False,
) -> jnp.ndarray:
    """All-references single-direction co-attention in ONE dot_general.

    center (B, H, W, C); refs (B, R, H, W, C) -> attended (B, R, H, W, C),
    row r == coattention_center(center, refs[:, r]).

    The center block is a BROADCAST batch operand of the logits einsum
    ("bpc,brqc->brpq"): XLA lowers it as one (P, C) x (C, R*Q) matmul per
    batch row — R times the MXU N-dimension of the per-reference loop,
    with NO materialized copies of the center features (the round-1 probe
    that rejected ref-batching fed a Pallas pair kernel, which needed R
    explicit center copies; this formulation has no such operand)."""
    b, h, w, c = center.shape
    r = refs.shape[1]
    p = h * w
    k = center.reshape(b, p, c)
    v = refs.reshape(b, r, p, c)
    if int8_logits:
        logits = _int8_logits(k, v, "bpc,brqc->brpq", temperature)
    else:
        logits = jnp.einsum("bpc,brqc->brpq", k, v) * temperature
    attn = jax.nn.softmax(logits, axis=3)
    out = jnp.einsum("brqc,brpq->brpc", v, attn.astype(v.dtype))
    return out.reshape(b, r, h, w, c)
