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


def coattention_center(
    center: jnp.ndarray, ref: jnp.ndarray, temperature: float = 10.0,
    tp_shard: bool = False,
) -> jnp.ndarray:
    """Eval-path single direction: attended features for the center frame
    against one reference frame (test_DCNet_model.py:247-274 uses only the
    `input1` concat direction). Computed directly — direction 2's softmax
    and apply matmul are never built (outside jit there is no DCE to
    remove them)."""
    b, h, w, c = center.shape
    k = center.reshape(b, h * w, c)
    v = ref.reshape(b, h * w, c)
    logits = jnp.einsum("bpc,bqc->bpq", k, v) * temperature
    if tp_shard:
        from jax.sharding import PartitionSpec as P
        logits = jax.lax.with_sharding_constraint(
            logits, P("data", "model", None))
    attn_for_f1 = jax.nn.softmax(logits, axis=2)
    return jnp.einsum("bqc,bpq->bpc", v, attn_for_f1).reshape(b, h, w, c)
