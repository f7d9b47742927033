"""Fused co-attention Pallas kernel.

The co-attention block (`/root/reference/model/DCNet_model.py:440-459`) is
DCNet's #2 hot loop (SURVEY.md §3): at the /8 scale the (h*w)x(h*w)
correlation is 1024x1024 per image, and the naive composition materializes
softmaxed attention matrices in HBM between matmuls.

Identity used here: with logits = f1 @ f2^T,
    direction 1:  softmax_rows(logits) @ f2        (attended for f1)
    direction 2:  softmax_cols(logits)^T @ f1
                = softmax_rows(f2 @ f1^T) @ f1      (attended for f2)
so both directions are one `_attend(q, kv)` kernel with swapped arguments.
The kernel streams row tiles of q through VMEM — logits (R, P) live only
on-chip, softmax is exact per tile (full rows), and the (P, P) attention
matrix never touches HBM.

Backward is a fused Pallas kernel as well (custom_vjp): it recomputes the
row-tile softmax in VMEM and emits (dq, dkv) directly — the (P, P) logits,
attention weights, and dS matrices never touch HBM in either pass. dkv is
accumulated across row tiles inside the kernel (the TPU grid is sequential,
so the (P, C) accumulator block stays resident per batch element).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _attend_kernel(t, q_ref, kv_ref, o_ref):
    q = q_ref[0]    # (R, C)
    kv = kv_ref[0]  # (P, C)
    logits = jax.lax.dot_general(
        q, kv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * t       # (R, P) fp32, VMEM only
    cdtype = jnp.bfloat16 if kv.dtype == jnp.bfloat16 else kv.dtype
    w = jax.nn.softmax(logits, axis=1).astype(cdtype)
    o_ref[0] = jnp.dot(w, kv.astype(cdtype),
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attend(q: jnp.ndarray, kv: jnp.ndarray, temperature: float,
            interpret: bool = False) -> jnp.ndarray:
    """softmax_rows(q @ kv^T * T) @ kv. q, kv: (B, P, C) -> (B, P, C)."""
    b, p, c = q.shape
    row_tile = min(p, 256)
    assert p % row_tile == 0
    kern = functools.partial(_attend_kernel, temperature)
    return pl.pallas_call(
        kern,
        grid=(b, p // row_tile),
        in_specs=[
            pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 2 * p * p * c,
            bytes_accessed=b * 3 * p * c * q.dtype.itemsize,
            transcendentals=b * p * p,
        ),
        interpret=interpret,
    )(q, kv)


def _attend_bwd_kernel(t, q_ref, kv_ref, g_ref, dq_ref, dkv_ref):
    """VJP of one `_attend` direction for one (batch, row-tile) grid cell.

    o = W kv with W = softmax_rows(S), S = t * q kv^T:
        dW  = g kv^T
        dS  = W (dW - rowsum(dW * W))       (softmax backward)
        dq  = t * dS kv
        dkv = t * dS^T q + W^T g            (accumulated over row tiles)
    """
    j = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)     # (R, C)
    kv = kv_ref[0].astype(jnp.float32)   # (P, C)
    g = g_ref[0].astype(jnp.float32)     # (R, C)

    s = jax.lax.dot_general(
        q, kv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * t          # (R, P)
    w = jax.nn.softmax(s, axis=1)
    dw = jax.lax.dot_general(
        g, kv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (R, P)
    ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))

    dq_ref[0] = (t * jnp.dot(ds, kv, preferred_element_type=jnp.float32)
                 ).astype(dq_ref.dtype)
    dkv_part = (t * jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            w, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # (P, C)

    @pl.when(j == 0)
    def _init():
        dkv_ref[0] = dkv_part.astype(dkv_ref.dtype)

    @pl.when(j > 0)
    def _acc():
        dkv_ref[0] += dkv_part.astype(dkv_ref.dtype)


def _attend_bwd(q: jnp.ndarray, kv: jnp.ndarray, temperature: float,
                g: jnp.ndarray, interpret: bool = False):
    """Fused VJP of `_attend(q, kv)`. Returns (dq, dkv), fp32-accumulated
    then cast to the input dtypes."""
    b, p, c = q.shape
    row_tile = min(p, 256)
    assert p % row_tile == 0
    kern = functools.partial(_attend_bwd_kernel, temperature)
    dq, dkv = pl.pallas_call(
        kern,
        grid=(b, p // row_tile),
        in_specs=[
            pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, row_tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p, c), jnp.float32),
            jax.ShapeDtypeStruct((b, p, c), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 5 * p * p * c,
            bytes_accessed=b * 5 * p * c * 4,
            transcendentals=b * p * p,
        ),
        interpret=interpret,
    )(q, kv, g)
    return dq.astype(q.dtype), dkv.astype(kv.dtype)


def _reference(f1, f2, temperature):
    logits = jnp.einsum("bpc,bqc->bpq", f1, f2) * temperature
    w1 = jax.nn.softmax(logits, axis=2)
    w2 = jax.nn.softmax(logits, axis=1)
    o1 = jnp.einsum("bpq,bqc->bpc", w1, f2)
    o2 = jnp.einsum("bpq,bpc->bqc", w2, f1)
    return o1, o2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def coattention_fused(f1: jnp.ndarray, f2: jnp.ndarray, temperature: float,
                      interpret: bool = False):
    """f1, f2: (B, P, C). Returns (attended_for_f1, attended_for_f2) — the
    same contract as ops.coattention.coattention_pair on flattened patches."""
    o1 = _attend(f1, f2, temperature, interpret)
    o2 = _attend(f2, f1, temperature, interpret)
    return o1, o2


def _fwd(f1, f2, temperature, interpret):
    return coattention_fused(f1, f2, temperature, interpret), (f1, f2)


def _bwd(temperature, interpret, res, g):
    f1, f2 = res
    g1, g2 = g
    # o1 = attend(f1, f2), o2 = attend(f2, f1):
    # df1 = dq(dir 1) + dkv(dir 2); df2 = dkv(dir 1) + dq(dir 2)
    dq1, dkv1 = _attend_bwd(f1, f2, temperature, g1, interpret)
    dq2, dkv2 = _attend_bwd(f2, f1, temperature, g2, interpret)
    return dq1 + dkv2, dkv1 + dq2


coattention_fused.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def coattention_one(f1: jnp.ndarray, f2: jnp.ndarray, temperature: float,
                    interpret: bool = False):
    """Single-direction fused co-attention: attended-for-f1 only.

    The eval/serving trunk and the k>2 ring-pairing train path consume only
    direction 1 (test_DCNet_model.py:247-274 uses only the `input1` concat).
    A Pallas call is opaque to XLA dead-code elimination, so the pair kernel
    cannot have its unused second direction DCE'd the way the einsum
    composition does — this variant simply never launches it (co-attention
    is ~18 of the serving trunk's ~21 GFLOP/stream, half of it direction 2).
    """
    return _attend(f1, f2, temperature, interpret)


def _one_fwd(f1, f2, temperature, interpret):
    return coattention_one(f1, f2, temperature, interpret), (f1, f2)


def _one_bwd(temperature, interpret, res, g):
    f1, f2 = res
    return _attend_bwd(f1, f2, temperature, g, interpret)


coattention_one.defvjp(_one_fwd, _one_bwd)


def coattention_center_fused(
    center: jnp.ndarray, ref: jnp.ndarray, temperature: float = 10.0,
    max_vmem_p: int = 4096, interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.coattention.coattention_center on (B, H, W, C)
    inputs: direction-1 attended features only, fused when the kv block
    fits VMEM."""
    b, h, w, c = center.shape
    p = h * w
    if not HAS_PALLAS or p > max_vmem_p:
        from dcnet_tpu.ops.coattention import coattention_center
        return coattention_center(center, ref, temperature)
    o1 = coattention_one(
        center.reshape(b, p, c), ref.reshape(b, p, c), temperature, interpret)
    return o1.reshape(b, h, w, c)


def coattention_pair_fused(
    f1: jnp.ndarray, f2: jnp.ndarray, temperature: float = 10.0,
    max_vmem_p: int = 4096, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.coattention.coattention_pair on (B, H, W, C) inputs,
    dispatching to the fused kernel when the kv block fits VMEM."""
    b, h, w, c = f1.shape
    p = h * w
    if not HAS_PALLAS or p > max_vmem_p:
        from dcnet_tpu.ops.coattention import coattention_pair
        return coattention_pair(f1, f2, temperature)
    o1, o2 = coattention_fused(
        f1.reshape(b, p, c), f2.reshape(b, p, c), temperature, interpret)
    return o1.reshape(b, h, w, c), o2.reshape(b, h, w, c)
