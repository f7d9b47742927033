"""Fused dual-direction co-attention Pallas kernel.

The co-attention block (`/root/reference/model/DCNet_model.py:440-459`) is
DCNet's #2 hot loop (SURVEY.md §3): at the /8 scale the (h*w)x(h*w)
correlation is 1024x1024 per image, and the naive composition materializes
two softmaxed attention matrices in HBM (2 x 4 MB per image per direction)
between four matmuls.

This kernel computes, per batch element, entirely in VMEM:

    logits = f1 @ f2^T * T            (P, P) fp32 on the MXU
    out1   = softmax_rows(logits) @ f2
    out2   = softmax_cols(logits)^T @ f1

so HBM traffic is just the feature reads/writes (bandwidth-bound win of
~3x at the finest scale). Backward falls back to the einsum composition
via recompute (custom_vjp), so training uses it too.

Guard rails: used when P*P logits fit VMEM (P <= 1024); otherwise the
einsum path in ops/coattention.py is used.
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


def _kernel(t, f1_ref, f2_ref, o1_ref, o2_ref):
    f1 = f1_ref[0]  # (P, C)
    f2 = f2_ref[0]
    logits = jax.lax.dot_general(
        f1, f2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * t          # (P, P)
    w1 = jax.nn.softmax(logits, axis=1)
    w2 = jax.nn.softmax(logits, axis=0)
    o1 = jnp.dot(w1.astype(f2.dtype), f2, preferred_element_type=jnp.float32)
    o2 = jax.lax.dot_general(
        w2.astype(f1.dtype), f1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o1_ref[0] = o1.astype(o1_ref.dtype)
    o2_ref[0] = o2.astype(o2_ref.dtype)


def _pallas_coattention(f1: jnp.ndarray, f2: jnp.ndarray, temperature: float,
                        interpret: bool = False):
    b, p, c = f1.shape
    kern = functools.partial(_kernel, temperature)
    block = pl.BlockSpec((1, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[block, block],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct((b, p, c), f1.dtype),
                   jax.ShapeDtypeStruct((b, p, c), f1.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (3 * p * p * c),
            bytes_accessed=b * (4 * p * c) * f1.dtype.itemsize,
            transcendentals=2 * b * p * p,
        ),
        interpret=interpret,
    )(f1, f2)


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
    """f1, f2: (B, P, C). Returns (attended_for_f1 (B, P, C),
    attended_for_f2 (B, P, C)) — same contract as
    ops.coattention.coattention_pair on flattened patches."""
    return _pallas_coattention(f1, f2, temperature, interpret)


def _fwd(f1, f2, temperature, interpret):
    return coattention_fused(f1, f2, temperature, interpret), (f1, f2)


def _bwd(temperature, interpret, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: _reference(a, b, temperature), f1, f2)
    return vjp(g)


coattention_fused.defvjp(_fwd, _bwd)


def coattention_pair_fused(
    f1: jnp.ndarray, f2: jnp.ndarray, temperature: float = 10.0,
    max_vmem_p: int = 1024, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.coattention.coattention_pair on (B, H, W, C) inputs,
    dispatching to the fused kernel when the logits tile fits VMEM."""
    b, h, w, c = f1.shape
    p = h * w
    if not HAS_PALLAS or p > max_vmem_p:
        from dcnet_tpu.ops.coattention import coattention_pair
        return coattention_pair(f1, f2, temperature)
    o1, o2 = coattention_fused(
        f1.reshape(b, p, c), f2.reshape(b, p, c), temperature, interpret)
    return o1.reshape(b, h, w, c), o2.reshape(b, h, w, c)
