"""Fused location-Gram kernel parity (interpreter mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from dcnet_tpu.ops.pallas.locgram import fold_dense_bn, fused_loc_gram


def test_fused_loc_gram_matches_einsum():
    rng = np.random.RandomState(0)
    B, P, E, C = 2, 84, 8, 16   # P = all_positions at image 64
    ce = rng.randn(B, P, E).astype(np.float32)
    ce = ce / np.linalg.norm(ce, axis=2, keepdims=True)
    obj = rng.randn(B, P).astype(np.float32)
    w = rng.randn(P, C).astype(np.float32) * 0.1
    b = rng.randn(C).astype(np.float32)

    got = fused_loc_gram(jnp.asarray(ce), jnp.asarray(obj), jnp.asarray(w),
                         jnp.asarray(b), interpret=True)
    gram = np.einsum("bpc,bqc->bpq", ce, ce) * obj[:, None, :]
    ref = np.maximum(np.einsum("bpq,qc->bpc", gram, w) + b, 0.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_fused_loc_gram_production_shape_tiled():
    """P=1344 (image 256): the row-tiled path (row_tile=336, 4 grid steps)
    must agree with the einsum composition at the production shape."""
    rng = np.random.RandomState(2)
    B, P, E, C = 1, 1344, 8, 512
    ce = rng.randn(B, P, E).astype(np.float32)
    ce = ce / np.linalg.norm(ce, axis=2, keepdims=True)
    obj = rng.randn(B, P).astype(np.float32)
    w = rng.randn(P, C).astype(np.float32) * 0.05
    b = rng.randn(C).astype(np.float32)

    got = fused_loc_gram(jnp.asarray(ce), jnp.asarray(obj), jnp.asarray(w),
                         jnp.asarray(b), interpret=True)
    gram = np.einsum("bpc,bqc->bpq", ce, ce) * obj[:, None, :]
    ref = np.maximum(np.einsum("bpq,qc->bpc", gram, w) + b, 0.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_fold_dense_bn():
    rng = np.random.RandomState(1)
    P, C = 10, 6
    params = {"fc": {"kernel": rng.randn(P, C).astype(np.float32),
                     "bias": rng.randn(C).astype(np.float32)},
              "bn": {"scale": rng.rand(C).astype(np.float32) + 0.5,
                     "bias": rng.randn(C).astype(np.float32)}}
    stats = {"bn": {"mean": rng.randn(C).astype(np.float32),
                    "var": rng.rand(C).astype(np.float32) + 0.1}}
    w, b = fold_dense_bn(params, stats)
    x = rng.randn(4, P).astype(np.float32)
    y_fold = x @ np.asarray(w) + np.asarray(b)
    lin = x @ params["fc"]["kernel"] + params["fc"]["bias"]
    y_ref = ((lin - stats["bn"]["mean"])
             / np.sqrt(stats["bn"]["var"] + 1e-5)) * params["bn"]["scale"] \
        + params["bn"]["bias"]
    np.testing.assert_allclose(y_fold, y_ref, rtol=1e-4, atol=1e-5)
