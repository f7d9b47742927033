"""Fused co-attention kernel: interpreter-mode parity with the einsum path
(forward + gradients)."""

import numpy as np
import jax
import jax.numpy as jnp

from dcnet_tpu.ops.coattention import coattention_pair
from dcnet_tpu.ops.pallas.coattn import coattention_fused, _reference


def test_fused_matches_einsum_forward():
    rng = np.random.RandomState(0)
    B, P, C = 2, 16, 8
    f1 = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    o1, o2 = coattention_fused(f1, f2, 10.0, True)  # interpret mode
    r1, r2 = _reference(f1, f2, 10.0)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(r1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(r2), rtol=1e-4,
                               atol=1e-5)
    # and the reference here matches the model's coattention_pair
    p1, p2 = coattention_pair(f1.reshape(B, 4, 4, C), f2.reshape(B, 4, 4, C),
                              10.0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(p1).reshape(B, P, C),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(p2).reshape(B, P, C),
                               rtol=1e-4, atol=1e-5)


def test_fused_gradients_match():
    rng = np.random.RandomState(1)
    B, P, C = 1, 8, 4
    f1 = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, P, C).astype(np.float32))

    def loss_fused(a, b):
        o1, o2 = coattention_fused(a, b, 5.0, True)
        return jnp.sum(o1 ** 2) + jnp.sum(o2 * o1)

    def loss_ref(a, b):
        o1, o2 = _reference(a, b, 5.0)
        return jnp.sum(o1 ** 2) + jnp.sum(o2 * o1)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(f1, f2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fused_gradients_multi_tile_accumulation():
    """P > row_tile (256): the backward kernel's dkv accumulation across
    row tiles must match the einsum VJP."""
    rng = np.random.RandomState(2)
    B, P, C = 1, 512, 8
    f1 = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 0.2)
    f2 = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 0.2)
    g1 = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    g2 = jnp.asarray(rng.randn(B, P, C).astype(np.float32))

    _, vjp_fused = jax.vjp(
        lambda a, b: coattention_fused(a, b, 10.0, True), f1, f2)
    _, vjp_ref = jax.vjp(lambda a, b: _reference(a, b, 10.0), f1, f2)
    got = vjp_fused((g1, g2))
    want = vjp_ref((g1, g2))
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_center_only_matches_pair_direction1():
    """coattention_one / coattention_center_fused == direction 1 of the
    pair kernel (the eval/serving trunk consumes only that direction)."""
    from dcnet_tpu.ops.pallas.coattn import (coattention_center_fused,
                                             coattention_one)

    rng = np.random.RandomState(3)
    B, P, C = 2, 16, 8
    f1 = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 0.3)
    f2 = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 0.3)
    want, _ = _reference(f1, f2, 10.0)
    got = coattention_one(f1, f2, 10.0, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # NHWC wrapper vs the einsum center path
    from dcnet_tpu.ops.coattention import coattention_center
    x1 = f1.reshape(B, 4, 4, C)
    x2 = f2.reshape(B, 4, 4, C)
    np.testing.assert_allclose(
        np.asarray(coattention_center_fused(x1, x2, 10.0, interpret=True)),
        np.asarray(coattention_center(x1, x2, 10.0)),
        rtol=1e-5, atol=1e-6)


def test_ring_multiref_matches_per_ref_loop():
    """coattention_ring (one kernel, all references off the ring) ==
    coattention_center per reference, for every rotating-slot value."""
    from dcnet_tpu.ops.coattention import coattention_center
    from dcnet_tpu.ops.pallas.coattn import coattention_ring

    rng = np.random.RandomState(5)
    B, S, H, W, C = 2, 5, 4, 4, 8
    ring = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32) * 0.3)
    center_t = S // 2
    for slot in [None, 0, 2, 4]:
        got = coattention_ring(ring, 10.0, center_t, newest_slot=slot,
                               interpret=True)
        assert got.shape == (B, S - 1, H, W, C)
        eff_slot = S - 1 if slot is None else slot

        def frame(j):
            return ring[:, (eff_slot + 1 + j) % S]

        refs = [j for j in range(S) if j != center_t]
        for r, j in enumerate(refs):
            want = coattention_center(frame(center_t), frame(j), 10.0)
            np.testing.assert_allclose(
                np.asarray(got[:, r]), np.asarray(want),
                rtol=1e-4, atol=1e-5, err_msg=f"slot={slot} ref={r}")


def test_ring_multiref_int8_close_to_float():
    """int8 rings through the kernel: logits on the int8 path, output
    within the quantization-noise bound of the float composition on
    l2-normalized features."""
    from dcnet_tpu.ops.pallas.coattn import (coattention_ring,
                                             coattention_ring_fused)

    rng = np.random.RandomState(6)
    B, S, H, W, C = 1, 5, 4, 4, 16
    feats = rng.randn(B, S, H, W, C).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)  # l2-normalized
    ring_f = jnp.asarray(feats)
    ring_q = jnp.asarray(
        np.clip(np.round(feats * 127.0), -127, 127).astype(np.int8))
    want = coattention_ring(ring_f, 10.0, S // 2, interpret=True)
    got = coattention_ring(ring_q, 10.0, S // 2, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.15, atol=0.05)
    # the dispatch wrapper's einsum fallback dequantizes to the same values
    fb = coattention_ring_fused(ring_q, 10.0, compute_dtype=jnp.float32,
                                max_vmem_p=0)  # force the fallback
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(fb, np.float32),
                               rtol=0.1, atol=0.03)


def test_ring_multiref_multi_tile():
    """P > row_tile (256): the center row tiles stream while the ref block
    stays resident — outputs must still match the composition."""
    from dcnet_tpu.ops.coattention import coattention_center
    from dcnet_tpu.ops.pallas.coattn import coattention_ring

    rng = np.random.RandomState(7)
    B, S, H, W, C = 1, 3, 32, 16, 8  # P = 512 = 2 row tiles
    ring = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32) * 0.2)
    got = coattention_ring(ring, 10.0, 1, newest_slot=None, interpret=True)
    for r, j in enumerate([0, 2]):
        want = coattention_center(ring[:, 1], ring[:, j], 10.0)
        np.testing.assert_allclose(np.asarray(got[:, r]), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_center_only_gradients_match():
    """The single-direction custom_vjp (used by the k>2 ring-pairing TRAIN
    path) must match the einsum VJP of direction 1, including dkv
    accumulation across row tiles (P > 256)."""
    from dcnet_tpu.ops.pallas.coattn import coattention_one

    rng = np.random.RandomState(4)
    B, P, C = 1, 512, 8
    f1 = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 0.2)
    f2 = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 0.2)

    def loss_one(a, b):
        o = coattention_one(a, b, 10.0, True)
        return jnp.sum(o ** 2) + jnp.sum(o * a)

    def loss_ref(a, b):
        o, _ = _reference(a, b, 10.0)
        return jnp.sum(o ** 2) + jnp.sum(o * a)

    g1 = jax.grad(loss_one, argnums=(0, 1))(f1, f2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
