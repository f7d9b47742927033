"""Co-attention and correspondence-sampling tests against torch/numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from dcnet_tpu.ops.coattention import coattention_pair
from dcnet_tpu.ops.correspondence import crossmodal_pairs, interframe_pairs


def test_coattention_matches_torch():
    """Oracle: literal transcription of DCNet_model.py:440-459 in torch."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    B, H, W, C = 3, 4, 4, 6
    T = 10.0
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        a1, a2 = coattention_pair(jnp.asarray(f1), jnp.asarray(f2), T)

    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2))  # NCHW
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2))
    key = torch.transpose(t1.reshape(B, C, H * W), 1, 2).contiguous()
    value = t2.reshape(B, C, H * W).contiguous()
    co1 = torch.bmm(key, value)
    co2 = F.softmax(torch.transpose(co1, 1, 2) * T, dim=1)
    co1 = F.softmax(co1 * T, dim=1)
    in1_attn = torch.bmm(value, co2).reshape(B, C, H, W)
    in2_attn = torch.bmm(torch.transpose(key, 1, 2), co1).reshape(B, C, H, W)

    np.testing.assert_allclose(np.asarray(a1).transpose(0, 3, 1, 2),
                               in1_attn.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2).transpose(0, 3, 1, 2),
                               in2_attn.numpy(), rtol=1e-4, atol=1e-5)


def test_interframe_pairs_topk_and_negatives():
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 3, 3, 5
    P = H * W
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    K, N = 6, 4
    s = interframe_pairs(jnp.asarray(f1), jnp.asarray(f2), K, N,
                         jax.random.PRNGKey(0))
    assert s.q.shape == (B, K, C) and s.k.shape == (B, K, 1, C)
    assert s.neg.shape == (B, K, N, C)

    pf1 = f1.reshape(B, P, C)
    pf2 = f2.reshape(B, P, C)
    corr = np.einsum("bpc,bqc->bpq", pf1, pf2).reshape(B, P * P)
    for b in range(B):
        order = np.argsort(-corr[b])[:K]
        for j, idx in enumerate(order):
            np.testing.assert_allclose(np.asarray(s.q[b, j]), pf1[b, idx // P],
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(s.k[b, j, 0]), pf2[b, idx % P],
                                       rtol=1e-5)
            # negatives: valid patches of frame2, never the positive
            negs = np.asarray(s.neg[b, j])
            dists = np.abs(negs[:, None, :] - pf2[b][None]).sum(-1)
            matches = np.argmin(dists, axis=1)
            assert (dists[np.arange(N), matches] < 1e-5).all()
            assert (matches != idx % P).all()
            assert len(set(matches.tolist())) == N  # without replacement


def test_crossmodal_pairs_top1_word():
    rng = np.random.RandomState(2)
    B, L, P, C = 2, 5, 8, 4
    wp = rng.randn(B, L, P).astype(np.float32)
    lang = rng.randn(B, L, C).astype(np.float32)
    vit = rng.randn(B, P, C).astype(np.float32)
    s = crossmodal_pairs(jnp.asarray(wp), jnp.asarray(lang), jnp.asarray(vit),
                         top_k=1, neg_n=3, rng=jax.random.PRNGKey(1))
    assert s.q.shape == (B, P, C)
    assert s.k.shape == (B, P, 1, C)
    assert s.neg.shape == (B, P, 3, C)
    np.testing.assert_allclose(np.asarray(s.q), vit, rtol=1e-6)
    for b in range(B):
        for p in range(P):
            top_word = int(np.argmax(wp[b, :, p]))
            np.testing.assert_allclose(np.asarray(s.k[b, p, 0]),
                                       lang[b, top_word], rtol=1e-5)
            negs = np.asarray(s.neg[b, p])
            dists = np.abs(negs[:, None, :] - vit[b][None]).sum(-1)
            matches = np.argmin(dists, axis=1)
            assert (matches != p).all()


def test_coattention_center_batched_matches_loop():
    """coattention_center_batched row r == coattention_center(center, ref_r),
    and the int8-logits variant stays within the quantization error bound
    for l2-normalized inputs."""
    from dcnet_tpu.ops.coattention import (
        coattention_center, coattention_center_batched)
    rng = np.random.RandomState(2)
    B, R, H, W, C = 2, 4, 5, 5, 16
    T = 10.0

    def l2n(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    center = l2n(rng.randn(B, H, W, C)).astype(np.float32)
    refs = l2n(rng.randn(B, R, H, W, C)).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        batched = coattention_center_batched(
            jnp.asarray(center), jnp.asarray(refs), T)
        loop = [coattention_center(jnp.asarray(center),
                                   jnp.asarray(refs[:, r]), T)
                for r in range(R)]
        int8_b = coattention_center_batched(
            jnp.asarray(center), jnp.asarray(refs), T, int8_logits=True)
        int8_l = coattention_center(jnp.asarray(center),
                                    jnp.asarray(refs[:, 0]), T,
                                    int8_logits=True)

    for r in range(R):
        np.testing.assert_allclose(np.asarray(batched[:, r]),
                                   np.asarray(loop[r]),
                                   rtol=1e-5, atol=1e-6)
    # int8 logits: ~2/127*sqrt(C)*T absolute logit noise -> attended
    # features (convex combos of unit-norm rows) stay close
    np.testing.assert_allclose(np.asarray(int8_b[:, 0]),
                               np.asarray(int8_l), rtol=1e-5, atol=1e-6)
    err = np.max(np.abs(np.asarray(int8_b) - np.asarray(batched)))
    assert err < 0.05, f"int8-logit attention error too large: {err}"


def test_split_corr_conv_stacked_matches_list():
    """QuantConv2D split form with STACKED (B, R, H, W, C) parts matches the
    per-part list form (float and int8 modes), through ConvBNReLU."""
    from dcnet_tpu.models.heads import ConvBNReLU
    rng = np.random.RandomState(3)
    B, R, H, W, Cs, Cp, F = 2, 3, 4, 4, 6, 6, 8
    shared = rng.randn(B, H, W, Cs).astype(np.float32)
    parts = rng.randn(B, R, H, W, Cp).astype(np.float32)

    for quant in ("off", "int8"):
        mod = ConvBNReLU(F, kernel=1, leaky=True, relu=False, quant=quant)
        variables = mod.init(jax.random.PRNGKey(0),
                             np.concatenate([shared, parts[:, 0]], axis=-1))
        if quant == "int8":
            # calibrate act_max once on the concat input
            calib = ConvBNReLU(F, kernel=1, leaky=True, relu=False,
                               quant="calib")
            _, mut = calib.apply(
                variables, np.concatenate([shared, parts[:, 0]], axis=-1),
                mutable=["quant"])
            variables = {**variables, "quant": mut["quant"]}
        out_list = mod.apply(
            variables, (jnp.asarray(shared),
                        [jnp.asarray(parts[:, r]) for r in range(R)]))
        out_stacked = mod.apply(
            variables, (jnp.asarray(shared), jnp.asarray(parts)))
        assert out_stacked.shape == (B, R, H, W, F)
        for r in range(R):
            np.testing.assert_allclose(np.asarray(out_stacked[:, r]),
                                       np.asarray(out_list[r]),
                                       rtol=1e-5, atol=1e-6)
