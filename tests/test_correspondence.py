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
