"""Loss tests against torch transcriptions of the reference loss functions."""

import numpy as np
import jax
import jax.numpy as jnp

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.losses import infonce_loss, loc_loss, rank_loss, yolo_loss
from dcnet_tpu.ops.correspondence import ContrastiveSamples
from dcnet_tpu.ops.target import build_target

CFG = DCNetConfig(image_size=64)  # grids (2, 4, 8), 84 positions


def _random_outbox(rng, b, cfg):
    return [jnp.asarray(rng.randn(b, 3, 5, g, g).astype(np.float32))
            for g in cfg.grids]


def _random_bbox(rng, b, size):
    x1 = rng.rand(b) * size * 0.6
    y1 = rng.rand(b) * size * 0.6
    w = rng.rand(b) * size * 0.3 + 2
    h = rng.rand(b) * size * 0.3 + 2
    return np.stack([x1, y1, np.minimum(x1 + w, size - 1),
                     np.minimum(y1 + h, size - 1)], 1).astype(np.float32)


def test_yolo_loss_matches_torch_oracle():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    B = 8
    outbox = _random_outbox(rng, B, CFG)
    bbox = _random_bbox(rng, B, CFG.image_size)
    tgt = build_target(jnp.asarray(bbox), CFG)
    got = float(yolo_loss(outbox, tgt, CFG))

    # oracle: train_DCNet.py:45-72 with sparse targets
    pred = [torch.from_numpy(np.asarray(o)) for o in outbox]
    gt = [torch.zeros(B, 3, 5, g, g) for g in CFG.grids]
    for ii in range(B):
        s = int(tgt.best_scale[ii])
        a, gi, gj = int(tgt.anchor[ii]), int(tgt.gi[ii]), int(tgt.gj[ii])
        gt[s][ii, a, :4, gj, gi] = torch.from_numpy(np.asarray(tgt.txywh[ii]))
        gt[s][ii, a, 4, gj, gi] = 1.0
    pred_bbox = torch.zeros(B, 4)
    gt_bbox = torch.zeros(B, 4)
    for ii in range(B):
        n = int(tgt.best_n[ii])
        gi, gj = int(tgt.gi[ii]), int(tgt.gj[ii])
        pred_bbox[ii, 0:2] = torch.sigmoid(pred[n // 3][ii, n % 3, 0:2, gj, gi])
        pred_bbox[ii, 2:4] = pred[n // 3][ii, n % 3, 2:4, gj, gi]
        gt_bbox[ii] = gt[n // 3][ii, n % 3, :4, gj, gi]
    mse = torch.nn.MSELoss()
    loss = sum(mse(pred_bbox[:, i], gt_bbox[:, i]) for i in range(4)) * 5.0
    pred_conf = torch.cat([p[:, :, 4].reshape(B, -1) for p in pred], 1)
    gt_conf = torch.cat([g[:, :, 4].reshape(B, -1) for g in gt], 1)
    loss = loss + F.cross_entropy(pred_conf, gt_conf.max(1)[1])
    np.testing.assert_allclose(got, float(loss), rtol=1e-4)


def test_rank_loss_matches_oracle():
    rng = np.random.RandomState(1)
    B, P = 6, CFG.all_positions
    sim = rng.randn(B, P).astype(np.float32)
    neg = rng.randn(B, P).astype(np.float32)
    pos_idx = rng.randint(0, P, B).astype(np.int32)
    got = float(rank_loss(jnp.asarray(sim), jnp.asarray(neg),
                          jnp.asarray(pos_idx), margin=0.1))
    gt_conf = np.zeros((B, P), np.float32)
    gt_conf[np.arange(B), pos_idx] = 1
    pos_paired = (sim * gt_conf).sum(1)
    neg1 = (neg * gt_conf).sum(1)
    neg2 = (sim * gt_conf[::-1]).sum(1)
    ref = (np.clip(0.1 + neg1 - pos_paired, 0, None)
           + np.clip(0.1 + neg2 - pos_paired, 0, None)).sum() / (2 * B)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_loc_loss_is_ce():
    rng = np.random.RandomState(2)
    B, P = 4, 10
    loc = rng.randn(B, P).astype(np.float32)
    idx = rng.randint(0, P, B).astype(np.int32)
    got = float(loc_loss(jnp.asarray(loc), jnp.asarray(idx)))
    e = np.exp(loc - loc.max(1, keepdims=True))
    logp = np.log(e / e.sum(1, keepdims=True))
    np.testing.assert_allclose(got, -logp[np.arange(B), idx].mean(), rtol=1e-5)


def test_infonce_matches_reference_list_structure():
    """Oracle: the per-list loop of Interframe_contrastive_loss
    (train_DCNet.py:114-136) in torch."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    B, K, N, C = 4, 6, 5, 8
    q = rng.randn(B, K, C).astype(np.float32)
    k = rng.randn(B, K, 1, C).astype(np.float32)
    neg = rng.randn(B, K, N, C).astype(np.float32)
    got = float(infonce_loss(ContrastiveSamples(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(neg)), temperature=0.07))

    loss = 0.0
    for jj in range(K):  # reference's q_list index
        tq = F.normalize(torch.from_numpy(q[:, jj]), dim=1)
        tk = F.normalize(torch.from_numpy(k[:, jj, 0]), dim=1)
        tneg = torch.from_numpy(neg[:, jj]).permute(0, 2, 1)
        tneg = F.normalize(tneg, dim=1)
        l_pos = torch.einsum("nc,nc->n", tq, tk).unsqueeze(-1)
        l_neg = torch.einsum("nc,nck->nk", tq, tneg)
        logits = torch.cat([l_pos, l_neg], dim=1) / 0.07
        labels = torch.zeros(B, dtype=torch.long)
        loss = loss + F.cross_entropy(logits, labels)
    np.testing.assert_allclose(got, float(loss) / K, rtol=1e-4)


def test_infonce_multikey_matches_crossmodal_structure():
    """Oracle: Crossmodal_constrastive_loss inner key loop
    (train_DCNet.py:140-166)."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(4)
    B, K, P, N, C = 3, 4, 2, 5, 6
    q = rng.randn(B, K, C).astype(np.float32)
    k = rng.randn(B, K, P, C).astype(np.float32)
    neg = rng.randn(B, K, N, C).astype(np.float32)
    got = float(infonce_loss(ContrastiveSamples(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(neg)), temperature=0.07))

    loss = 0.0
    for jj in range(K):
        tq = F.normalize(torch.from_numpy(q[:, jj]), dim=1)
        tneg = F.normalize(torch.from_numpy(neg[:, jj]).permute(0, 2, 1), dim=1)
        l_neg = torch.einsum("nc,nck->nk", tq, tneg)
        tmp = 0.0
        for pp in range(P):
            tk = F.normalize(torch.from_numpy(k[:, jj, pp]), dim=1)
            l_pos = torch.einsum("nc,nc->n", tq, tk).unsqueeze(-1)
            logits = torch.cat([l_pos, l_neg], dim=1) / 0.07
            tmp = tmp + F.cross_entropy(logits, torch.zeros(B, dtype=torch.long))
        loss = loss + tmp / P
    np.testing.assert_allclose(got, float(loss) / K, rtol=1e-4)
