"""Torch mirror of the reference TRAINING step — the measured baseline for
BASELINE config 2 (`bench.py --train_mirror`).

Extends the eval-only `_RefModel` mirror (tests/test_reference_bridge.py)
with the reference's training forward and drives it through the full
fwd + 5-loss + backward + RMSprop update, so the train config's
`vs_baseline` is a measurement on this host with the same weights — the
train analog of `--single` / `--video_mirror`.

Mirrored semantics (structure and cost, not a byte-copy):
  - training forward (11 outputs): /root/reference/model/DCNet_model.py:340-651
    including the per-sample Python top-k/negative-sampling loops the
    reference runs on every batch (:394-430) and the cross-modal
    correspondence row loops (:41-112) — they are part of the reference's
    measured step cost
  - build_target: /root/reference/train_DCNet.py:265-332 (per-sample loop)
  - losses: yolo/rank/loc/2xInfoNCE, /root/reference/train_DCNet.py:45-220
  - loss sum + RMSprop(param groups, visu lr/10) + backward:
    /root/reference/train_DCNet.py:527-534,630-646
"""

from __future__ import annotations

import random

import numpy as np
import torch
import torch.nn.functional as F

from dcnet_tpu.config import DCNetConfig
from tests.test_full_parity import _coord_map


# --------------------------------------------------------------------------
# target builder (train_DCNet.py:265-332, CPU tensors)
# --------------------------------------------------------------------------

def ref_build_target(bbox: torch.Tensor, cfg: DCNetConfig):
    """Per-sample anchor matching; returns (gt_list, gi, gj, best_n_list,
    gt_center_list) exactly as the reference's build_target."""
    size = cfg.image_size
    n_scales = len(cfg.grids)
    b = bbox.shape[0]
    coord_list, gt_list, gt_center_list = [], [], []
    for s in range(n_scales):
        grid = cfg.grids[s]
        coord = torch.zeros(b, 4)
        coord[:, 0] = (bbox[:, 0] + bbox[:, 2]) / (2 * size)
        coord[:, 1] = (bbox[:, 1] + bbox[:, 3]) / (2 * size)
        coord[:, 2] = (bbox[:, 2] - bbox[:, 0]) / size
        coord[:, 3] = (bbox[:, 3] - bbox[:, 1]) / size
        coord_list.append(coord * grid)
        gt_list.append(torch.zeros(b, 3, 5, grid, grid))
        gt_center_list.append(torch.zeros(b, 5, grid, grid))

    best_n_list, best_gi, best_gj = [], [], []
    for ii in range(b):
        anch_ious = []
        for s in range(n_scales):
            gw = float(coord_list[s][ii, 2])
            gh = float(coord_list[s][ii, 3])
            for aw, ah in cfg.scaled_anchors(s):
                inter = min(gw, aw) * min(gh, ah)
                union = gw * gh + aw * ah - inter
                anch_ious.append(inter / max(union, 1e-12))
        best_n = int(np.argmax(anch_ious))
        s = best_n // 3
        gi = int(coord_list[s][ii, 0])
        gj = int(coord_list[s][ii, 1])
        tx = coord_list[s][ii, 0] - gi
        ty = coord_list[s][ii, 1] - gj
        aw, ah = cfg.scaled_anchors(s)[best_n % 3]
        tw = torch.log(coord_list[s][ii, 2] / aw + 1e-16)
        th = torch.log(coord_list[s][ii, 3] / ah + 1e-16)
        t = torch.stack([tx, ty, tw, th, torch.ones(())])
        gt_list[s][ii, best_n % 3, :, gj, gi] = t
        gt_center_list[s][ii, :, gj, gi] = t
        best_n_list.append(best_n)
        best_gi.append(gi)
        best_gj.append(gj)
    return gt_list, best_gi, best_gj, best_n_list, gt_center_list


# --------------------------------------------------------------------------
# losses (train_DCNet.py:45-220)
# --------------------------------------------------------------------------

def ref_yolo_loss(pred, target, gi, gj, best_n_list, w_coord=5.0):
    b = pred[0].shape[0]
    pred_bbox = torch.zeros(b, 4)
    gt_bbox = torch.zeros(b, 4)
    for ii in range(b):
        n = best_n_list[ii]
        pred_bbox[ii, 0:2] = torch.sigmoid(
            pred[n // 3][ii, n % 3, 0:2, gj[ii], gi[ii]])
        pred_bbox[ii, 2:4] = pred[n // 3][ii, n % 3, 2:4, gj[ii], gi[ii]]
        gt_bbox[ii] = target[n // 3][ii, n % 3, :4, gj[ii], gi[ii]]
    mse = torch.nn.MSELoss()
    loss = sum(mse(pred_bbox[:, i], gt_bbox[:, i]) for i in range(4)) * w_coord
    pred_conf = torch.cat([p[:, :, 4].reshape(b, -1) for p in pred], 1)
    gt_conf = torch.cat([g[:, :, 4].reshape(b, -1) for g in target], 1)
    return loss + F.cross_entropy(pred_conf, gt_conf.max(1)[1])


def ref_rank_loss(sim_score, neg_sim_score, gt_center, margin=0.1):
    b = sim_score[0].shape[0]
    pos = torch.cat([s.reshape(b, -1) for s in sim_score], 1)
    neg = torch.cat([s.reshape(b, -1) for s in neg_sim_score], 1)
    gt = torch.cat([t[:, 4].reshape(b, -1) for t in gt_center], 1)
    pos_paired = (pos * gt).sum(-1)
    neg1 = (neg * gt).sum(-1)
    neg2 = (pos * gt.flip(0)).sum(-1)
    loss = (torch.clamp(margin + neg1 - pos_paired, 0)
            + torch.clamp(margin + neg2 - pos_paired, 0))
    return loss.sum() / (b * 2)


def ref_loc_loss(loc_score, gt_center):
    b = loc_score[0].shape[0]
    loc = torch.cat([s.reshape(b, -1) for s in loc_score], 1)
    gt = torch.cat([t[:, 4].reshape(b, -1) for t in gt_center], 1)
    return F.cross_entropy(loc, gt.max(1)[1])


def ref_infonce(q_list, k_list, neg_list, T=0.07):
    """Interframe_contrastive_loss (train_DCNet.py:114-136): per-list loop."""
    loss = 0.0
    for q, k, neg in zip(q_list, k_list, neg_list):
        q = F.normalize(q, dim=1)
        k = F.normalize(k, dim=1)
        neg = F.normalize(neg.permute(0, 2, 1), dim=1)
        l_pos = torch.einsum("nc,nc->n", q, k).unsqueeze(-1)
        l_neg = torch.einsum("nc,nck->nk", q, neg)
        logits = torch.cat([l_pos, l_neg], 1) / T
        loss = loss + F.cross_entropy(
            logits, torch.zeros(logits.shape[0], dtype=torch.long))
    return loss / len(q_list)


def ref_infonce_multikey(q_list, k_list, neg_list, T=0.07):
    """Crossmodal_constrastive_loss (train_DCNet.py:140-166): inner key loop."""
    loss = 0.0
    for q, k, neg in zip(q_list, k_list, neg_list):
        q = F.normalize(q, dim=1)
        neg = F.normalize(neg.permute(0, 2, 1), dim=1)
        l_neg = torch.einsum("nc,nck->nk", q, neg)
        tmp = 0.0
        for jj in range(k.shape[1]):
            tk = F.normalize(k[:, jj], dim=1)
            l_pos = torch.einsum("nc,nc->n", q, tk).unsqueeze(-1)
            logits = torch.cat([l_pos, l_neg], 1) / T
            tmp = tmp + F.cross_entropy(
                logits, torch.zeros(logits.shape[0], dtype=torch.long))
        loss = loss + tmp / k.shape[1]
    return loss / len(q_list)


# --------------------------------------------------------------------------
# training forward (DCNet_model.py:340-651, k=2 pairs)
# --------------------------------------------------------------------------

def _interframe_samples(f1, f2, top_k, neg_n):
    """Top-k correspondence + random-negative sampling on the coarsest
    scale (DCNet_model.py:381-431) — the reference's per-sample Python
    loops, part of its measured step cost."""
    patch = f1.shape[2]
    p1 = f1.flatten(-2)
    p2 = f2.flatten(-2)
    cmap = torch.bmm(p1.permute(0, 2, 1), p2).flatten(-2)
    qs = [[] for _ in range(top_k)]
    ks = [[] for _ in range(top_k)]
    ns = [[] for _ in range(top_k)]
    for ii in range(f1.shape[0]):
        _, index = cmap[ii].topk(top_k, dim=0, largest=True, sorted=True)
        for jj in range(top_k):
            qs[jj].append(p1[ii][:, index[jj] // (patch * patch)])
            ks[jj].append(p2[ii][:, index[jj] % (patch * patch)])
            cand = list(range(patch * patch))
            cand.remove(int(index[jj]) % (patch * patch))
            sel = random.sample(cand, neg_n)
            ns[jj].append(torch.stack([p2[ii][:, kk] for kk in sel]))
    return ([torch.stack(x) for x in qs], [torch.stack(x) for x in ks],
            [torch.stack(x) for x in ns])


def _crossmodal_samples(lag, vit, lag_vit_map, top_k, neg_n):
    """Crossmodal_corrspondence (DCNet_model.py:41-112) row loops,
    including the reference's per-batch-index negative re-sampling where
    only the final index's sample survives (:81-94) — mirrored because the
    wasted sampling is part of the measured cost."""
    m = lag_vit_map.permute(0, 2, 1)
    vit_t = vit.permute(0, 2, 1)
    lag_t = lag.permute(0, 2, 1)
    batch, rows = vit_t.shape[0], vit_t.shape[1]
    _, cols = m.topk(top_k, dim=2, largest=True, sorted=True)
    qs = [[] for _ in range(rows)]
    ks = [[] for _ in range(rows)]
    ns = [[] for _ in range(rows)]
    for ii in range(batch):
        for jj in range(rows):
            qs[jj].append(vit_t[ii][jj])
            ks[jj].append(torch.stack(
                [lag_t[ii][:, cols[ii][jj][kk]] for kk in range(top_k)]))
            temp_nn = []
            for index in range(batch):
                cand = list(range(rows))
                if index == ii:
                    cand.remove(jj)
                sel = random.sample(cand, neg_n)
                temp_nn = [vit_t[index][kk] for kk in sel]
            ns[jj].append(torch.stack(temp_nn))
    return ([torch.stack(x) for x in qs], [torch.stack(x) for x in ks],
            [torch.stack(x) for x in ns])


def train_forward(m, images, ids, temperature=10.0):
    """The 11-output training forward over the _RefModel module graph
    (DCNet_model.py:340-647; returns the same tuple as its training
    branch)."""
    cfg = m.cfg
    B = images.shape[0]
    fvisu = m.visual_features(images)
    pairs = [f.reshape(B // 2, 2, *f.shape[1:]) for f in fvisu]
    input1 = [p[:, 0] for p in pairs]
    input2 = [p[:, 1] for p in pairs]

    frame_feature, corr_feature, neg_feature = _interframe_samples(
        input1[0], input2[0], cfg.interframe_top_k, cfg.interframe_neg_n)

    # bidirectional co-attention per scale (DCNet_model.py:440-469)
    corr_feat = []
    for i in range(3):
        b, c, h, w = input1[i].shape
        key = input1[i].reshape(b, c, h * w).permute(0, 2, 1)
        value = input2[i].reshape(b, c, h * w)
        a1 = torch.bmm(key, value)
        a2 = F.softmax(a1.permute(0, 2, 1) * temperature, dim=1)
        a1 = F.softmax(a1 * temperature, dim=1)
        attn1 = torch.bmm(value, a2).reshape(b, c, h, w)
        attn2 = torch.bmm(key.permute(0, 2, 1), a1).reshape(b, c, h, w)
        x1 = torch.cat([input1[i], attn1], 1).unsqueeze(1)
        x2 = torch.cat([input2[i], attn2], 1).unsqueeze(1)
        cf = torch.cat([x1, x2], 1).reshape(B, 2 * c, h, w)
        corr_feat.append(F.normalize(m.corr_conv[i](cf), p=2, dim=1))

    sent, context, embedded = m.textmodel(ids)
    flang = F.normalize(m.mapping_lang(sent), p=2, dim=1)

    outbox, coord_list = [], []
    for i in range(3):
        h, w = corr_feat[i].shape[-2:]
        coord = _coord_map(h, w)[None].expand(B, -1, -1, -1)
        coord_list.append(coord)
        tile = flang[:, :, None, None].expand(B, flang.shape[1], h, w)
        x = m.fcn_emb[i](torch.cat([corr_feat[i], tile, coord], 1))
        outbox.append(m.fcn_out[i](x).reshape(B, 3, 5, h, w))

    _, flang_attn = m.sub_attn(context, embedded, ids)
    flang_attn = F.normalize(flang_attn, p=2, dim=1)[:, :, None, None]
    sim_score = [(flang_attn * cf).sum(1) for cf in corr_feat]

    # location branch (DCNet_model.py:541-621)
    obj_score = [ob[:, :, 4].mean(1) * ss for ob, ss in zip(outbox, sim_score)]
    _, flang_loc = m.loc_attn(context, embedded, ids)
    flang_loc = F.normalize(flang_loc, p=2, dim=1)
    coord_flat = torch.cat([c.reshape(B, 8, -1).permute(0, 2, 1)
                            for c in coord_list], 1)
    obj_map = F.normalize(
        torch.cat([o.reshape(B, -1) for o in obj_score], 1), p=2, dim=1)
    ce = m.loc_embedding(coord_flat.reshape(-1, 8))
    ce = F.normalize(ce.reshape(B, -1, 8), p=2, dim=2)
    gram = torch.bmm(ce, ce.permute(0, 2, 1)) * obj_map[:, None, :]
    rel = m.loc_text_embedding(gram.reshape(-1, cfg.all_positions))
    rel = F.normalize(rel.reshape(B, cfg.all_positions, -1), p=2, dim=2)
    loc_map = torch.einsum("bpc,bc->bp", rel, flang_loc)
    lo = loc_map.min(1, keepdim=True)[0]
    hi = loc_map.max(1, keepdim=True)[0]
    loc_map = (loc_map - lo) / (hi - lo + 1e-6)

    loc_score, final, s0 = [], [], 0
    for ob, ss in zip(outbox, sim_score):
        h, w = ob.shape[-2:]
        ls = loc_map[:, s0:s0 + h * w].reshape(B, h, w)
        s0 += h * w
        loc_score.append(ls)
        ob = ob.clone()
        ob[:, :, 4] = ob[:, :, 4].clone() * (ss * ls)[:, None]
        final.append(ob)

    # cross-modal correspondence on the coarsest scale (:624-637)
    vit = F.normalize(fvisu[0].flatten(-2), dim=2)
    lag = F.normalize(F.interpolate(context, scale_factor=0.5), dim=1)
    lag_vit_map = m.feature_map(torch.bmm(lag, vit))
    vit_posit, lag_posit, neg_cross = _crossmodal_samples(
        lag, vit, lag_vit_map, 1, cfg.crossmodal_neg_n)

    return (final, sim_score, loc_score, corr_feat, flang_attn,
            frame_feature, corr_feature, neg_feature,
            vit_posit, lag_posit, neg_cross)


# --------------------------------------------------------------------------
# the full reference train step
# --------------------------------------------------------------------------

def make_ref_optimizer(model, lr, weight_decay=0.0005):
    """RMSprop with the reference's two param groups (visu at lr/10,
    train_DCNet.py:527-534)."""
    visu = list(model.visumodel.parameters())
    visu_ids = {id(p) for p in visu}
    rest = [p for p in model.parameters() if id(p) not in visu_ids]
    return torch.optim.RMSprop(
        [{"params": rest}, {"params": visu, "lr": lr / 10.0}],
        lr=lr, weight_decay=weight_decay)


def ref_train_step(model, optimizer, images, ids, bbox, cfg: DCNetConfig):
    """One reference training step: forward (11 outputs), target build,
    5-loss sum (train_DCNet.py:631-642), backward, RMSprop update."""
    (outbox, sim_score, loc_score, corr_feat, flang_attn,
     frame_f, corr_f, neg_f, vit_p, lag_p, neg_c) = train_forward(
        model, images, ids)
    bbox = torch.clamp(bbox, 0, cfg.image_size - 1)
    gt, gi, gj, best_n, gt_center = ref_build_target(bbox, cfg)

    neg_sim_score = []
    for cf in corr_feat:
        score = (flang_attn.flip(0) * cf).sum(1)
        neg_sim_score.append(score)

    loss = (ref_yolo_loss(outbox, gt, gi, gj, best_n)
            + 100 * ref_rank_loss(sim_score, neg_sim_score, gt_center)
            + ref_loc_loss(loc_score, gt_center)
            + 100 * ref_infonce(frame_f, corr_f, neg_f)
            + ref_infonce_multikey(vit_p, lag_p, neg_c))
    optimizer.zero_grad()
    loss.backward()
    optimizer.step()
    return float(loss.detach())
