"""Whole-model composition oracle.

Component tests verify each block; this verifies the COMPOSITION: an
independent torch/numpy mirror of the reference's eval dataflow
(backbone -> mapping -> [co-attention+corr] -> language -> fusion ->
subject/location attention -> confidence modulation), fed with the flax
model's own weights, must reproduce our outputs. Covers the
semantic-attention baseline path and the n-frame correspondence path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import mini_backbone_defs
from dcnet_tpu.models.dcnet import DCNet as DCNetCls
from tests.test_darknet import _torch_forward

CFG = DCNetConfig(image_size=64, corpus_size=50,
                  interframe_top_k=4, interframe_neg_n=3, crossmodal_neg_n=3)
GRIDS = CFG.grids


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _conv_bn_eval(x, p, bs):
    """ConvBNReLU in eval mode. x: torch NCHW."""
    w = _t(p["conv"]["kernel"]).permute(3, 2, 0, 1)
    k = w.shape[-1]
    x = F.conv2d(x, w, padding=(k - 1) // 2)
    x = F.batch_norm(x, _t(bs["bn"]["mean"]), _t(bs["bn"]["var"]),
                     _t(p["bn"]["scale"]), _t(p["bn"]["bias"]), False, 0.0, 1e-5)
    return F.relu(x)


def _dense_bn_eval(x, p, bs):
    x = F.linear(x, _t(p["fc"]["kernel"]).T, _t(p["fc"]["bias"]))
    x = F.batch_norm(x, _t(bs["bn"]["mean"]), _t(bs["bn"]["var"]),
                     _t(p["bn"]["scale"]), _t(p["bn"]["bias"]), False, 0.0, 1e-5)
    return F.relu(x)


def _norm(x, dim):
    return F.normalize(x, p=2, dim=dim)


def _lstm_oracle(params, word_ids):
    """Torch RNNEncoder mirror using our converted weights."""
    ids = torch.from_numpy(np.asarray(word_ids, np.int64))
    lengths = (ids != 0).sum(1).clamp(min=1)
    emb = F.embedding(ids, _t(params["embedding"]["embedding"]))
    emb = F.relu(F.linear(emb, _t(params["mlp"]["kernel"]).T,
                          _t(params["mlp"]["bias"])))
    rnn = torch.nn.LSTM(emb.shape[-1], params["fwd_w_hh"].shape[0], 1,
                        batch_first=True, bidirectional=True)
    sd = {
        "weight_ih_l0": _t(params["fwd_w_ih"]).T,
        "weight_hh_l0": _t(params["fwd_w_hh"]).T,
        "bias_ih_l0": _t(params["fwd_b_ih"]),
        "bias_hh_l0": _t(params["fwd_b_hh"]),
        "weight_ih_l0_reverse": _t(params["bwd_w_ih"]).T,
        "weight_hh_l0_reverse": _t(params["bwd_w_hh"]).T,
        "bias_ih_l0_reverse": _t(params["bwd_b_ih"]),
        "bias_hh_l0_reverse": _t(params["bwd_b_hh"]),
    }
    rnn.load_state_dict(sd)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        emb, lengths.tolist(), batch_first=True, enforce_sorted=False)
    out, _ = rnn(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=ids.shape[1])
    sent = torch.stack([out[i, int(lengths[i]) - 1] for i in range(len(ids))])
    return sent, out, emb


def _phrase_attn(p, context, embedded, ids):
    scores = F.linear(context, _t(p["fc"]["kernel"]).T,
                      _t(p["fc"]["bias"]))[..., 0]
    attn = F.softmax(scores, dim=-1)
    attn = attn * (ids != 0).float()
    attn = attn / (attn.sum(1, keepdim=True) + 1e-12)
    return torch.einsum("bl,ble->be", attn, embedded)


def _coord_map(h, w):
    rows = torch.arange(h).float()[:, None].expand(h, w)
    cols = torch.arange(w).float()[None, :].expand(h, w)
    r_min = (rows * 2 - w) / w
    c_min = (cols * 2 - h) / h
    r_max = ((rows + 1) * 2 - w) / w
    c_max = ((cols + 1) * 2 - h) / h
    return torch.stack([r_min, c_min, r_max, c_max, (r_min + r_max) / 2,
                        (c_min + c_max) / 2, torch.full((h, w), 1.0 / h),
                        torch.full((h, w), 1.0 / w)], 0)


def _oracle_trunk(params, stats, corr_feat, word_ids, ids_np):
    """Mirror of DCNet._trunk in torch (eval mode). corr_feat: list of
    torch (B, C, h, w) channel-L2-normalized fused features."""
    b = corr_feat[0].shape[0]
    sent, context, embedded = _lstm_oracle(params["textmodel"], ids_np)
    flang = _dense_bn_eval(sent, params["mapping_lang"]["l0"],
                           stats["mapping_lang"]["l0"])
    flang = _dense_bn_eval(flang, params["mapping_lang"]["l1"],
                           stats["mapping_lang"]["l1"])
    flang = _norm(flang, 1)

    coord_list = [_coord_map(g, g)[None].expand(b, -1, -1, -1) for g in GRIDS]
    outbox = []
    for i, f in enumerate(corr_feat):
        g = f.shape[-1]
        tile = flang[:, :, None, None].expand(b, flang.shape[1], g, g)
        fused = torch.cat([f, tile, coord_list[i]], 1)
        p = params[f"fcn_{i}"]
        s = stats[f"fcn_{i}"]
        x = _conv_bn_eval(fused, p["emb0"], s["emb0"])
        x = _conv_bn_eval(x, p["emb1"], s["emb1"])
        x = _conv_bn_eval(x, p["emb2"], s["emb2"])
        x = _conv_bn_eval(x, p["out0"], s["out0"])
        w = _t(p["out1"]["kernel"]).permute(3, 2, 0, 1)
        x = F.conv2d(x, w, _t(p["out1"]["bias"]))
        # NHWC conv channels -> (B, 3, 5, h, w): our channel c = a*5+attr
        outbox.append(x.reshape(b, 3, 5, g, g))

    ids = torch.from_numpy(np.asarray(ids_np, np.int64))
    flang_attn = _norm(_phrase_attn(params["sub_attn"], context, embedded,
                                    ids), 1)
    sim = [torch.einsum("bc,bchw->bhw", flang_attn, f) for f in corr_feat]
    only_obj = [ob[:, :, 4].mean(1) for ob in outbox]
    obj_score = [oo * ss for oo, ss in zip(only_obj, sim)]

    flang_loc = _norm(_phrase_attn(params["loc_attn"], context, embedded,
                                   ids), 1)
    coord_map = torch.cat([c.reshape(b, 8, -1).permute(0, 2, 1)
                           for c in coord_list], 1)       # (B, P, 8)
    obj_map = _norm(torch.cat([o.reshape(b, -1) for o in obj_score], 1), 1)
    ce = _dense_bn_eval(coord_map.reshape(-1, 8), params["loc_embedding"],
                        stats["loc_embedding"])
    ce = _norm(ce.reshape(b, -1, 8), 2)
    gram = torch.bmm(ce, ce.permute(0, 2, 1)) * obj_map[:, None, :]
    rel = _dense_bn_eval(gram.reshape(-1, CFG.all_positions),
                         params["loc_text_embedding"],
                         stats["loc_text_embedding"])
    rel = _norm(rel.reshape(b, CFG.all_positions, -1), 2)
    loc_map = torch.einsum("bpc,bc->bp", rel, flang_loc)
    lo = loc_map.min(1, keepdim=True)[0]
    hi = loc_map.max(1, keepdim=True)[0]
    loc_map = (loc_map - lo) / (hi - lo + 1e-6)
    loc = []
    s0 = 0
    for g in GRIDS:
        loc.append(loc_map[:, s0:s0 + g * g].reshape(b, g, g))
        s0 += g * g
    final = []
    for ob, ss, ls in zip(outbox, sim, loc):
        ob = ob.clone()
        ob[:, :, 4] = ob[:, :, 4] * (ss * ls)[:, None]
        final.append(ob)
    return final


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    model = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    images = rng.rand(4, 64, 64, 3).astype(np.float32)
    ids = rng.randint(1, 50, (4, 20)).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.asarray(images), jnp.asarray(ids), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    # backbone via the generic torch LayerDef executor, fed our weights
    from dcnet_tpu.models.darknet import save_darknet_weights
    wpath = str(tmp_path_factory.mktemp("w") / "mini.weights")
    save_darknet_weights(
        mini_backbone_defs(),
        {"params": params["visumodel"], "batch_stats": stats["visumodel"]},
        wpath)
    return model, variables, params, stats, wpath


def _torch_visual_features(params, stats, wpath, images_np):
    raw = _torch_forward(mini_backbone_defs(), wpath,
                         images_np.transpose(0, 3, 1, 2))
    fvisu = []
    for i, r in enumerate(raw):
        f = _conv_bn_eval(torch.from_numpy(r), params[f"mapping_visu_{i}"],
                          stats[f"mapping_visu_{i}"])
        fvisu.append(_norm(f, 1))
    return fvisu


def test_single_image_full_parity(setup):
    model, variables, params, stats, wpath = setup
    rng = np.random.RandomState(1)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    ids = rng.randint(1, 50, (2, 20)).astype(np.int32)

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(images), jnp.asarray(ids),
                          method=DCNetCls.single_image)

    fvisu = _torch_visual_features(params, stats, wpath, images)
    oracle = _oracle_trunk(params, stats, fvisu, ids, ids)
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(out.outbox[s]), oracle[s].detach().numpy(),
            rtol=1e-3, atol=2e-4)


def test_eval_clip_full_parity(setup):
    model, variables, params, stats, wpath = setup
    rng = np.random.RandomState(2)
    n_frame = 3
    images = rng.rand(n_frame, 64, 64, 3).astype(np.float32)  # B=1 clip
    ids = rng.randint(1, 50, (1, 20)).astype(np.int32)

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(images), jnp.asarray(ids),
                          n_frame=n_frame, method=DCNetCls.eval_clip)

    fvisu = _torch_visual_features(params, stats, wpath, images)  # (3, C, h, w)
    center = n_frame // 2
    corr_feat = []
    for i in range(3):
        f = fvisu[i]
        cen = f[center:center + 1]
        acc = None
        for idx in range(n_frame):
            if idx == center:
                continue
            ref = f[idx:idx + 1]
            b, c, h, w = cen.shape
            key = cen.reshape(1, c, h * w).permute(0, 2, 1)
            value = ref.reshape(1, c, h * w)
            co1 = torch.bmm(key, value)
            co2 = F.softmax(co1.permute(0, 2, 1) * 10.0, dim=1)
            att = torch.bmm(value, co2).reshape(1, c, h, w)
            cf = _conv_bn_eval(torch.cat([cen, att], 1),
                               params[f"corr_conv_{i}"],
                               stats[f"corr_conv_{i}"])
            cf = _norm(cf, 1)
            acc = cf if acc is None else acc + cf
        corr_feat.append(acc / (n_frame - 1))
    oracle = _oracle_trunk(params, stats, corr_feat, ids, ids)
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(out.outbox[s]), oracle[s].detach().numpy(),
            rtol=1e-3, atol=2e-4)
