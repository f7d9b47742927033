"""Reference `.pth.tar` checkpoint bridge: full-coverage conversion test.

Builds a torch model whose module tree replicates the reference's EXACT
naming (`/root/reference/model/DCNet_model.py:221-338` with ConvBatchNormReLU
children `conv`/`bn`, darknet.py:118-149), so its `state_dict()` has the real
reference key set. The test converts that state_dict with
`convert_reference_state_dict`, asserts nothing was dropped and every one of
our leaves was written, and checks the flax forward (single-image and n-frame
eval paths) against the torch model's own forward — torch consumes the RAW
state_dict through real torch modules, so a transpose bug in the converter
cannot cancel out.
"""

import collections

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # minutes-long 256px/bridge suites
import torch
import torch.nn as nn
import torch.nn.functional as F

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import mini_backbone_defs
from dcnet_tpu.models.dcnet import DCNet as DCNetCls
from dcnet_tpu.train.checkpoint import (
    convert_reference_state_dict, export_reference_state_dict,
)
from tests.test_full_parity import _coord_map

CFG = DCNetConfig(image_size=64, corpus_size=50,
                  interframe_top_k=4, interframe_neg_n=3, crossmodal_neg_n=3)
DEFS = mini_backbone_defs()


class _CBR(nn.Sequential):
    """ConvBatchNormReLU clone (reference darknet.py:118-149 child names)."""

    def __init__(self, cin, cout, k, stride=1, pad=0):
        super().__init__()
        self.add_module("conv", nn.Conv2d(cin, cout, k, stride, pad, bias=False))
        self.add_module("bn", nn.BatchNorm2d(cout, eps=1e-5, momentum=0.999))
        self.add_module("relu", nn.ReLU())


class _PhraseAttention(nn.Module):
    def __init__(self, input_dim):
        super().__init__()
        self.fc = nn.Linear(input_dim, 1)

    def forward(self, context, embedded, ids):
        attn = F.softmax(self.fc(context).squeeze(2), dim=1)
        attn = attn * (ids != 0).float()
        attn = attn / attn.sum(1, keepdim=True)
        return attn, torch.bmm(attn.unsqueeze(1), embedded).squeeze(1)


class _RNNEncoder(nn.Module):
    """RNNEncoder clone (DCNet_model.py:124-188 child names + packed-seq
    semantics)."""

    def __init__(self, vocab, word_emb, word_vec, hidden):
        super().__init__()
        self.embedding = nn.Embedding(vocab, word_emb)
        self.input_dropout = nn.Dropout(0.2)
        self.mlp = nn.Sequential(nn.Linear(word_emb, word_vec), nn.ReLU())
        self.rnn = nn.LSTM(word_vec, hidden, 1, batch_first=True,
                           bidirectional=True)

    def forward(self, ids):
        lengths = (ids != 0).sum(1).clamp(min=1)
        emb = self.mlp(self.input_dropout(self.embedding(ids)))
        packed = nn.utils.rnn.pack_padded_sequence(
            emb, lengths.tolist(), batch_first=True, enforce_sorted=False)
        out, _ = self.rnn(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=ids.shape[1])
        sent = torch.stack(
            [out[i, int(lengths[i]) - 1] for i in range(len(ids))])
        return sent, out, emb


def _upsample2(x):
    return x[:, :, :, None, :, None].expand(-1, -1, -1, 2, -1, 2).reshape(
        x.size(0), x.size(1), x.size(2) * 2, x.size(3) * 2)


class _RefModel(nn.Module):
    """Reference grounding_model mirror (full/LSTM variant) over the mini
    backbone defs, exposing the reference state_dict key namespace."""

    def __init__(self, cfg: DCNetConfig, defs=DEFS):
        super().__init__()
        self.defs = defs
        self.cfg = cfg
        emb, textdim, embdim = cfg.emb_size, cfg.textdim, 512

        visumodel = nn.Module()
        visumodel.module_list = nn.ModuleList()
        cap_channels = []
        for i, ld in enumerate(defs):
            m = nn.Sequential()
            if ld.type in ("convolutional", "yoloconvolutional"):
                if ld.type == "yoloconvolutional":
                    cap_channels.append(ld.in_filters)
                m.add_module(f"conv_{i}", nn.Conv2d(
                    ld.in_filters, ld.filters, ld.size, ld.stride, ld.pad,
                    bias=not ld.batch_normalize))
                if ld.batch_normalize:
                    m.add_module(f"batch_norm_{i}",
                                 nn.BatchNorm2d(ld.filters, eps=1e-5))
            visumodel.module_list.append(m)
        self.visumodel = visumodel

        self.textmodel = _RNNEncoder(cfg.corpus_size,
                                     cfg.word_embedding_size,
                                     textdim // 2, textdim // 2)
        self.sub_attn = _PhraseAttention(textdim)
        self.loc_attn = _PhraseAttention(textdim)
        self.loc_embedding = nn.Sequential(
            nn.Linear(8, 8), nn.BatchNorm1d(8), nn.ReLU())
        self.loc_text_embedding = nn.Sequential(
            nn.Linear(cfg.all_positions, embdim), nn.BatchNorm1d(embdim),
            nn.ReLU())
        self.mapping_visu = nn.Sequential(collections.OrderedDict(
            [(str(s), _CBR(c, emb, 1)) for s, c in enumerate(cap_channels)]))
        self.mapping_lang = nn.Sequential(
            nn.Linear(textdim, emb), nn.BatchNorm1d(emb), nn.ReLU(),
            nn.Dropout(0.1), nn.Linear(emb, emb), nn.BatchNorm1d(emb),
            nn.ReLU())
        self.corr_conv = nn.Sequential(collections.OrderedDict(
            [(str(s), nn.Sequential(_CBR(emb * 2, emb, 1)))
             for s in range(3)]))
        self.feature_map = nn.Sequential(
            nn.Conv1d(cfg.query_len, cfg.query_len, 3, 1, 1, bias=True),
            nn.Softmax(dim=1))
        embin = emb * 2 + 8
        self.fcn_emb = nn.Sequential(collections.OrderedDict(
            [(str(s), nn.Sequential(_CBR(embin, emb, 1),
                                    _CBR(emb, emb, 3, 1, 1),
                                    _CBR(emb, emb, 1)))
             for s in range(3)]))
        self.fcn_out = nn.Sequential(collections.OrderedDict(
            [(str(s), nn.Sequential(_CBR(emb, emb // 2, 1),
                                    nn.Conv2d(emb // 2, 15, 1)))
             for s in range(3)]))

    # --- forward pieces (eval mode), mirroring DCNet_model.forward -------

    def backbone(self, x):
        captured, outs = [], []
        for i, ld in enumerate(self.defs):
            if ld.type in ("convolutional", "yoloconvolutional"):
                if ld.type == "yoloconvolutional":
                    captured.append(x)
                x = self.visumodel.module_list[i](x)
                if ld.activation == "leaky":
                    x = F.leaky_relu(x, 0.1)
            elif ld.type == "upsample":
                x = _upsample2(x)
            elif ld.type == "route":
                x = torch.cat([outs[s] for s in ld.layers], 1)
            elif ld.type == "shortcut":
                x = outs[-1] + outs[ld.from_]
            outs.append(x)
        return captured

    def visual_features(self, images):
        raw = self.backbone(images)
        return [F.normalize(self.mapping_visu[i](raw[i]), p=2, dim=1)
                for i in range(3)]

    def trunk(self, corr_feat, ids):
        b = corr_feat[0].shape[0]
        sent, context, embedded = self.textmodel(ids)
        flang = F.normalize(self.mapping_lang(sent), p=2, dim=1)

        coord_list = [_coord_map(f.shape[2], f.shape[3])[None].expand(
            b, -1, -1, -1) for f in corr_feat]
        outbox = []
        for i, f in enumerate(corr_feat):
            g = f.shape[-1]
            tile = flang[:, :, None, None].expand(b, flang.shape[1], g, g)
            x = self.fcn_emb[i](torch.cat([f, tile, coord_list[i]], 1))
            x = self.fcn_out[i](x)
            outbox.append(x.reshape(b, 3, 5, g, g))

        _, flang_attn = self.sub_attn(context, embedded, ids)
        flang_attn = F.normalize(flang_attn, p=2, dim=1)
        sim = [torch.einsum("bc,bchw->bhw", flang_attn, f) for f in corr_feat]
        only_obj = [ob[:, :, 4].mean(1) for ob in outbox]
        obj_score = [oo * ss for oo, ss in zip(only_obj, sim)]

        _, flang_loc = self.loc_attn(context, embedded, ids)
        flang_loc = F.normalize(flang_loc, p=2, dim=1)
        coord_flat = torch.cat([c.reshape(b, 8, -1).permute(0, 2, 1)
                                for c in coord_list], 1)
        obj_map = F.normalize(
            torch.cat([o.reshape(b, -1) for o in obj_score], 1), p=2, dim=1)
        ce = self.loc_embedding(coord_flat.reshape(-1, 8))
        ce = F.normalize(ce.reshape(b, -1, 8), p=2, dim=2)
        gram = torch.bmm(ce, ce.permute(0, 2, 1)) * obj_map[:, None, :]
        rel = self.loc_text_embedding(gram.reshape(-1, self.cfg.all_positions))
        rel = F.normalize(rel.reshape(b, self.cfg.all_positions, -1), p=2,
                          dim=2)
        loc_map = torch.einsum("bpc,bc->bp", rel, flang_loc)
        lo, hi = loc_map.min(1, keepdim=True)[0], loc_map.max(1, keepdim=True)[0]
        loc_map = (loc_map - lo) / (hi - lo + 1e-6)

        final, s0 = [], 0
        for ob, ss, f in zip(outbox, sim, corr_feat):
            g2 = f.shape[2] * f.shape[3]
            ls = loc_map[:, s0:s0 + g2].reshape(b, f.shape[2], f.shape[3])
            s0 += g2
            ob = ob.clone()
            ob[:, :, 4] = ob[:, :, 4] * (ss * ls)[:, None]
            final.append(ob)
        return final

    def single_image(self, images, ids):
        return self.trunk(self.visual_features(images), ids)

    def eval_clip(self, images, ids, n_frame):
        fvisu = self.visual_features(images)
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
                c, hw = cen.shape[1], cen.shape[2] * cen.shape[3]
                key = cen.reshape(1, c, hw).permute(0, 2, 1)
                value = ref.reshape(1, c, hw)
                co2 = F.softmax(torch.bmm(key, value).permute(0, 2, 1) * 10.0,
                                dim=1)
                att = torch.bmm(value, co2).reshape_as(cen)
                cf = F.normalize(self.corr_conv[i](torch.cat([cen, att], 1)),
                                 p=2, dim=1)
                acc = cf if acc is None else acc + cf
            corr_feat.append(acc / (n_frame - 1))
        return self.trunk(corr_feat, ids)


@pytest.fixture(scope="module")
def bridge():
    torch.manual_seed(7)
    ref = _RefModel(CFG).eval()
    # randomize BN running stats so running_mean/var conversion is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    sd = ref.state_dict()

    model = DCNet(cfg=CFG, backbone_defs=DEFS)
    rng = np.random.RandomState(0)
    images = rng.rand(4, 64, 64, 3).astype(np.float32)
    ids = rng.randint(1, 50, (4, 20)).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.asarray(images), jnp.asarray(ids), train=False)

    params, stats, report = convert_reference_state_dict(
        sd, variables["params"], variables["batch_stats"])
    return ref, sd, {"params": params, "batch_stats": stats}, report, model


def test_every_key_mapped_and_every_leaf_written(bridge):
    _, sd, _, report, _ = bridge
    assert report.unmatched == []
    assert report.untouched == []
    n_tracked = sum(1 for k in sd if k.endswith("num_batches_tracked"))
    assert len(report.matched) == len(sd) - n_tracked
    assert sorted(report.skipped) == sorted(
        k for k in sd if k.endswith("num_batches_tracked"))


def test_single_image_forward_matches_torch(bridge):
    ref, _, variables, _, model = bridge
    rng = np.random.RandomState(1)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    ids = rng.randint(1, 50, (2, 20)).astype(np.int32)
    ids[1, 15:] = 0  # exercise pad masking in LSTM / attention

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(images), jnp.asarray(ids),
                          method=DCNetCls.single_image)
    with torch.no_grad():
        oracle = ref.single_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(ids.astype(np.int64)))
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(out.outbox[s]), oracle[s].numpy(),
            rtol=1e-3, atol=2e-4)


def test_eval_clip_forward_matches_torch(bridge):
    ref, _, variables, _, model = bridge
    rng = np.random.RandomState(2)
    n_frame = 3
    images = rng.rand(n_frame, 64, 64, 3).astype(np.float32)
    ids = rng.randint(1, 50, (1, 20)).astype(np.int32)

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(images), jnp.asarray(ids),
                          n_frame=n_frame, method=DCNetCls.eval_clip)
    with torch.no_grad():
        oracle = ref.eval_clip(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(ids.astype(np.int64)), n_frame)
    for s in range(3):
        np.testing.assert_allclose(
            np.asarray(out.outbox[s]), oracle[s].numpy(),
            rtol=1e-3, atol=2e-4)


def test_feature_map_conv1d_equivalence(bridge):
    """The Conv1d smoothing is only used in the train forward (whose outputs
    are PRNG-sampled), so check the converted weights directly against
    torch's F.conv1d."""
    ref, _, variables, _, _ = bridge
    import flax.linen as fnn

    rng = np.random.RandomState(3)
    x = rng.rand(2, 7, CFG.query_len).astype(np.float32)  # (B, P, L)
    conv = fnn.Conv(CFG.query_len, (3,), padding=[(1, 1)])
    ours = conv.apply({"params": variables["params"]["feature_map"]},
                      jnp.asarray(x))
    with torch.no_grad():
        theirs = F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)),
                          ref.feature_map[0].weight, ref.feature_map[0].bias,
                          padding=1).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def test_export_roundtrip(bridge):
    """export_reference_state_dict inverts the conversion bit-for-bit."""
    _, sd, variables, _, _ = bridge
    exported = export_reference_state_dict(
        variables["params"], variables["batch_stats"])
    want = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(exported) == want
    for k in want:
        np.testing.assert_array_equal(
            exported[k], np.asarray(sd[k]), err_msg=k)


def test_load_reference_checkpoint_file(bridge, tmp_path):
    """The {epoch, state_dict, ...} .pth.tar wrapper loads end-to-end."""
    ref, sd, variables, _, model = bridge
    from dcnet_tpu.train.checkpoint import load_reference_checkpoint
    from dcnet_tpu.train.state import create_train_state

    path = str(tmp_path / "ref_checkpoint.pth.tar")
    torch.save({"epoch": 3, "state_dict": sd, "best_loss": 0.5}, path)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32)),
        "word_ids": jnp.asarray(rng.randint(1, 50, (4, 20)).astype(np.int32)),
    }
    state = create_train_state(model, CFG, jax.random.PRNGKey(0),
                               steps_per_epoch=10, sample_batch=batch)
    loaded, report = load_reference_checkpoint(path, state)
    assert report.unmatched == []
    np.testing.assert_array_equal(
        np.asarray(loaded.params["sub_attn"]["fc"]["bias"]),
        ref.sub_attn.fc.bias.detach().numpy())
