"""BERT encoder tests: cross-check vs transformers' torch BertModel, and the
DCNet BERT-path forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcnet_tpu.models.bert import (
    BertConfig, BertEncoder, BertModel, convert_hf_bert_params,
)


def _tiny_cfg():
    return BertConfig(vocab_size=60, hidden_size=32, num_layers=2,
                      num_heads=2, intermediate_size=64, max_position=40,
                      dropout=0.0)


def test_bert_matches_transformers():
    import torch
    from transformers import BertConfig as HFConfig, BertModel as HFBert

    cfg = _tiny_cfg()
    hf = HFBert(HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu"))
    hf.eval()
    params = convert_hf_bert_params(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 60, (3, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 8:] = 0
    ids[1, 8:] = 0

    model = BertModel(cfg)
    with jax.default_matmul_precision("highest"):
        layers = model.apply({"params": params}, jnp.asarray(ids),
                             attention_mask=jnp.asarray(mask))

    with torch.no_grad():
        out = hf(torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)),
                 output_hidden_states=True)
    # hidden_states[0] is the embedding output; [1:] are the layers
    for i, ours in enumerate(layers):
        ref = out.hidden_states[i + 1].numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-4)


def test_bert_encoder_contract():
    # "bert-mini" -> the 128-hidden 4-layer lock/smoke config
    # (BertConfig.for_model); the wrapper contract is dimension-generic.
    model = BertEncoder(bert_model="bert-mini", proj_dim=16)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(1, 100, (2, 20)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), ids)
    sent, ctx, emb = model.apply(variables, ids)
    assert sent.shape == (2, 128)
    assert ctx.shape == (2, 20, 128)
    assert emb.shape == (2, 20, 16)
    assert BertConfig.for_model("bert-base-uncased").hidden_size == 768
    assert BertConfig.for_model("bert-large-uncased").hidden_size == 1024

    # frozen: no grads reach bert params, but proj gets grads
    def loss(params):
        s, c, e = model.apply({"params": params}, ids)
        return jnp.sum(s ** 2) + jnp.sum(e ** 2)

    g = jax.grad(loss)(variables["params"])
    bert_norm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["bert"]))
    proj_norm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["proj"]))
    assert bert_norm == 0.0
    assert proj_norm > 0.0


def test_dcnet_bert_path_forward():
    from dcnet_tpu.config import DCNetConfig
    from dcnet_tpu.models import DCNet
    from dcnet_tpu.models.darknet import mini_backbone_defs

    cfg = DCNetConfig(image_size=64, use_lstm=False,
                      interframe_top_k=4, interframe_neg_n=3,
                      crossmodal_neg_n=3)
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 1000, (4, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, images, ids, train=False)
    out = model.apply(variables, images, ids, train=False)
    assert out.outbox[0].shape == (4, 3, 5, 2, 2)
    assert out.flang_attn.shape == (4, 512)
    assert bool(jnp.all(jnp.isfinite(out.outbox[0])))
