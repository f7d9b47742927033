"""Checkpoint subsystem tests: orbax round-trip, pretrain splice, and
reference torch state_dict ingestion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import mini_backbone_defs
from dcnet_tpu.train.checkpoint import (
    load_pretrain, restore_checkpoint, save_checkpoint,
)
from dcnet_tpu.train.state import create_train_state

CFG = DCNetConfig(image_size=64, corpus_size=50,
                  interframe_top_k=4, interframe_neg_n=3, crossmodal_neg_n=3)


@pytest.fixture(scope="module")
def state():
    model = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32)),
        "word_ids": jnp.asarray(rng.randint(1, 50, (4, 20)).astype(np.int32)),
    }
    return create_train_state(model, CFG, jax.random.PRNGKey(0),
                              steps_per_epoch=10, sample_batch=batch)


def test_save_restore_roundtrip(state, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=3, best_acc=0.42)
    # perturb, then restore
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params),
        step=jnp.asarray(99, jnp.int32))
    restored, next_epoch, best = restore_checkpoint(ckpt, perturbed)
    assert next_epoch == 4 and abs(best - 0.42) < 1e-9
    orig = jax.tree_util.tree_leaves(state.params)
    rest = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, rest):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_pretrain_splice(state, tmp_path):
    ckpt = str(tmp_path / "pre")
    donor = state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 0 + 7.0, state.params))
    save_checkpoint(ckpt, donor, epoch=0, best_acc=0.0)
    spliced = load_pretrain(ckpt, state)
    leaf = np.asarray(spliced.params["fcn_0"]["out1"]["kernel"])
    assert np.all(leaf == 7.0)


def test_reference_state_dict_ingestion(state):
    """Backbone conv/bn keys from a torch-style state_dict land in the right
    pytree leaves (uses the mini backbone's conv_0)."""
    import torch
    from dcnet_tpu.train.checkpoint import convert_reference_state_dict

    k = np.asarray(state.params["visumodel"]["conv_0"]["kernel"])
    c_out, c_in, kh = k.shape[3], k.shape[2], k.shape[0]
    sd = {
        "module.visumodel.module_list.0.conv_0.weight":
            torch.from_numpy(np.full((c_out, c_in, kh, kh), 3.0, np.float32)),
        "module.visumodel.module_list.0.batch_norm_0.running_mean":
            torch.from_numpy(np.full((c_out,), 0.5, np.float32)),
    }
    params, stats, report = convert_reference_state_dict(
        sd, state.params, state.batch_stats)
    assert np.all(np.asarray(params["visumodel"]["conv_0"]["kernel"]) == 3.0)
    assert np.all(np.asarray(stats["visumodel"]["bn_0"]["mean"]) == 0.5)
    assert len(report.matched) == 2 and report.unmatched == []
