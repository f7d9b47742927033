"""Train-step tests: optimizer semantics, full step on a mini backbone,
data-parallel execution on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import mini_backbone_defs
from dcnet_tpu.train.state import (
    create_train_state, poly_epoch_schedule, scale_by_torch_rmsprop,
)
from dcnet_tpu.train.step import eval_step, train_step

CFG = DCNetConfig(
    image_size=64, corpus_size=50, batch_size=2,
    interframe_top_k=4, interframe_neg_n=3, crossmodal_neg_n=3)


def _batch(rng, n_clips):
    return {
        "images": jnp.asarray(
            rng.rand(2 * n_clips, 64, 64, 3).astype(np.float32)),
        "word_ids": jnp.asarray(
            rng.randint(1, 50, (2 * n_clips, 20)).astype(np.int32)),
        "bbox": jnp.asarray(np.stack([
            rng.rand(2 * n_clips) * 20, rng.rand(2 * n_clips) * 20,
            rng.rand(2 * n_clips) * 20 + 30, rng.rand(2 * n_clips) * 20 + 30,
        ], 1).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def state_and_model():
    model = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(0)
    state = create_train_state(
        model, CFG, jax.random.PRNGKey(0), steps_per_epoch=10,
        sample_batch=_batch(rng, 2))
    return model, state


def test_rmsprop_matches_torch():
    import torch
    w0 = np.array([1.0, -2.0, 0.5], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.RMSprop([tw], lr=1e-2, weight_decay=5e-4)
    import optax
    tx = optax.chain(
        optax.add_decayed_weights(5e-4),
        scale_by_torch_rmsprop(),
        optax.scale(-1e-2))
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for _ in range(3):
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_poly_schedule():
    sched = poly_epoch_schedule(1e-4, 100, 0.9, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 1e-4, rtol=1e-5)
    # epoch 50 -> lr * 0.5^0.9
    np.testing.assert_allclose(float(sched(jnp.asarray(505))),
                               1e-4 * 0.5 ** 0.9, rtol=1e-5)


def test_train_step_updates_and_metrics(state_and_model):
    model, state = state_and_model
    rng = np.random.RandomState(1)
    batch = _batch(rng, 2)
    new_state, metrics = train_step(model, CFG, state, batch,
                                    jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    for k in ("loss", "loss_yolo", "loss_rank", "loss_loc",
              "loss_interframe", "loss_crossmodal", "acc50", "miou"):
        assert np.isfinite(float(metrics[k])), k
    # params changed, backbone changed 10x less per unit gradient
    d_head = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["fcn_0"], new_state.params["fcn_0"])
    assert max(jax.tree_util.tree_leaves(d_head)) > 0
    d_bb = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["visumodel"], new_state.params["visumodel"])
    assert max(jax.tree_util.tree_leaves(d_bb)) > 0
    # batch_stats updated
    diff_bs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.batch_stats, new_state.batch_stats)
    assert max(jax.tree_util.tree_leaves(diff_bs)) > 0


@pytest.mark.heavy
def test_frozen_bert_body_never_moves():
    """The BERT body is frozen exactly as the reference freezes it: its
    output is detached (DCNet_model.py:484), so torch never updates OR
    weight-decays those params (p.grad is None -> skipped,
    train_DCNet.py:533). Regression for the round-5 bug where
    add_decayed_weights leaked wd*p into the 'frozen' body (~5% shrink
    over 30 epochs): after real train steps the textmodel/bert subtree
    must be bit-identical to init while textmodel/proj trains."""
    import dataclasses
    cfg = dataclasses.replace(CFG, use_lstm=False, bert_model="bert-mini")
    model = DCNet(cfg=cfg, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(3)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0), steps_per_epoch=10,
        sample_batch=_batch(rng, 2))
    body0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), state.params["textmodel"]["bert"])
    proj0 = np.asarray(state.params["textmodel"]["proj"]["kernel"]).copy()
    for i in range(2):
        state, _ = train_step(model, cfg, state, _batch(rng, 2),
                              jax.random.PRNGKey(i))
    drift = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
        state.params["textmodel"]["bert"], body0)
    assert max(jax.tree_util.tree_leaves(drift)) == 0.0
    d_proj = float(
        jnp.abs(state.params["textmodel"]["proj"]["kernel"] - proj0).max())
    assert d_proj > 0.0  # the projection head (outside the freeze) trains


def test_backbone_lr_group(state_and_model):
    """Backbone updates are scaled by 0.1 relative to identical gradients."""
    model, state = state_and_model
    import optax
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    # after rms normalization a unit gradient gives ~lr-magnitude updates;
    # backbone leaves must be exactly 0.1x of an equivalent head leaf
    u_bb = updates["visumodel"]["conv_0"]["kernel"]
    u_hd = updates["fcn_0"]["out1"]["kernel"]
    np.testing.assert_allclose(float(jnp.abs(u_bb).max()),
                               0.1 * float(jnp.abs(u_hd).max()), rtol=1e-4)


def test_eval_step(state_and_model):
    model, state = state_and_model
    rng = np.random.RandomState(2)
    metrics = eval_step(model, CFG, state, _batch(rng, 2))
    for k in ("acc50", "acc_center", "miou"):
        v = float(metrics[k])
        assert 0.0 <= v <= 1.0


@pytest.mark.heavy
def test_train_step_data_parallel(state_and_model, devices):
    """Same math when the batch is sharded over the 8-device mesh."""
    from dcnet_tpu.parallel import make_mesh, replicate_state, shard_batch
    model, state = state_and_model
    rng = np.random.RandomState(3)
    batch = _batch(rng, 8)  # 16 images over 8 devices
    new_single, m_single = train_step(model, CFG, state, batch,
                                      jax.random.PRNGKey(1))
    mesh = make_mesh()
    with mesh:
        sharded = shard_batch(mesh, batch)
        st = replicate_state(mesh, state)
        new_sharded, m_sharded = train_step(model, CFG, st, sharded,
                                            jax.random.PRNGKey(1))
    # Only fp reduction-order noise is allowed between the two layouts.
    # (Param-level comparison is not meaningful here: RMSprop's first step
    # normalizes each update to ~lr*10 regardless of gradient magnitude, so
    # an fp sign flip on a near-zero gradient changes a param by 2*lr*10.)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-3)
    for k in ("acc50", "miou", "loss_yolo", "loss_interframe"):
        # BN batch stats + deep trunk amplify reduction-order noise a bit
        np.testing.assert_allclose(float(m_single[k]), float(m_sharded[k]),
                                   rtol=5e-3, atol=1e-5)
    finite = jax.tree_util.tree_map(
        lambda a: bool(jnp.all(jnp.isfinite(a))), new_sharded.params)
    assert all(jax.tree_util.tree_leaves(finite))


@pytest.mark.heavy
def test_train_step_tensor_parallel(devices):
    """2-D (data=4, model=2) mesh with the internal Gram/attention matrices
    sharded over 'model': same loss as the unsharded layout."""
    import dataclasses
    from dcnet_tpu.models.darknet import mini_backbone_defs
    from dcnet_tpu.parallel import make_mesh, replicate_state, shard_batch

    cfg_tp = dataclasses.replace(CFG, tp_internals=True)
    model = DCNet(cfg=CFG, backbone_defs=mini_backbone_defs())
    model_tp = DCNet(cfg=cfg_tp, backbone_defs=mini_backbone_defs())
    rng = np.random.RandomState(11)
    batch = _batch(rng, 4)  # 8 images
    state = create_train_state(model, CFG, jax.random.PRNGKey(0),
                               steps_per_epoch=10, sample_batch=batch)

    _, m_ref = train_step(model, CFG, state, batch, jax.random.PRNGKey(2))

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        st = replicate_state(mesh, state)
        sharded = shard_batch(mesh, batch)
        _, m_tp = train_step(model_tp, cfg_tp, st, sharded,
                             jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_tp["loss"]),
                               rtol=5e-3)
