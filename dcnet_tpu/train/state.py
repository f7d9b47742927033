"""Train state and optimizer.

Rebuilds the reference recipe (`/root/reference/train_DCNet.py:244-253,
527-534`): RMSprop with torch semantics (weight decay folded into the
gradient before the square-average, eps added outside the sqrt), two
parameter groups (backbone at lr/10), and per-epoch poly LR decay
`base_lr * (1 - epoch/nb_epoch)^power`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from dcnet_tpu.config import DCNetConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    apply_fn: Any = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def scale_by_torch_rmsprop(
    alpha: float = 0.99, eps: float = 1e-8
) -> optax.GradientTransformation:
    """torch.optim.RMSprop update rule: nu = a*nu + (1-a)*g^2;
    update = g / (sqrt(nu) + eps) — note eps *outside* the sqrt (optax's
    scale_by_rms puts it inside, which changes small-gradient behavior)."""

    def init(params):
        return {"nu": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        nu = jax.tree_util.tree_map(
            lambda n, g: alpha * n + (1 - alpha) * jnp.square(g),
            state["nu"], updates)
        out = jax.tree_util.tree_map(
            lambda g, n: g / (jnp.sqrt(n) + eps), updates, nu)
        return out, {"nu": nu}

    return optax.GradientTransformation(init, update)


def poly_epoch_schedule(base_lr: float, nb_epoch: int, power: float,
                        steps_per_epoch: int):
    """lr_poly applied per epoch (train_DCNet.py:244-253)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        frac = 1.0 - epoch.astype(jnp.float32) / nb_epoch
        return base_lr * jnp.maximum(frac, 0.0) ** power

    return schedule


def _backbone_mask(params) -> Dict:
    """True for every leaf under 'visumodel' (the lr/10 group)."""
    def mark(path_has_visu, tree):
        return jax.tree_util.tree_map(lambda _: path_has_visu, tree)

    return {k: mark(k == "visumodel", v) for k, v in params.items()}


def _frozen_mask(params) -> Dict:
    """True for every leaf under textmodel/bert — the frozen BERT body.

    The reference detaches the BERT output (DCNet_model.py:484), so those
    params never receive a gradient and torch.optim skips them entirely
    (`p.grad is None`) — including the RMSprop/Adam weight decay
    (train_DCNet.py:529,533). Our stop_gradient zeroes their grads, but
    optax's add_decayed_weights would still leak wd*p into the update and
    silently decay the "frozen" body (~5% shrink over 30 epochs); this
    mask forces their final update to exactly zero instead."""
    def mark(frozen, tree):
        return jax.tree_util.tree_map(lambda _: frozen, tree)

    out = {}
    for k, v in params.items():
        if k == "textmodel" and hasattr(v, "items") and "bert" in v:
            out[k] = {kk: mark(kk == "bert", vv) for kk, vv in v.items()}
        else:
            out[k] = mark(False, v)
    return out


def make_optimizer(cfg: DCNetConfig, steps_per_epoch: int,
                   params) -> optax.GradientTransformation:
    schedule = poly_epoch_schedule(
        cfg.lr, cfg.nb_epoch, cfg.poly_power, steps_per_epoch)
    if cfg.optimizer == "adam":
        core_tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
        )
    elif cfg.optimizer == "sgd":
        core_tx = optax.trace(decay=0.99)
    else:  # rmsprop (reference default)
        core_tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            scale_by_torch_rmsprop(),
        )
    return optax.chain(
        core_tx,
        # backbone param group at lr * backbone_lr_scale
        optax.masked(optax.scale(cfg.backbone_lr_scale),
                     _backbone_mask(params)),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
        # frozen BERT body: update must be exactly zero (see _frozen_mask)
        optax.masked(optax.set_to_zero(), _frozen_mask(params)),
    )


def create_train_state(
    model, cfg: DCNetConfig, rng: jax.Array, steps_per_epoch: int = 1000,
    sample_batch: Optional[dict] = None, variables: Optional[dict] = None,
) -> TrainState:
    """Initialize params (or take pre-loaded `variables`, e.g. with converted
    Darknet weights spliced in) and build the optimizer."""
    if variables is None:
        assert sample_batch is not None
        p_rng, s_rng, d_rng = jax.random.split(rng, 3)
        variables = model.init(
            {"params": p_rng, "sampling": s_rng, "dropout": d_rng},
            sample_batch["images"], sample_batch["word_ids"], train=False)
    tx = make_optimizer(cfg, steps_per_epoch, variables["params"])
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict({})),
        opt_state=tx.init(variables["params"]),
        apply_fn=model.apply,
        tx=tx,
    )
