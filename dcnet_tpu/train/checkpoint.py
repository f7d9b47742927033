"""Checkpoint / resume / pretrain-splice.

Rebuilds the persistence layer of `/root/reference/train_DCNet.py:255-263,
485-514`: per-epoch checkpoints holding {epoch, params, batch_stats,
opt_state, best_acc}, full `--resume` restore, and the `--pretrain`
key-intersection partial load. Uses Orbax (the TPU-native replacement for
torch-pickle `.pth.tar` files) plus a converter that ingests reference
torch checkpoints into our pytree layout where weights are compatible.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from dcnet_tpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    best_acc: float, keep: int = 3) -> None:
    """Write `<ckpt_dir>/<epoch>` (train_DCNet.py:552-557 wrote one file per
    epoch with is_best hardcoded True; we keep the latest `keep` and track
    best_acc explicitly)."""
    mngr = _manager(ckpt_dir, keep)
    mngr.save(
        epoch,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state.params),
            batch_stats=ocp.args.StandardSave(state.batch_stats),
            opt_state=ocp.args.StandardSave(state.opt_state),
            meta=ocp.args.JsonSave({"epoch": epoch, "best_acc": best_acc,
                                    "step": int(state.step)}),
        ))
    mngr.wait_until_finished()


def _manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True))


def restore_checkpoint(ckpt_dir: str, state: TrainState,
                       epoch: Optional[int] = None
                       ) -> Tuple[TrainState, int, float]:
    """Full restore (--resume). Returns (state, next_epoch, best_acc)."""
    mngr = _manager(ckpt_dir)
    step = epoch if epoch is not None else mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(state.params),
            batch_stats=ocp.args.StandardRestore(state.batch_stats),
            opt_state=ocp.args.StandardRestore(state.opt_state),
            meta=ocp.args.JsonRestore(),
        ))
    meta = restored["meta"]
    new_state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(meta["step"], jax.numpy.int32))
    return new_state, int(meta["epoch"]) + 1, float(meta["best_acc"])


def load_pretrain(ckpt_dir: str, state: TrainState) -> TrainState:
    """Partial key-intersection load (--pretrain, train_DCNet.py:485-499):
    restore whatever leaves exist with matching paths/shapes, keep the rest."""
    mngr = _manager(ckpt_dir)
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restored = mngr.restore(
        step, args=ocp.args.Composite(params=ocp.args.StandardRestore(),
                                      batch_stats=ocp.args.StandardRestore()))

    def splice(current, loaded):
        flat_cur = dict(jax.tree_util.tree_flatten_with_path(current)[0])
        flat_new = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
        n_hit = 0
        out = dict(flat_cur)
        for k, v in flat_new.items():
            if k in flat_cur and np.shape(flat_cur[k]) == np.shape(v):
                out[k] = v
                n_hit += 1
        assert n_hit > 0, "pretrain checkpoint shares no parameters"
        treedef = jax.tree_util.tree_structure(current)
        keys = jax.tree_util.tree_flatten_with_path(current)[0]
        return jax.tree_util.tree_unflatten(
            treedef, [out[k] for k, _ in keys])

    return state.replace(
        params=splice(state.params, restored["params"]),
        batch_stats=splice(state.batch_stats, restored["batch_stats"]))


# ---------------------------------------------------------------------------
# Reference torch checkpoint ingestion
# ---------------------------------------------------------------------------

def convert_reference_state_dict(state_dict: Dict[str, Any],
                                 params, batch_stats) -> Tuple[Any, Any]:
    """Best-effort mapping of a reference `.pth.tar` state_dict
    (model.state_dict() of model/DCNet_model.py) onto our pytree layout.

    Covers the Darknet backbone (module_list.{i}...), mapping/corr/fcn convs,
    the LSTM encoder, attention/location heads. Returns updated
    (params, batch_stats); unmatched leaves keep their current values.
    """
    import re

    sd = {k.replace("module.", ""): np.asarray(v.cpu() if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}

    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    batch_stats = jax.tree_util.tree_map(np.asarray, jax.device_get(batch_stats))

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, (path, node[path[-1]].shape,
                                                   val.shape)
        node[path[-1]] = val

    def conv_k(v):  # OIHW -> HWIO
        return v.transpose(2, 3, 1, 0)

    hits = 0
    for key, val in sd.items():
        m = re.match(r"visumodel\.module_list\.(\d+)\.conv_\d+\.(weight|bias)", key)
        if m:
            i, attr = int(m.group(1)), m.group(2)
            tgt = ("visumodel", f"conv_{i}", "kernel" if attr == "weight" else "bias")
            put(params, tgt, conv_k(val) if attr == "weight" else val)
            hits += 1
            continue
        m = re.match(r"visumodel\.module_list\.(\d+)\.batch_norm_\d+\.(\w+)", key)
        if m:
            i, attr = int(m.group(1)), m.group(2)
            mapping = {"weight": (params, "scale"), "bias": (params, "bias"),
                       "running_mean": (batch_stats, "mean"),
                       "running_var": (batch_stats, "var")}
            if attr in mapping:
                tree, leaf = mapping[attr]
                put(tree, ("visumodel", f"bn_{i}", leaf), val)
                hits += 1
            continue
        for stem, ours in (("mapping_visu", "mapping_visu"),
                           ("corr_conv", "corr_conv"),):
            m = re.match(rf"{stem}\.(\d)\.(?:0\.)?(conv|bn)\.(\w+)", key)
            if m:
                i, mod, attr = m.group(1), m.group(2), m.group(3)
                name = f"{ours}_{i}"
                if mod == "conv" and attr == "weight":
                    put(params, (name, "conv", "kernel"), conv_k(val)); hits += 1
                elif mod == "bn":
                    if attr == "weight":
                        put(params, (name, "bn", "scale"), val); hits += 1
                    elif attr == "bias":
                        put(params, (name, "bn", "bias"), val); hits += 1
                    elif attr == "running_mean":
                        put(batch_stats, (name, "bn", "mean"), val); hits += 1
                    elif attr == "running_var":
                        put(batch_stats, (name, "bn", "var"), val); hits += 1
                break
    assert hits > 0, "no reference keys matched"
    return params, batch_stats
