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
                       epoch: Optional[int] = None,
                       with_opt_state: bool = True
                       ) -> Tuple[TrainState, int, float]:
    """Full restore (--resume). Returns (state, next_epoch, best_acc).

    `with_opt_state=False` restores params/batch_stats only — the eval
    CLIs use it, mirroring the reference test path which loads just the
    model state_dict (test_DCNet.py `checkpoint['state_dict']`), so an
    optimizer-chain change can't brick evaluation of old checkpoints."""
    mngr = _manager(ckpt_dir)
    step = epoch if epoch is not None else mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    restore_args = dict(
        params=ocp.args.StandardRestore(state.params),
        batch_stats=ocp.args.StandardRestore(state.batch_stats),
        meta=ocp.args.JsonRestore(),
    )
    if with_opt_state:
        restore_args["opt_state"] = ocp.args.StandardRestore(state.opt_state)
    restored = mngr.restore(step, args=ocp.args.Composite(**restore_args))
    meta = restored["meta"]
    new_state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=(restored["opt_state"] if with_opt_state
                   else state.opt_state),
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
# Reference torch checkpoint ingestion / export
# ---------------------------------------------------------------------------
#
# The reference persists `model.state_dict()` of
# `/root/reference/model/DCNet_model.py:221-338` inside `.pth.tar` files
# (train_DCNet.py:255-263). The tables below map every torch key onto our
# flax pytree layout (and back), so reference-trained checkpoints load
# bit-for-bit (modulo layout transposes) and our checkpoints can be exported
# for the reference code to consume.
#
# torch -> flax layout transforms:
#   Conv2d weight (O,I,kH,kW) -> HWIO;  Conv1d weight (O,I,k) -> (k,I,O);
#   Linear weight (O,I) -> (I,O);  LSTM weight_{ih,hh}_l0 (4H,D) -> (D,4H).


class ConversionReport:
    """What a state_dict conversion touched. `unmatched` are reference keys
    with no mapping (silent drops are a bug — strict mode raises on them);
    `untouched` are our leaves the checkpoint never wrote."""

    def __init__(self):
        self.matched: list = []
        self.skipped: list = []      # paramless keys (num_batches_tracked)
        self.unmatched: list = []
        self.untouched: list = []

    def __repr__(self):
        return (f"ConversionReport(matched={len(self.matched)}, "
                f"skipped={len(self.skipped)}, "
                f"unmatched={self.unmatched[:8]}{'...' if len(self.unmatched) > 8 else ''}, "
                f"untouched={self.untouched[:8]}{'...' if len(self.untouched) > 8 else ''})")


def _t_lin(v):
    return v.transpose(1, 0)


def _t_conv2d(v):
    return v.transpose(2, 3, 1, 0)


def _t_conv1d(v):
    return v.transpose(2, 1, 0)


def _reference_key_map(sd_keys, light: bool) -> Dict[str, Tuple]:
    """reference state_dict key -> ('params'|'stats', path, transform).

    Built against the module definitions at DCNet_model.py:233-338 (and
    ConvBatchNormReLU's `conv`/`bn` children, darknet.py:118-149).
    """
    import re

    ident = None
    table: Dict[str, Tuple] = {}

    def bn(path_prefix):
        """BatchNorm{1,2}d key set under a torch module path."""
        return {
            "weight": ("params", path_prefix + ("scale",), ident),
            "bias": ("params", path_prefix + ("bias",), ident),
            "running_mean": ("stats", path_prefix + ("mean",), ident),
            "running_var": ("stats", path_prefix + ("var",), ident),
            "num_batches_tracked": ("skip", None, None),
        }

    def add_cbr(torch_prefix, path):
        """ConvBatchNormReLU: <prefix>.conv.weight + <prefix>.bn.*"""
        table[f"{torch_prefix}.conv.weight"] = (
            "params", path + ("conv", "kernel"), _t_conv2d)
        for attr, spec in bn(path + ("bn",)).items():
            table[f"{torch_prefix}.bn.{attr}"] = spec

    def add_dense_bn(torch_lin, torch_bn, path):
        """nn.Linear + nn.BatchNorm1d pair -> DenseBNReLU {fc, bn}."""
        table[f"{torch_lin}.weight"] = ("params", path + ("fc", "kernel"), _t_lin)
        table[f"{torch_lin}.bias"] = ("params", path + ("fc", "bias"), ident)
        for attr, spec in bn(path + ("bn",)).items():
            table[f"{torch_bn}.{attr}"] = spec

    # --- backbone: visumodel.module_list.{i}.{conv,batch_norm}_{i}.* ------
    for key in sd_keys:
        m = re.match(r"visumodel\.module_list\.(\d+)\.conv_\d+\.(weight|bias)$",
                     key)
        if m:
            i, attr = int(m.group(1)), m.group(2)
            table[key] = ("params", ("visumodel", f"conv_{i}",
                                     "kernel" if attr == "weight" else "bias"),
                          _t_conv2d if attr == "weight" else ident)
            continue
        m = re.match(r"visumodel\.module_list\.(\d+)\.batch_norm_\d+\.(\w+)$",
                     key)
        if m:
            i, attr = int(m.group(1)), m.group(2)
            spec = bn(("visumodel", f"bn_{i}")).get(attr)
            if spec is not None:
                table[key] = spec

    # --- language encoder (LSTM path; RNNEncoder, DCNet_model.py:124-188) -
    table["textmodel.embedding.weight"] = (
        "params", ("textmodel", "embedding", "embedding"), ident)
    table["textmodel.mlp.0.weight"] = (
        "params", ("textmodel", "mlp", "kernel"), _t_lin)
    table["textmodel.mlp.0.bias"] = (
        "params", ("textmodel", "mlp", "bias"), ident)
    for tdir, ours in (("", "fwd"), ("_reverse", "bwd")):
        for gate in ("ih", "hh"):
            table[f"textmodel.rnn.weight_{gate}_l0{tdir}"] = (
                "params", ("textmodel", f"{ours}_w_{gate}"), _t_lin)
            table[f"textmodel.rnn.bias_{gate}_l0{tdir}"] = (
                "params", ("textmodel", f"{ours}_b_{gate}"), ident)

    # --- attention & location heads --------------------------------------
    for name in ("sub_attn", "loc_attn"):
        table[f"{name}.fc.weight"] = ("params", (name, "fc", "kernel"), _t_lin)
        table[f"{name}.fc.bias"] = ("params", (name, "fc", "bias"), ident)
    add_dense_bn("loc_embedding.0", "loc_embedding.1", ("loc_embedding",))
    add_dense_bn("loc_text_embedding.0", "loc_text_embedding.1",
                 ("loc_text_embedding",))

    # --- mapping modules ---------------------------------------------------
    for s in range(3):
        add_cbr(f"mapping_visu.{s}", (f"mapping_visu_{s}",))
        add_cbr(f"corr_conv.{s}.0", (f"corr_conv_{s}",))
    # mapping_lang Sequential: 0 Linear, 1 BN, (2 ReLU, 3 Dropout),
    # 4 Linear, 5 BN (DCNet_model.py:268-276)
    add_dense_bn("mapping_lang.0", "mapping_lang.1", ("mapping_lang", "l0"))
    add_dense_bn("mapping_lang.4", "mapping_lang.5", ("mapping_lang", "l1"))

    # --- cross-modal Conv1d smoothing (DCNet_model.py:287-290) -----------
    table["feature_map.0.weight"] = ("params", ("feature_map", "kernel"),
                                     _t_conv1d)
    table["feature_map.0.bias"] = ("params", ("feature_map", "bias"), ident)

    # --- fusion FCN + box head (full / light, DCNet_model.py:293-338) ----
    for s in range(3):
        fcn = f"fcn_{s}"
        if light:
            add_cbr(f"fcn_emb.{s}.0", (fcn, "emb0"))
            plain_out = f"fcn_out.{s}.0"
        else:
            for j in range(3):
                add_cbr(f"fcn_emb.{s}.{j}", (fcn, f"emb{j}"))
            add_cbr(f"fcn_out.{s}.0", (fcn, "out0"))
            plain_out = f"fcn_out.{s}.1"
        table[f"{plain_out}.weight"] = ("params", (fcn, "out1", "kernel"),
                                        _t_conv2d)
        table[f"{plain_out}.bias"] = ("params", (fcn, "out1", "bias"), ident)

    return table


def convert_reference_state_dict(
    state_dict: Dict[str, Any], params, batch_stats, light: bool = False,
    strict: bool = True,
) -> Tuple[Any, Any, ConversionReport]:
    """Map a reference `.pth.tar` state_dict (model.state_dict() of
    model/DCNet_model.py:221-338, optionally DDP `module.`-prefixed) onto our
    pytree layout.

    Covers EVERY reference module: backbone, LSTM encoder, mapping_visu/lang,
    corr_conv, feature_map, sub/loc attention, loc embeddings, fcn_emb/out
    (full and light). BERT-path checkpoints (`textmodel.embeddings...`) are
    delegated to models.bert.convert_hf_bert_params. Returns
    (params, batch_stats, report); strict mode raises if any reference key
    has no mapping, so nothing is ever silently dropped.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v.cpu() if hasattr(v, "cpu") else v)

    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    batch_stats = jax.tree_util.tree_map(np.asarray, jax.device_get(batch_stats))
    report = ConversionReport()

    # BERT-path language encoder: frozen pretrained BERT under textmodel.*
    bert_keys = [k for k in sd if k.startswith("textmodel.embeddings.")
                 or k.startswith("textmodel.encoder.")]
    if bert_keys:
        from dcnet_tpu.models.bert import BertConfig as _BC, convert_hf_bert_params
        hidden = sd["textmodel.embeddings.word_embeddings.weight"].shape[1]
        cfg = _BC.for_model(
            "bert-base-uncased" if hidden == 768 else "bert-large-uncased")
        bert_sd = {k[len("textmodel."):]: sd.pop(k) for k in bert_keys}
        # pooler is unused by the reference's mean-of-CLS readout
        dropped = [k for k in list(bert_sd) if k.startswith("pooler.")]
        for k in dropped:
            bert_sd.pop(k)
        params["textmodel"]["bert"] = convert_hf_bert_params(bert_sd, cfg)
        report.matched.extend("textmodel." + k for k in bert_sd)
        report.skipped.extend("textmodel." + k for k in dropped)

    table = _reference_key_map(sd.keys(), light=light)
    written = set()

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        if node[path[-1]].shape != val.shape:
            raise ValueError(f"shape mismatch at {path}: "
                             f"{node[path[-1]].shape} vs {val.shape}")
        node[path[-1]] = val.astype(node[path[-1]].dtype)
        written.add(path)

    for key, val in sd.items():
        spec = table.get(key)
        if spec is None:
            report.unmatched.append(key)
            continue
        kind, path, transform = spec
        if kind == "skip":
            report.skipped.append(key)
            continue
        put(params if kind == "params" else batch_stats, path,
            transform(val) if transform else val)
        report.matched.append(key)

    # leaves of ours the checkpoint never touched (e.g. BertEncoder's `proj`,
    # which has no reference counterpart)
    for tree, kind in ((params, "params"), (batch_stats, "stats")):
        for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in kp)
            if path not in written:
                report.untouched.append((kind,) + path)

    if strict and report.unmatched:
        raise KeyError(
            f"{len(report.unmatched)} reference keys have no mapping "
            f"(first: {report.unmatched[:5]}); pass strict=False to ignore")
    if not report.matched:
        raise ValueError("no reference keys matched")
    return params, batch_stats, report


def export_reference_state_dict(params, batch_stats,
                                light: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of `convert_reference_state_dict`: our pytrees -> a torch-layout
    state_dict the reference code can `load_state_dict` (LSTM path). Lets a
    model trained here be evaluated by the reference CUDA stack."""
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    batch_stats = jax.tree_util.tree_map(np.asarray, jax.device_get(batch_stats))

    # enumerate all torch keys by probing the map with a synthetic key list
    # containing every backbone index present in our tree
    bb_keys = []
    for name in params.get("visumodel", {}):
        if name.startswith("conv_"):
            i = int(name.split("_")[1])
            bb_keys.append(f"visumodel.module_list.{i}.conv_{i}.weight")
            if "bias" in params["visumodel"][name]:
                bb_keys.append(f"visumodel.module_list.{i}.conv_{i}.bias")
        elif name.startswith("bn_"):
            i = int(name.split("_")[1])
            for attr in ("weight", "bias", "running_mean", "running_var"):
                bb_keys.append(
                    f"visumodel.module_list.{i}.batch_norm_{i}.{attr}")
    table = _reference_key_map(bb_keys, light=light)

    inverse = {_t_lin: _t_lin, _t_conv2d: lambda v: v.transpose(3, 2, 0, 1),
               _t_conv1d: _t_conv1d, None: None}
    out: Dict[str, np.ndarray] = {}
    for key, (kind, path, transform) in table.items():
        if kind == "skip":
            continue
        node = params if kind == "params" else batch_stats
        try:
            for p in path:
                node = node[p]
        except KeyError:
            continue  # module absent in this configuration (e.g. BERT text)
        inv = inverse[transform]
        out[key] = inv(node) if inv else np.asarray(node)
    return out


def load_reference_checkpoint(path: str, state: TrainState,
                              light: bool = False,
                              strict: bool = True) -> Tuple[TrainState, ConversionReport]:
    """Load a reference `.pth.tar` checkpoint file (either a bare state_dict
    or the {epoch, state_dict, best_loss, optimizer} wrapper of
    train_DCNet.py:255-263) into a TrainState."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    params, stats, report = convert_reference_state_dict(
        sd, state.params, state.batch_stats, light=light, strict=strict)
    return state.replace(params=params, batch_stats=stats), report
