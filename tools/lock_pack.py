"""Pack/unpack the tiny accuracy-lock checkpoints to/from committed .npz.

Problem (round-5 verdict #5): the trained artifacts behind the accuracy-lock
tests (`saved_models/converge32*`) are gitignored and die with every VM
recycle, so on a fresh VM the quant/co-attention/stream-eval accuracy safety
net silently skips. The full locks are ~17M params (too big to commit), but a
tiny twin (emb 128, BiLSTM hidden 128 — tools/make_converge32.py --tiny) is
~1-2M trained params: small enough to commit as float16 .npz under
tests/locks/ and rehydrate into a real orbax checkpoint in seconds.

pack:   orbax ckpt dir -> tests/locks/<name>.npz
        (params + batch_stats flattened by '/'-joined path, float16;
         frozen BERT encoder params are EXCLUDED — they are random-init at a
         fixed seed and regenerate bit-identically at unpack; a fingerprint
         of them is stored and verified instead)
unpack: tests/locks/<name>.npz -> saved_models/<name>/ (a full orbax
        checkpoint the CLIs can --resume: params/batch_stats from the npz,
        a fresh optimizer state — the lock tests are eval-only)

Usage:
    python tools/lock_pack.py pack <savename> [--bert]
    python tools/lock_pack.py unpack <savename> [--bert]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOCK_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "locks")
# the frozen BERT body (BERT path only): random-init at cfg.seed, never
# trained (stop_gradient, models/bert.py BertEncoder), so it regenerates
# exactly instead of being stored. NOTE: textmodel/proj is OUTSIDE the
# stop_gradient and trains — it must be stored, hence the /bert suffix.
FROZEN_PREFIX = "textmodel/bert"


def tiny_argv(bert: bool) -> list:
    """The tiny-lock recipe, shared by training, packing and the lock tests
    (emb/hidden 256 instead of 512; everything else == converge32b).
    256 is the smallest geometry that still grounds: the first cut (128)
    underfit even the train split (test acc50 0.0, miou 0.033 vs the
    full lock's ~0.41) — committed negative, BENCH_RAW_r5.md."""
    argv = ["--synthetic", "--mini", "--size", "64",
            "--emb_size", "256", "--lstm_hidden", "256",
            "--batch_size", "8", "--seed", "13"]
    if bert:
        argv += ["--bert_model", "bert-mini"]
    else:
        argv += ["--lstm"]
    return argv


def _flatten(tree, prefix=""):
    out = {}
    if hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _build_state(savename: str, bert: bool):
    """Build the tiny model + fresh TrainState exactly as the CLIs would."""
    import jax

    from dcnet_tpu.cli.common import base_parser, config_from_args, build_model
    from dcnet_tpu.data.synthetic import build_synthetic_corpus
    from dcnet_tpu.train.state import create_train_state

    args = base_parser("lock_pack").parse_args(
        tiny_argv(bert) + ["--savename", savename])
    corpus = build_synthetic_corpus()
    cfg = config_from_args(args, corpus_size=len(corpus))
    model = build_model(args, cfg)
    sample = {"images": np.zeros((2, cfg.image_size, cfg.image_size, 3),
                                 np.float32),
              "word_ids": np.zeros((2, cfg.query_len), np.int32)}
    # 24 steps/epoch matches the converge32 recipe (32 videos / batch 8 * 6
    # chunk starts); only the schedule shape depends on it, not the params
    return create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                              steps_per_epoch=24, sample_batch=sample)


def _frozen_fingerprint(flat: dict) -> list:
    """Order-stable digest of the frozen encoder params (sum/absmax per
    leaf) — cheap to verify at unpack without storing the weights."""
    fp = []
    for k in sorted(flat):
        if k.startswith(FROZEN_PREFIX):
            v = flat[k].astype(np.float64)
            fp.append([k, float(v.sum()), float(np.abs(v).max())])
    return fp


def pack(savename: str, bert: bool) -> str:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join("saved_models", savename))
    mngr = ocp.CheckpointManager(ckpt_dir)
    step = mngr.latest_step()
    assert step is not None, f"no checkpoint in {ckpt_dir}"
    restored = mngr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(),
        batch_stats=ocp.args.StandardRestore(),
        meta=ocp.args.JsonRestore()))
    params = _flatten(restored["params"])
    bstats = _flatten(restored["batch_stats"])
    arrays = {}
    for k, v in params.items():
        if bert and k.startswith(FROZEN_PREFIX):
            continue  # regenerated at unpack (random-init, frozen)
        arrays[f"params/{k}"] = v.astype(np.float16)
    for k, v in bstats.items():
        arrays[f"bstats/{k}"] = v.astype(np.float16)
    meta = dict(restored["meta"])
    meta["bert"] = bert
    if bert:
        meta["frozen_fingerprint"] = _frozen_fingerprint(params)
    os.makedirs(LOCK_DIR, exist_ok=True)
    path = os.path.join(LOCK_DIR, f"{savename}.npz")
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    print(f"packed {ckpt_dir} (epoch {step}) -> {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB)")
    return path


def unpack(savename: str, bert: bool) -> str:
    """Rehydrate saved_models/<savename> from tests/locks/<savename>.npz."""
    import jax

    from dcnet_tpu.train.checkpoint import save_checkpoint

    path = os.path.join(LOCK_DIR, f"{savename}.npz")
    z = np.load(path)
    meta = json.loads(str(z["__meta__"]))
    state = _build_state(savename, bert)

    def rebuild(template, stored_prefix):
        flat_t = _flatten(template)
        out = {}
        for k in flat_t:
            sk = f"{stored_prefix}/{k}"
            if sk in z.files:
                out[k] = z[sk].astype(flat_t[k].dtype)
            elif bert and k.startswith(FROZEN_PREFIX):
                out[k] = flat_t[k]  # frozen encoder: fresh seed-13 init
            else:
                raise KeyError(f"{sk} missing from {path}")
        # unflatten '/'-joined paths back into nested dicts
        tree = {}
        for k, v in out.items():
            node, parts = tree, k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return tree

    params = rebuild(state.params, "params")
    if bert:
        got = _frozen_fingerprint(_flatten(params))
        want = meta.get("frozen_fingerprint", [])
        for (gk, gs, gm), (wk, ws, wm) in zip(got, want):
            assert gk == wk and abs(gs - ws) < 1e-3 and abs(gm - wm) < 1e-6, (
                f"frozen BERT init drifted at {gk}: the committed lock was "
                "packed against a different seed-13 init — re-train with "
                "tools/make_converge32.py --tiny and re-pack")
    bstats = rebuild(state.batch_stats, "bstats")
    state = state.replace(
        params=params, batch_stats=bstats,
        step=jax.numpy.asarray(meta.get("step", 0), jax.numpy.int32))
    ckpt_dir = os.path.abspath(os.path.join("saved_models", savename))
    save_checkpoint(ckpt_dir, state, epoch=meta["epoch"],
                    best_acc=meta.get("best_acc", 0.0))
    print(f"unpacked {path} -> {ckpt_dir} (epoch {meta['epoch']})")
    return ckpt_dir


if __name__ == "__main__":
    cmd, name = sys.argv[1], sys.argv[2]
    is_bert = "--bert" in sys.argv
    {"pack": pack, "unpack": unpack}[cmd](name, is_bert)
