"""Regenerate the trained artifacts behind the accuracy-lock tests.

Produces (all gitignored, so a wiped workspace can restore them):
  data/synthetic32/            32-video synthetic VID corpus (seed 13 —
                               byte-identical regeneration, verified)
  saved_models/converge32b/    30-epoch trained checkpoint (mini backbone,
                               LSTM, 64px, clip k=2, batch 8 -> 24
                               steps/epoch, step 720 at epoch 29)
  saved_models/converge32bert/ the BERT-path twin (--bert): frozen
                               bert-mini encoder (models/bert.py), same
                               data/recipe — the accuracy lock for the
                               BERT trunk (BASELINE config 4)

Usage:
    python tools/make_converge32.py              # TPU: ~45 min (LSTM lock)
    python tools/make_converge32.py --bert       # TPU: BERT lock only
    DCNET_PLATFORM=cpu python tools/make_converge32.py   # CPU: ~75 min
    DCNET_PLATFORM=cpu python tools/make_converge32.py --tiny [--bert]
        # CPU-tier lock (emb/hidden 256): trains saved_models/converge32tiny
        # (or converge32tinybert) AND packs it to tests/locks/<name>.npz via
        # tools/lock_pack.py — the committed artifact that keeps the
        # accuracy-lock tests armed on a fresh VM (round-5 verdict #5)

Then the skipif-gated locks run:
    python -m pytest tests/test_cli.py -q -k \
        'stream_eval_matches_standard or quant_eval_close_to_fp or bert'

Expected end-of-train metrics (round-2 reference run, LSTM): accu 0.419,
mean_iu ~0.414 on the synthetic test split; BERT (round 4): accu ~0.31,
mean_iu ~0.33. Small run-to-run drift is fine — the locks assert
equivalences (stream==standard, int8~=fp), not absolute accuracy,
requiring only miou > 0.05.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA_ROOT = "data/synthetic32"
SAVENAME = "converge32b"
BERT_SAVENAME = "converge32bert"
SEED = 13
NUM_VIDEOS = 32
FRAMES_PER_VIDEO = 8


def make_dataset() -> None:
    from dcnet_tpu.data.synthetic import generate_synthetic_vid

    for split in ("train", "test"):
        p = generate_synthetic_vid(
            DATA_ROOT, split, num_videos=NUM_VIDEOS,
            frames_per_video=FRAMES_PER_VIDEO, seed=SEED)
        print(f"wrote {p}")


def patched_build_dataset(args, split, testmode=False, num_frame_k=None):
    """Route the train CLI's synthetic mode at the persistent corpus
    (mirrors tests/test_cli.py::_patched_build_dataset)."""
    from dcnet_tpu.data.synthetic import build_synthetic_corpus
    from dcnet_tpu.data.vid import VIDDataset

    index = os.path.join(DATA_ROOT, f"VID_video_level_{split}.json")
    corpus = build_synthetic_corpus()
    k = num_frame_k if num_frame_k is not None else args.num_frame_k
    ds = VIDDataset(index, corpus, split=split, imsize=args.size,
                    num_frame_k=k, max_query_len=args.time,
                    testmode=testmode, image_root=DATA_ROOT, seed=args.seed)
    return ds, corpus


def train() -> None:
    import dcnet_tpu.cli.train as tmod

    tmod.build_dataset = patched_build_dataset
    tmod.main([
        "--synthetic", "--lstm", "--mini", "--size", "64",
        "--batch_size", "8", "--nb_epoch", "30", "--auto_resume",
        "--seed", str(SEED), "--savename", SAVENAME,
    ])


def train_bert() -> None:
    """BERT-path twin of the LSTM lock: frozen bert-mini encoder, same
    corpus/recipe. Trains the trunk on fixed random-init BERT features
    (the reference freezes BERT too, DCNet_model.py:483-484 — only the
    sentence feature is detached there; we freeze the whole encoder)."""
    import dcnet_tpu.cli.train as tmod

    tmod.build_dataset = patched_build_dataset
    tmod.main([
        "--synthetic", "--mini", "--size", "64",
        "--bert_model", "bert-mini",
        "--batch_size", "8", "--nb_epoch", "30", "--auto_resume",
        "--seed", str(SEED), "--savename", BERT_SAVENAME,
    ])


def train_tiny(bert: bool) -> None:
    """CPU-tier lock: the converge32 recipe at emb/hidden 256 (~4M trained
    params), then packed to tests/locks/ so a fresh VM rehydrates it in
    seconds instead of re-training (see tools/lock_pack.py)."""
    import dcnet_tpu.cli.train as tmod
    from lock_pack import pack, tiny_argv

    name = "converge32tinybert" if bert else "converge32tiny"
    tmod.build_dataset = patched_build_dataset
    tmod.main(tiny_argv(bert) + [
        "--nb_epoch", "30", "--auto_resume", "--savename", name])
    pack(name, bert)


if __name__ == "__main__":
    make_dataset()
    if "--dataset_only" in sys.argv:
        sys.exit(0)
    if "--tiny" in sys.argv:
        train_tiny(bert="--bert" in sys.argv)
        sys.exit(0)
    if "--bert" in sys.argv:
        train_bert()
        print(f"done: saved_models/{BERT_SAVENAME} + {DATA_ROOT}")
        sys.exit(0)
    train()
    print(f"done: saved_models/{SAVENAME} + {DATA_ROOT}")
