"""Shared CLI plumbing for the train/test/post-process entry points.

Mirrors the ~30 argparse flags duplicated across the reference scripts
(`/root/reference/train_DCNet.py:335-375`, `test_DCNet.py:140-179`) and
maps them onto one `DCNetConfig`. Extra TPU-native flags: --synthetic
(data-free run on generated clips), --mini (tiny backbone smoke),
--devices (data-parallel mesh size).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional, Tuple

import jax

# DCNET_PLATFORM=cpu forces the host backend (this image's axon
# sitecustomize overrides the standard JAX_PLATFORMS env var).
# DCNET_CPU_DEVICES=N provisions a virtual N-device CPU mesh (XLA_FLAGS is
# likewise ignored once the sitecustomize has run).
if os.environ.get("DCNET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DCNET_PLATFORM"])
if os.environ.get("DCNET_CPU_DEVICES"):
    jax.config.update("jax_num_cpu_devices",
                      int(os.environ["DCNET_CPU_DEVICES"]))


from dcnet_tpu.config import DCNetConfig
from dcnet_tpu.data.corpus import Corpus
from dcnet_tpu.data.synthetic import build_synthetic_corpus, generate_synthetic_vid
from dcnet_tpu.data.vid import VIDDataset
from dcnet_tpu.models import DCNet
from dcnet_tpu.models.darknet import (
    load_darknet_weights, mini_backbone_defs, yolov3_layer_defs,
)


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--workers", default=8, type=int)
    p.add_argument("--nb_epoch", default=100, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--power", default=0.9, type=float, help="lr poly power")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--size", default=256, type=int)
    p.add_argument("--anchor_imsize", default=416, type=int)
    p.add_argument("--data_root", default="./ln_data/", type=str)
    p.add_argument("--split_root", default="data", type=str)
    p.add_argument("--dataset", default="VID", type=str)
    p.add_argument("--time", default=20, type=int, help="max query length")
    p.add_argument("--emb_size", default=512, type=int)
    p.add_argument("--lstm_hidden", default=512, type=int,
                   help="BiLSTM hidden size; the word embedding width "
                        "follows it. 512 matches the reference "
                        "(DCNet_model.py:240). Smaller values give the "
                        "CPU-trainable tiny accuracy lock "
                        "(tools/make_converge32.py --tiny)")
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--pretrain", default="", type=str)
    p.add_argument("--optimizer", default="RMSprop", type=str)
    p.add_argument("--print_freq", "-p", default=100, type=int)
    p.add_argument("--savename", default="default", type=str)
    p.add_argument("--seed", default=13, type=int)
    p.add_argument("--bert_model", default="bert-base-uncased", type=str)
    p.add_argument("--test", action="store_true")
    p.add_argument("--light", action="store_true")
    p.add_argument("--lstm", action="store_true")
    p.add_argument("--num_frame_k", default=2, type=int)
    p.add_argument("--backbone_weights", default="", type=str,
                   help="darknet .weights file for backbone init")
    # TPU-native extras
    p.add_argument("--synthetic", action="store_true",
                   help="generate synthetic clips (no dataset needed)")
    p.add_argument("--mini", action="store_true",
                   help="tiny backbone for smoke runs")
    p.add_argument("--devices", default=0, type=int,
                   help="data-parallel devices (0 = all)")
    p.add_argument("--max_steps", default=0, type=int,
                   help="cap steps per epoch (0 = no cap)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the run's checkpoint dir if present")
    p.add_argument("--profile_dir", default="", type=str,
                   help="capture a jax.profiler device trace of a few train "
                        "steps into this dir (view with TensorBoard/XProf)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pod)")
    return p


def setup_logging(savename: str, test: bool) -> None:
    os.makedirs("./logs", exist_ok=True)
    suffix = "_test" if test else ""
    logging.basicConfig(
        level=logging.DEBUG, filename=f"./logs/{savename}{suffix}",
        filemode="a+", format="%(asctime)-15s %(levelname)-8s %(message)s")


def config_from_args(args, corpus_size: int = 0) -> DCNetConfig:
    return DCNetConfig(
        dataset=args.dataset,
        image_size=args.size,
        anchor_imsize=args.anchor_imsize,
        emb_size=args.emb_size,
        query_len=args.time,
        n_frames_train=args.num_frame_k if not args.test else 2,
        n_frames_test=args.num_frame_k if args.test else 5,
        light=args.light,
        use_lstm=args.lstm,
        lstm_hidden=args.lstm_hidden,
        word_embedding_size=args.lstm_hidden,
        bert_model=args.bert_model,
        corpus_size=corpus_size,
        lr=args.lr,
        poly_power=args.power,
        nb_epoch=args.nb_epoch,
        batch_size=args.batch_size,
        optimizer=args.optimizer.lower(),
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )


def build_dataset(args, split: str, testmode: bool = False,
                  num_frame_k: Optional[int] = None
                  ) -> Tuple[VIDDataset, Corpus]:
    k = num_frame_k if num_frame_k is not None else args.num_frame_k
    if args.synthetic:
        root = os.path.join(args.split_root, "synthetic")
        os.makedirs(root, exist_ok=True)
        index = os.path.join(root, f"VID_video_level_{split}.json")
        if not os.path.exists(index):
            generate_synthetic_vid(
                root, split, num_videos=8, frames_per_video=8, seed=args.seed)
        corpus = build_synthetic_corpus()
        tok = None
        if not args.lstm:
            from dcnet_tpu.data.bert_tokenize import get_bert_tokenizer
            tok = get_bert_tokenizer(args.bert_model)
        ds = VIDDataset(index, corpus if args.lstm else None, split=split,
                        imsize=args.size, num_frame_k=k,
                        max_query_len=args.time, testmode=testmode,
                        image_root=root, seed=args.seed, bert_tokenizer=tok)
        return ds, corpus
    # real VID layout (reference paths, vid_loader.py:270)
    index = os.path.join(args.split_root, args.dataset,
                         f"VID_video_level_{split}.pth")
    if not os.path.exists(index):
        alt = index.replace(".pth", ".json")
        index = alt if os.path.exists(alt) else index
    corpus_path = os.path.join(args.split_root, args.dataset, "corpus.pth")
    if os.path.exists(corpus_path):
        from dcnet_tpu.data.corpus import load_reference_corpus
        corpus = load_reference_corpus(corpus_path)
    elif os.path.exists(corpus_path.replace(".pth", ".json")):
        corpus = Corpus.load(corpus_path.replace(".pth", ".json"))
    elif not args.lstm:
        corpus = Corpus()  # BERT path tokenizes with its own vocab
    else:
        raise FileNotFoundError(corpus_path)
    tokenizer = None
    if not args.lstm:
        from dcnet_tpu.data.bert_tokenize import get_bert_tokenizer
        tokenizer = get_bert_tokenizer(args.bert_model)
    ds = VIDDataset(index, corpus if args.lstm else None, split=split,
                    imsize=args.size, num_frame_k=k,
                    max_query_len=args.time, testmode=testmode,
                    image_root=args.data_root, seed=args.seed,
                    bert_tokenizer=tokenizer)
    return ds, corpus


def build_model(args, cfg: DCNetConfig):
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    defs = mini_backbone_defs() if args.mini else None
    model = DCNet(cfg=cfg, dtype=dtype, backbone_defs=defs)
    return model


def splice_backbone_weights(args, variables):
    """Load darknet .weights into the initialized variables
    (the reference does this inside grounding_model.__init__,
    DCNet_model.py:234-235)."""
    if not args.backbone_weights or args.mini:
        return variables
    defs = yolov3_layer_defs()
    loaded, _ = load_darknet_weights(defs, args.backbone_weights)
    variables = jax.device_get(variables)
    variables["params"]["visumodel"] = loaded["params"]
    variables["batch_stats"]["visumodel"] = loaded["batch_stats"]
    return variables
