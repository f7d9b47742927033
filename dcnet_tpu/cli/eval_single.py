"""Single-image grounding evaluation (ReferIt / Flickr / RefCOCO / OTB).

The reference evaluates these through the same validate/test loops with the
single-image loader (`/root/reference/dataset/referit_loader.py`,
`train_DCNet.py:728-846`). Here the correspondence-free baseline trunk
(`grounding_model_semantic_attn.py`) runs per image — BASELINE.json
config 1 (batch 1 on CPU) works with `DCNET_PLATFORM=cpu --batch_size 1`.

Example (data-free smoke):
    python -m dcnet_tpu.cli.eval_single --synthetic --lstm --mini --size 64
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dcnet_tpu.cli.common import (
    base_parser, build_model, config_from_args, setup_logging,
    splice_backbone_weights,
)
from dcnet_tpu.data.corpus import Corpus
from dcnet_tpu.data.vid import batch_iterator
from dcnet_tpu.eval.metrics import AverageMeter
from dcnet_tpu.eval.visualize import save_grounding_results
from dcnet_tpu.models.dcnet import DCNet
from dcnet_tpu.ops.boxes import bbox_iou
from dcnet_tpu.ops.decode import decode_best, inverse_letterbox
from dcnet_tpu.train.checkpoint import restore_checkpoint
from dcnet_tpu.train.state import create_train_state


def _build_single_dataset(args):
    if args.synthetic:
        # reuse synthetic clips, taking single frames
        from dcnet_tpu.cli.common import build_dataset
        ds, corpus = build_dataset(args, "test", testmode=True, num_frame_k=1)
        return ds, corpus
    from dcnet_tpu.data.referit import ReferItDataset
    index = os.path.join(args.split_root, args.dataset,
                         f"{args.dataset}_test.pth")
    if not os.path.exists(index):
        index = index.replace(".pth", ".json")
    corpus_path = os.path.join(args.split_root, args.dataset, "corpus.pth")
    if os.path.exists(corpus_path):
        from dcnet_tpu.data.corpus import load_reference_corpus
        corpus = load_reference_corpus(corpus_path)
    else:
        corpus = Corpus.load(corpus_path.replace(".pth", ".json"))
    tok = None
    if not args.lstm:
        from dcnet_tpu.data.bert_tokenize import get_bert_tokenizer
        tok = get_bert_tokenizer(args.bert_model)
    ds = ReferItDataset(index, corpus if args.lstm else None,
                        dataset=args.dataset, imsize=args.size,
                        max_query_len=args.time, testmode=True,
                        image_root=args.data_root, bert_tokenizer=tok)
    return ds, corpus


def main(argv=None):
    parser = base_parser("dcnet_tpu single-image grounding eval")
    parser.add_argument("--save_plot", action="store_true")
    args = parser.parse_args(argv)
    args.test = True
    if args.savename == "default":
        args.savename = f"model_{args.dataset}_batch{args.batch_size}"
    setup_logging(args.savename, test=True)

    ds, corpus = _build_single_dataset(args)
    cfg = config_from_args(args, corpus_size=len(corpus))
    model = build_model(args, cfg)

    sample = ds[0]
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), steps_per_epoch=1,
        sample_batch={
            "images": np.repeat(sample["images"][:1], 2, axis=0),
            "word_ids": np.repeat(sample["word_ids"][:1], 2, axis=0)})
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = splice_backbone_weights(args, variables)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    if args.resume:
        state, _, _ = restore_checkpoint(args.resume, state,
                                      with_opt_state=False)

    @jax.jit
    def forward(params, batch_stats, images, word_ids):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          images, word_ids, method=DCNet.single_image)
        return decode_best(out.outbox, cfg)

    acc, miou = AverageMeter(), AverageMeter()
    for i, batch in enumerate(batch_iterator(ds, args.batch_size,
                                             drop_last=False)):
        images = jnp.asarray(
            batch["images"].reshape(-1, *batch["images"].shape[2:]))
        word_ids = jnp.asarray(
            batch["word_ids"].reshape(-1, batch["word_ids"].shape[-1]))
        bbox = jnp.clip(jnp.asarray(
            batch["bbox"].reshape(-1, 4)), 0, cfg.image_size - 1)
        dec = forward(state.params, state.batch_stats, images, word_ids)
        ratio = jnp.asarray(batch["ratio"].reshape(-1))
        dw = jnp.asarray(batch["dw"].reshape(-1))
        dh = jnp.asarray(batch["dh"].reshape(-1))
        ow = (cfg.image_size - 2 * dw) / ratio
        oh = (cfg.image_size - 2 * dh) / ratio
        pred = inverse_letterbox(dec.boxes[:, 0], ratio, dw, dh, ow, oh)
        gt = inverse_letterbox(bbox, ratio, dw, dh, ow, oh)
        iou = np.asarray(bbox_iou(pred, gt))
        n = iou.shape[0]
        acc.update(float((iou > 0.5).mean()), n)
        miou.update(float(iou.mean()), n)
        if args.save_plot:
            save_grounding_results(
                np.asarray(dec.boxes[:, 0]), np.asarray(bbox),
                batch["images"].reshape(-1, *batch["images"].shape[2:]),
                sum(batch.get("phrases", [[]]), []), "test",
                i * args.batch_size,
                save_path=f"./visulizations/{args.savename}/")
    print(f"{acc.avg:.6f},{miou.avg:.6f}")
    return acc.avg


if __name__ == "__main__":
    main()
