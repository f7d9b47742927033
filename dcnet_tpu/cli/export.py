"""Checkpoint import/export between our Orbax format and the reference's
torch `.pth.tar` layout.

The reference persists `{epoch, state_dict, best_loss, optimizer}` pickles
(`/root/reference/train_DCNet.py:255-263`). This CLI converts either way so
models move freely between the two stacks:

    # our Orbax checkpoint -> reference .pth.tar
    python -m dcnet_tpu.cli.export --synthetic --lstm --mini --size 64 \
        --resume ./saved_models/run1 --out run1.pth.tar

    # reference .pth.tar -> our Orbax checkpoint
    python -m dcnet_tpu.cli.export --synthetic --lstm --mini --size 64 \
        --from_reference model.pth.tar --out ./saved_models/imported
"""

from __future__ import annotations

import jax
import numpy as np

from dcnet_tpu.cli.common import (
    base_parser, build_dataset, build_model, config_from_args,
)
from dcnet_tpu.train.checkpoint import (
    export_reference_state_dict, load_reference_checkpoint,
    restore_checkpoint, save_checkpoint,
)
from dcnet_tpu.train.state import create_train_state


def main(argv=None):
    parser = base_parser("dcnet_tpu <-> reference checkpoint converter")
    parser.add_argument("--out", required=True, type=str,
                        help="output path (.pth.tar or an Orbax ckpt dir)")
    parser.add_argument("--from_reference", default="", type=str,
                        help="ingest this reference .pth.tar instead of "
                             "exporting")
    parser.add_argument("--epoch", default=0, type=int,
                        help="epoch number recorded in the output")
    args = parser.parse_args(argv)

    ds, corpus = build_dataset(args, "test", testmode=True)
    cfg = config_from_args(args, corpus_size=len(corpus))
    model = build_model(args, cfg)

    sample = ds[0]
    k = max(cfg.n_frames_train, 2)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), steps_per_epoch=1,
        sample_batch={
            "images": np.repeat(sample["images"][:1], k, axis=0),
            "word_ids": np.repeat(sample["word_ids"][:1], k, axis=0)})

    if args.from_reference:
        state, report = load_reference_checkpoint(args.from_reference, state)
        print(f"=> converted {args.from_reference}: {report}")
        if report.untouched:
            print(f"   untouched leaves: {report.untouched[:10]}")
        save_checkpoint(args.out, jax.device_get(state), epoch=args.epoch,
                        best_acc=0.0)
        print(f"=> wrote Orbax checkpoint to {args.out}")
    else:
        import torch
        if args.resume:
            state, epoch, _ = restore_checkpoint(args.resume, state,
                                                 with_opt_state=False)
            args.epoch = args.epoch or epoch
        sd = export_reference_state_dict(state.params, state.batch_stats,
                                         light=cfg.light)
        sd_t = {kk: torch.from_numpy(np.ascontiguousarray(v))
                for kk, v in sd.items()}
        torch.save({"epoch": args.epoch, "state_dict": sd_t,
                    "best_loss": 0.0}, args.out)
        print(f"=> wrote reference-layout checkpoint "
              f"({len(sd_t)} tensors) to {args.out}")


if __name__ == "__main__":
    main()
