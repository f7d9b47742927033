"""Training entry point.

TPU-native replacement for `python -m torch.distributed.launch ...
train_DCNet.py` (`/root/reference/train_DCNet.py:334-560` and README.md:34):
one process drives the whole data-parallel mesh; no launcher needed.

Example (data-free smoke):
    python -m dcnet_tpu.cli.train --synthetic --lstm --mini \
        --size 64 --batch_size 2 --nb_epoch 2 --max_steps 4
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from dcnet_tpu.cli.common import (
    base_parser, build_dataset, build_model, config_from_args,
    setup_logging, splice_backbone_weights,
)
from dcnet_tpu.data.vid import batch_iterator
from dcnet_tpu.parallel import make_mesh, replicate_state, shard_batch
from dcnet_tpu.train.checkpoint import (
    load_pretrain, restore_checkpoint, save_checkpoint,
)
from dcnet_tpu.train.loop import flatten_clip_batch, train_epoch, validate
from dcnet_tpu.train.state import create_train_state


def main(argv=None):
    args = base_parser("dcnet_tpu training").parse_args(argv)
    if args.multihost:
        # multi-host pod bootstrap — the torch.distributed.launch analog;
        # per-host input sharding comes from batch_iterator(num_shards=...)
        jax.distributed.initialize()
    if args.savename == "default":
        args.savename = f"model_{args.dataset}_batch{args.batch_size}"
    setup_logging(args.savename, test=False)
    log = logging.getLogger("dcnet_tpu")

    train_ds, corpus = build_dataset(args, "train")
    val_ds, _ = build_dataset(args, "test")
    cfg = config_from_args(args, corpus_size=len(corpus))
    model = build_model(args, cfg)

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_data=n_dev)
    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)

    sample = train_ds[0]
    sample_batch = {
        "images": np.broadcast_to(
            sample["images"], (2, *sample["images"].shape)).reshape(
                -1, *sample["images"].shape[1:]),
        "word_ids": np.broadcast_to(
            sample["word_ids"], (2, *sample["word_ids"].shape)).reshape(
                -1, sample["word_ids"].shape[-1]),
    }
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed),
        steps_per_epoch=steps_per_epoch, sample_batch=sample_batch)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = splice_backbone_weights(args, variables)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    start_epoch, best_acc = 0, -float("inf")
    ckpt_dir = f"./saved_models/{args.savename}"
    if args.auto_resume and not args.resume:
        # crash-recovery restart (the reference requires manual --resume;
        # SURVEY.md §5 "failure detection: none")
        try:
            state, start_epoch, best_acc = restore_checkpoint(ckpt_dir, state)
            print(f"=> auto-resumed from {ckpt_dir} at epoch {start_epoch}")
        except FileNotFoundError:
            pass
    if args.resume:
        state, start_epoch, best_acc = restore_checkpoint(args.resume, state)
        print(f"=> resumed from {args.resume} at epoch {start_epoch}")
    elif args.pretrain:
        state = load_pretrain(args.pretrain, state)
        print(f"=> loaded pretrain weights from {args.pretrain}")

    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(state.params))
    print(f"Num of parameters: {n_params}")
    log.info("Num of parameters:%d", n_params)

    # preemption-safe shutdown: TPU VMs get SIGTERM before eviction; save a
    # checkpoint at the next epoch boundary and exit cleanly so
    # --auto_resume continues the run (the reference loses everything since
    # its last manual save, SURVEY.md §5 "failure recovery: none")
    import signal
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"=> received signal {signum}; will checkpoint and exit "
              f"at the epoch boundary")

    for sig in (signal.SIGTERM, signal.SIGUSR1):
        try:
            signal.signal(sig, _request_stop)
        except (ValueError, OSError):  # non-main thread / unsupported
            pass

    with mesh:
        state = replicate_state(mesh, state)
        put = lambda b: shard_batch(mesh, b)  # noqa: E731
        rng = jax.random.PRNGKey(cfg.seed + 100)

        if args.profile_dir:
            # capture a device trace of 3 steps (1 compile + 2 steady-state);
            # the reference has no profiler at all (SURVEY.md §5)
            from dcnet_tpu.train.step import train_step
            from dcnet_tpu.utils.profiling import device_trace
            prof_batches = batch_iterator(train_ds, cfg.batch_size,
                                          shuffle=True, seed=cfg.seed)
            pbatch = put(flatten_clip_batch(next(iter(prof_batches))))
            pstate = state
            with device_trace(args.profile_dir):
                for _ in range(3):
                    pstate, pmetrics = train_step(model, cfg, pstate,
                                                  pbatch, rng)
                np.asarray(pmetrics["loss"])
            print(f"=> wrote device trace to {args.profile_dir}")
        max_steps = args.max_steps or None
        from dcnet_tpu.data.vid import prefetch_to_device
        from dcnet_tpu.parallel.mesh import batch_sharding
        # per-host input sharding (DistributedSampler analog): each process
        # draws its own slice of the global batch, reassembled on the mesh
        # by place_host_batch
        n_hosts, host = jax.process_count(), jax.process_index()
        per_host_bs = max(cfg.batch_size // n_hosts, 1)
        for epoch in range(start_epoch, cfg.nb_epoch):
            train_ds.set_epoch(epoch)
            batches = prefetch_to_device(
                map(flatten_clip_batch,
                    batch_iterator(train_ds, per_host_bs, shuffle=True,
                                   seed=cfg.seed + epoch,
                                   num_shards=n_hosts, shard_index=host,
                                   num_workers=args.workers)),
                size=2, sharding=batch_sharding(mesh))
            state = train_epoch(model, cfg, state, batches, rng, epoch,
                                print_freq=args.print_freq,
                                max_steps=max_steps,
                                should_stop=lambda: stop_requested["flag"])
            val_batches = batch_iterator(
                val_ds, per_host_bs, num_shards=n_hosts, shard_index=host,
                num_workers=args.workers)
            result = validate(model, cfg, state, val_batches,
                              device_put=put, max_steps=max_steps)
            print(f"accu {result['acc50']:.4f} miou {result['miou']:.4f}")
            best_acc = max(best_acc, result["acc50"])
            save_checkpoint(ckpt_dir, jax.device_get(state), epoch, best_acc)
            log.info("Best Accu: %f", best_acc)
            if stop_requested["flag"]:
                print(f"=> checkpointed epoch {epoch}; exiting on signal")
                break
    return state


if __name__ == "__main__":
    main()
