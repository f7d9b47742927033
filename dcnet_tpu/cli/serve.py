"""Streaming serving entry point: drive the GroundingEngine as a process.

The reference has no serving layer at all (SURVEY.md §1/§5 — its closest
analog is re-running `test_DCNet.py --cache` + `post_processing.py`
offline). This CLI operationalizes the TPU-native engine
(`serving/engine.py`): N concurrent video streams, each with its own
referring phrase, one jitted step per frame tick, per-stream temporal
fusion in-program, optional int8 backbone+trunk and AOT bundle export.

Modes:
  --synthetic          generate N procedural streams (data-free demo/smoke)
  --frames_root DIR    serve real frame directories: DIR/<stream>/*.jpg,
                       phrases from DIR/<stream>/phrase.txt
  --export_bundle DIR  after warmup, export the AOT StableHLO bundle and
                       exit (deployment artifact; docs/DEPLOYMENT.md)

Example (data-free smoke):
    python -m dcnet_tpu.cli.serve --synthetic --lstm --mini --size 64 \
        --n_streams 4 --ticks 8
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dcnet_tpu.cli.common import (
    base_parser, build_model, config_from_args, setup_logging,
    splice_backbone_weights,
)
from dcnet_tpu.models.dcnet import DCNet
from dcnet_tpu.serving.engine import (
    GroundingEngine, cast_params_for_serving, load_stream_state,
    save_stream_state,
)


def _parser():
    p = base_parser("dcnet_tpu streaming serving")
    p.add_argument("--n_streams", default=8, type=int,
                   help="concurrent streams per chip. Use a MULTIPLE OF 8 "
                        "in production (TPU sublane padding: 140 streams "
                        "measured 12%% below 120; v5e throughput peak is "
                        "120 — docs/DEPLOYMENT.md)")
    p.add_argument("--ticks", default=32, type=int,
                   help="frame ticks to serve (0 = until streams run dry)")
    p.add_argument("--topk", default=5, type=int)
    p.add_argument("--fuse_window", default=5, type=int)
    p.add_argument("--frames_root", default="", type=str,
                   help="serve real streams: <root>/<stream>/*.jpg + "
                        "phrase.txt per stream dir")
    p.add_argument("--quant", action="store_true",
                   help="int8 backbone + trunk (engine.quantize)")
    p.add_argument("--cast_params", action="store_true",
                   help="bf16 weights (cast_params_for_serving)")
    p.add_argument("--export_bundle", default="", type=str,
                   help="write the AOT serving bundle here and exit")
    p.add_argument("--state_file", default="", type=str,
                   help="resume stream state from / checkpoint it to this "
                        ".npz periodically (preemption-safe serving)")
    p.add_argument("--state_every", default=16, type=int,
                   help="attempt a stream-state checkpoint every N ticks "
                        "(plus a synchronous one at exit). Writes are "
                        "ASYNC with in-flight skip: at 80 streams/256px "
                        "the full state is ~1.0 GB and takes ~58 s to "
                        "serialize (measured, BENCH_NOTES round 4) — "
                        "~1,900 steps' worth — so the loop only snapshots "
                        "when the previous write finished; effective "
                        "checkpoint cadence at that scale is ~1/min")
    p.add_argument("--print_every", default=8, type=int)
    p.add_argument("--split_corr", dest="split_corr", action="store_true",
                   default=None,
                   help="A/B: force split_corr_conv ON (serving default is "
                        "OFF — the split costs the streaming step ~9%%, "
                        "queue-M adjacent pair, BENCH_NOTES round 4)")
    p.add_argument("--no_split_corr", dest="split_corr",
                   action="store_false",
                   help="explicitly keep split_corr_conv OFF (the default)")
    return p


def _synthetic_streams(args, corpus):
    """Procedural streams: one synthetic video per stream (data-free)."""
    from dcnet_tpu.data import transforms as T
    from dcnet_tpu.data.synthetic import generate_synthetic_vid

    root = os.path.join("cache", f"serve_synth_{args.n_streams}")
    index = generate_synthetic_vid(
        root, "test", num_videos=args.n_streams,
        frames_per_video=max(args.ticks, 8), seed=args.seed)
    videos = json.load(open(index))
    streams, phrases = [], []
    for vid in videos[:args.n_streams]:
        frames = []
        for path, _, phrase in vid:
            img = __import__("cv2").imread(os.path.join(root, path))[..., ::-1]
            img, *_ = T.letterbox(img, args.size)
            frames.append(T.normalize_image(img).astype(np.float32))
        streams.append(frames)
        phrases.append(phrase)
    return streams, phrases


def _dir_streams(args):
    from dcnet_tpu.data import transforms as T

    streams, phrases = [], []
    names = sorted(os.listdir(args.frames_root))[:args.n_streams]
    for name in names:
        d = os.path.join(args.frames_root, name)
        if not os.path.isdir(d):
            continue
        with open(os.path.join(d, "phrase.txt")) as f:
            phrases.append(f.read().strip())
        frames = []
        for fn in sorted(os.listdir(d)):
            if not fn.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            img = __import__("cv2").imread(os.path.join(d, fn))[..., ::-1]
            img, *_ = T.letterbox(img, args.size)
            frames.append(T.normalize_image(img).astype(np.float32))
        streams.append(frames)
    return streams, phrases


class _AsyncStateWriter:
    """Periodic stream-state checkpoints off the serving loop.

    attempt() snapshots the state to host and writes the .npz on a
    background thread — but ONLY if the previous write finished (at 80
    streams the write is ~58 s vs a ~30 ms step, so unthrottled writes
    would starve the loop; the host snapshot itself is the only blocking
    part, and it is skipped too while a write is in flight). finish()
    joins the writer and performs one final synchronous write."""

    def __init__(self, path: str):
        self.path = path
        self._thread = None

    def attempt(self, state) -> bool:
        import threading

        if self._thread is not None and self._thread.is_alive():
            return False
        host_state = jax.tree_util.tree_map(np.asarray, state)
        self._thread = threading.Thread(
            target=save_stream_state, args=(self.path, host_state),
            daemon=True)
        self._thread.start()
        return True

    def finish(self, state) -> None:
        if self._thread is not None:
            self._thread.join()
        save_stream_state(self.path, state)


def main(argv=None):
    args = _parser().parse_args(argv)
    args.test = True
    if args.savename == "default":
        args.savename = f"serve_{args.n_streams}streams"
    setup_logging(args.savename, test=True)

    if args.frames_root:
        streams, phrases = _dir_streams(args)
        from dcnet_tpu.data.corpus import Corpus
        corpus = Corpus.build(phrases)
    else:
        from dcnet_tpu.data.synthetic import build_synthetic_corpus
        corpus = build_synthetic_corpus()
        streams, phrases = _synthetic_streams(args, corpus)
    n = len(streams)
    assert n > 0, "no streams found"

    cfg = config_from_args(args, corpus_size=len(corpus))
    # split_corr_conv wins on the batched offline eval step (+2.5%) but
    # costs the streaming step ~9% (queue-M adjacent pair, BENCH_NOTES
    # round 4): serving defaults to the naive per-reference corr_conv.
    # --split_corr / --no_split_corr override for A/Bs (mirrors bench.py).
    import dataclasses
    if args.split_corr is None:
        cfg = dataclasses.replace(cfg, split_corr_conv=False)
    else:
        cfg = dataclasses.replace(cfg, split_corr_conv=args.split_corr)
    model = build_model(args, cfg)
    from dcnet_tpu.train.state import create_train_state
    from dcnet_tpu.train.checkpoint import restore_checkpoint
    sample = streams[0][0][None]
    state0 = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), steps_per_epoch=1,
        sample_batch={"images": np.concatenate([sample, sample]),
                      "word_ids": np.zeros((2, cfg.query_len), np.int32)})
    variables = {"params": state0.params, "batch_stats": state0.batch_stats}
    variables = splice_backbone_weights(args, variables)
    if args.resume:
        state0 = state0.replace(params=variables["params"],
                                batch_stats=variables["batch_stats"])
        state0, _, _ = restore_checkpoint(args.resume, state0,
                                          with_opt_state=False)
        variables = {"params": state0.params,
                     "batch_stats": state0.batch_stats}
    if args.cast_params:
        variables = cast_params_for_serving(variables)

    word_ids = np.stack([corpus.tokenize(p, cfg.query_len) for p in phrases])
    engine = GroundingEngine(model, variables, cfg, n_streams=n,
                             n_frame=args.num_frame_k
                             if args.num_frame_k > 2 else 5,
                             topk=args.topk, fuse_window=args.fuse_window)
    if args.quant:
        # trunk calibration needs >= n_frame frames total (engine.quantize
        # reshapes one clip); with few streams, take enough per stream
        per = max(4, engine.n_frame)
        calib_frames = [f for s in streams for f in s[:per]][:32]
        if len(calib_frames) < engine.n_frame:
            raise SystemExit(
                f"--quant needs >= {engine.n_frame} calibration frames "
                f"across streams, got {len(calib_frames)}")
        calib = jnp.asarray(np.stack(calib_frames))
        engine.quantize(calib, calib_word_ids=word_ids[:1])

    if args.export_bundle:
        from dcnet_tpu.serving.export import export_engine
        export_engine(engine, args.export_bundle)
        print(f"bundle written to {args.export_bundle}")
        return

    if args.state_file and os.path.exists(args.state_file):
        state = load_stream_state(args.state_file)
        print(f"resumed stream state from {args.state_file} "
              f"(frames_seen={np.asarray(state.frames_seen).tolist()})")
    else:
        state = engine.init_state(jnp.asarray(word_ids, jnp.int32))

    max_ticks = args.ticks or min(len(s) for s in streams)
    writer = _AsyncStateWriter(args.state_file) if args.state_file else None
    served = 0
    t0 = time.perf_counter()
    for t in range(max_ticks):
        frames = np.stack([s[min(t, len(s) - 1)] for s in streams])
        state, fused, raw, score = engine.step(state, frames)
        served += n
        if writer is not None and args.state_every > 0 \
                and (t + 1) % args.state_every == 0:
            writer.attempt(state)
        if (t + 1) % args.print_every == 0 or t == max_ticks - 1:
            np.asarray(fused)  # sync
            dt = time.perf_counter() - t0
            print(f"tick {t + 1}/{max_ticks}: {served / dt:.1f} "
                  f"predictions/s, stream0 fused box "
                  f"{np.asarray(fused[0]).round(1).tolist()} "
                  f"score {float(score[0]):.3f}")
    if writer is not None:
        writer.finish(state)  # join in-flight write + final sync checkpoint
    print(f"served {served} predictions over {n} streams")


if __name__ == "__main__":
    main()
