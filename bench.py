"""Benchmark: video-grounding throughput on one TPU chip.

Measures the flagship inference path — full YOLOv3 backbone + BiLSTM +
dual-correspondence trunk, 5-frame clips at 256x256 (the reference's
video-level eval config, test_DCNet.py:178,248-264) — and reports
frames/sec/chip as ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md). We normalize
against an estimated A100 reference throughput of 600 frames/s (a ~62M-param
YOLOv3 at 256px with the DCNet trunk under PyTorch eager, batch 40; same
order as public YOLOv3 A100 benchmarks). BASELINE.json's target is >5x that.

Usage: python bench.py [--smoke] [--clips N] [--iters N] [--fp32]
"""

import argparse
import json
import os
import time

import jax

if os.environ.get("DCNET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DCNET_PLATFORM"])
# Persistent compilation cache: remote-TPU compiles run 10-40 min and the
# queue scripts re-run many near-identical programs; keyed on HLO+options,
# so A/B variants miss but repeats (and a surviving VM's next session) hit.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:  # older jax without the knob: run uncached
    pass
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_FPS_ESTIMATE = 600.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + mini backbone (CPU-friendly)")
    ap.add_argument("--clips", type=int, default=None,
                    help="clip batch per step (5 frames each). Default: 64 "
                         "for the eval headline (round-3 sweet spot; 128 = "
                         "HBM OOM), 16 elsewhere")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fp32", action="store_true",
                    help="disable bfloat16 compute")
    ap.add_argument("--serving", action="store_true",
                    help="benchmark the streaming multi-query engine instead")
    ap.add_argument("--no_donate", action="store_true",
                    help="A/B: serving/train step WITHOUT state-buffer "
                         "donation (production donates rings / optimizer "
                         "state)")
    ap.add_argument("--xla_opt", action="append", default=[],
                    metavar="KEY=VAL",
                    help="XLA compiler option for the --train step, passed "
                         "via PJRT compile (axon rejects TPU flags in "
                         "XLA_FLAGS). E.g. "
                         "--xla_opt xla_tpu_scoped_vmem_limit_kib=65536")
    ap.add_argument("--coattn_batch_refs", action="store_true",
                    help="A/B: eval/serving co-attention over all "
                         "references in ONE dot_general "
                         "(cfg.coattn_batch_refs) instead of the "
                         "per-reference loop")
    ap.add_argument("--coattn_multiref", action="store_true",
                    help="A/B: eval/serving co-attention over all "
                         "references in ONE Pallas kernel reading the "
                         "feature ring in place (cfg.coattn_multiref; no "
                         "HBM logits/copies — the fix for batch_refs' "
                         "-39%%)")
    ap.add_argument("--int8_rings", action="store_true",
                    help="A/B: serving feature rings stored int8 (static "
                         "1/127 scale on l2-normalized features; halves "
                         "ring HBM vs bf16, trunk dequantizes on read)")
    ap.add_argument("--trace", action="store_true",
                    help="after timing, capture a jax.profiler device "
                         "trace of a few steady-state steps and print the "
                         "per-op summary table (utils.profiling."
                         "summarize_xplane)")
    ap.add_argument("--coattn_int8", action="store_true",
                    help="A/B: eval/serving co-attention QK logits on the "
                         "int8 MXU path (cfg.coattn_int8_logits; static "
                         "1/127 scale — inputs are l2-normalized)")
    ap.add_argument("--no_split_corr", action="store_true",
                    help="A/B: eval/serving corr_conv as the naive "
                         "per-reference concat conv instead of hoisting "
                         "the shared center half (cfg.split_corr_conv)")
    ap.add_argument("--split_corr", action="store_true",
                    help="A/B: force split_corr_conv ON for --serving "
                         "(serving defaults OFF: the queue-M adjacent "
                         "pair measured split -9%% on the streaming step, "
                         "2,683 vs 2,952 pred/s; offline eval defaults "
                         "ON, +2.5%%)")
    ap.add_argument("--shift_rings", action="store_true",
                    help="A/B: serving feature rings as a shifted buffer "
                         "(the pre-round-4 layout) instead of the rotating "
                         "single-slot write")
    ap.add_argument("--serving_breakdown", action="store_true",
                    help="time the serving step's stages separately "
                         "(extract / ring shift / trunk / cache+fusion) — "
                         "the serving analog of the train-step breakdown")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the training step instead")
    ap.add_argument("--frames", type=int, default=2,
                    help="clip length k for --train (2 = reference recipe; "
                         "8 = BASELINE config 2 read literally; k>2 uses "
                         "the ring-pairing generalization)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize backbone activations in backward")
    ap.add_argument("--single", action="store_true",
                    help="BASELINE config 1: ReferIt-style single-image "
                         "grounding, batch 1 on CPU, vs a measured torch "
                         "mirror of the reference")
    ap.add_argument("--train_mirror", action="store_true",
                    help="BASELINE config 2 vs a MEASURED torch mirror: "
                         "both run the full k=2 training step (fwd + 5-loss "
                         "+ bwd + RMSprop, same weights) on this CPU — the "
                         "train analog of --single/--video_mirror")
    ap.add_argument("--video_mirror", action="store_true",
                    help="flagship video-eval config vs a MEASURED torch "
                         "mirror baseline: both run the 5-frame eval_clip "
                         "path with the same weights on this CPU (the "
                         "video analog of --single)")
    ap.add_argument("--bert", action="store_true",
                    help="BASELINE config 4: BERT encoder variant, clip "
                         "batch 32, full dual-correspondence train forward")
    ap.add_argument("--bert_eval", action="store_true",
                    help="BASELINE config 4 EVAL path: 5-frame eval_clip "
                         "with the frozen bert-base encoder; defaults to "
                         "the eval headline's int8 backbone + trunk PTQ "
                         "(both encoder-agnostic)")
    ap.add_argument("--backbone", action="store_true",
                    help="backbone-only eval forward (step-time breakdown: "
                         "what share of the eval step is the Darknet stack)")
    ap.add_argument("--no_fused_coattn", action="store_true",
                    help="A/B: einsum co-attention instead of the Pallas "
                         "kernel")
    ap.add_argument("--cast_params", action="store_true",
                    help="serve with bf16 params (halves weight HBM reads; "
                         "eval/serving modes only)")
    ap.add_argument("--host", action="store_true",
                    help="host input pipeline only (decode+letterbox+"
                         "normalize), native C++ core vs Python/cv2")
    ap.add_argument("--quant_trunk", dest="quant_trunk", action="store_true",
                    default=None,
                    help="ALSO quantize the trunk convs (mapping/corr_conv/"
                         "fcn — cfg.trunk_quant static PTQ). Defaults on "
                         "for the eval headline when --quant is on; "
                         "--no_quant_trunk for the backbone-only-int8 A/B")
    ap.add_argument("--no_quant_trunk", dest="quant_trunk",
                    action="store_false")
    ap.add_argument("--int8_chain", dest="int8_chain", action="store_true",
                    default=None,
                    help="store sole-consumer int8-backbone activations "
                         "as int8 in HBM. Default: ON for the offline "
                         "eval headline (+1-2%% there), OFF for "
                         "--backbone (-9%%) and --serving (neutral, "
                         "2,154 vs 2,157 pred/s same-day A/B — "
                         "path-dependent, BENCH_NOTES round 3)")
    ap.add_argument("--no_int8_chain", dest="int8_chain",
                    action="store_false")
    ap.add_argument("--quant", dest="quant", action="store_true",
                    default=None,
                    help="int8 post-training-quantized backbone (static "
                         "calibrated scales; the v5e MXU int8 path is 2x "
                         "bf16 peak). DEFAULT for the eval headline — "
                         "trained-weights accuracy is within noise of "
                         "float (BENCH_NOTES.md); --no_quant for the "
                         "bf16-backbone A/B")
    ap.add_argument("--no_quant", dest="quant", action="store_false")
    args = ap.parse_args()
    if args.clips is None:
        if args.serving:
            # 24 clips -> 120 streams: the measured peak of the stream-count
            # curve (BENCH_NOTES: 80->2,952, 100->2,959, 120->3,082.5 =
            # 5.14x, 160->2,926.7 pred/s). --clips 16 for the 80-stream knee.
            args.clips = 24
        elif (args.train or args.backbone or args.bert or args.single
              or args.host or args.video_mirror or args.train_mirror):
            args.clips = 16
        else:
            args.clips = 64
    if args.int8_chain is None:
        args.int8_chain = not (args.backbone or args.serving)
    # split_corr_conv: ON for offline eval (+2.5%, queue G), OFF for the
    # streaming step (-9%, queue-M adjacent same-process pair: 2,682.7
    # split vs 2,952.4 no-split pred/s @80 streams)
    args.split_corr_conv = (args.split_corr
                            or (not args.serving and not args.no_split_corr))
    if args.quant is None:
        # default: int8 for the eval headline (the production serving
        # config); other modes opt in explicitly
        args.quant = not (args.train or args.serving or args.backbone
                          or args.bert or args.single or args.host
                          or args.smoke or args.fp32 or args.video_mirror
                          or args.train_mirror)

    if args.host:
        return bench_host_pipeline(args)
    if args.single:
        return bench_single_image(args)
    if args.video_mirror:
        return bench_video_mirror(args)
    if args.train_mirror:
        return bench_train_mirror(args)

    from dcnet_tpu.config import DCNetConfig
    from dcnet_tpu.models import DCNet
    from dcnet_tpu.models.darknet import mini_backbone_defs
    from dcnet_tpu.models.dcnet import DCNet as DCNetCls
    from dcnet_tpu.ops.decode import decode_best

    if args.bert:
        return bench_bert(args)

    size = 64 if args.smoke else 256
    clips = 2 if args.smoke else args.clips
    iters = 3 if args.smoke else args.iters
    n_frame = 5
    dtype = jnp.float32 if (args.fp32 or args.smoke) else jnp.bfloat16

    cfg = DCNetConfig(
        image_size=size, corpus_size=0 if args.bert_eval else 1000,
        use_lstm=not args.bert_eval,
        compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        n_frames_train=args.frames, remat_backbone=args.remat,
        use_fused_coattn=not args.no_fused_coattn,
        split_corr_conv=args.split_corr_conv,
        coattn_batch_refs=args.coattn_batch_refs,
        coattn_multiref=args.coattn_multiref,
        coattn_int8_logits=args.coattn_int8,
        interframe_top_k=min(30, (size // 32) ** 4),
        interframe_neg_n=min(10, (size // 32) ** 2 - 1),
        crossmodal_neg_n=min(5, (size // 32) ** 2 - 1))
    model = DCNet(cfg=cfg, dtype=dtype,
                  backbone_defs=mini_backbone_defs() if args.smoke else None)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(clips * n_frame, size, size, 3).astype(np.float32))
    vocab_hi = 30000 if args.bert_eval else 1000
    word_ids = jnp.asarray(
        rng.randint(1, vocab_hi, (clips, 20)).astype(np.int32))
    k_init = cfg.n_frames_train  # __call__ reshapes to k-frame clips
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        images[:k_init], word_ids[:1].repeat(k_init, axis=0), train=False)
    if args.cast_params and not args.train:
        from dcnet_tpu.serving.engine import cast_params_for_serving
        variables = cast_params_for_serving(variables)

    if args.train:
        # reference recipe shape: k-frame clips, batch = clips
        # (train_DCNet.py:584, README.md:34; k=2 default)
        from dcnet_tpu.train.state import create_train_state
        from dcnet_tpu.train.step import train_step, train_step_donated
        n_imgs = args.frames * clips
        batch = {
            "images": jnp.asarray(
                rng.rand(n_imgs, size, size, 3).astype(np.float32)),
            "word_ids": jnp.asarray(
                rng.randint(1, 1000, (n_imgs, 20)).astype(np.int32)),
            "bbox": jnp.asarray(np.stack([
                rng.rand(n_imgs) * 50, rng.rand(n_imgs) * 50,
                rng.rand(n_imgs) * 100 + 100, rng.rand(n_imgs) * 100 + 100,
            ], 1).astype(np.float32)),
        }
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   steps_per_epoch=1000, sample_batch=batch)

        if args.backbone:
            # train-step breakdown: backbone+mapping fwd+bwd ONLY (L2
            # pseudo-loss over the mapped features; no trunk, no losses,
            # no optimizer). full-step minus this = trunk/losses/optimizer
            # share — the profile data behind the MFU story.
            from dcnet_tpu.models.dcnet import DCNet as _D

            def bb_loss(params, batch_stats, images, carry):
                feats = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images + carry * 0.0, method=_D.extract_features)
                return sum(jnp.sum(jnp.square(f.astype(jnp.float32)))
                           for f in feats)

            bb_grad = jax.jit(jax.grad(bb_loss))
            flops = None
            try:
                compiled = bb_grad.lower(
                    state.params, state.batch_stats, batch["images"],
                    jnp.float32(0)).compile()
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                pass

            def run_bb(n):
                carry = jnp.float32(0)
                t0 = time.perf_counter()
                for _ in range(n):
                    g = bb_grad(state.params, state.batch_stats,
                                batch["images"], carry)
                    carry = jax.tree_util.tree_leaves(g)[0].ravel()[0]
                np.asarray(carry)
                return time.perf_counter() - t0

            run_bb(1)
            n_short = max(iters // 4, 1)
            t_short = run_bb(n_short)
            t_long = run_bb(iters)
            dt = max((t_long - t_short) / (iters - n_short), 1e-9)
            print(json.dumps({
                "metric": "train_backbone_fwdbwd_frames_per_sec_per_chip",
                "value": round(n_imgs / dt, 2),
                "unit": "frames/s",
                "vs_baseline": 0.0,
                "extra": {"clip_batch": clips, "n_frame": args.frames,
                          "step_ms": round(dt * 1e3, 2),
                          "step_tflops": round(flops / 1e12, 3)
                          if flops else None,
                          "mfu_pct_v5e": round(
                              flops / dt / 197e12 * 100, 1)
                          if flops else None,
                          "image_size": size,
                          "dtype": str(dtype.__name__)},
            }))
            return

        # XLA cost analysis of the whole compiled step -> honest MFU
        flops = None
        try:
            compiled = train_step.lower(model, cfg, state, batch,
                                        jax.random.PRNGKey(1)).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass

        # production config donates the state pytree (train/step.py);
        # --no_donate preserves the non-aliased A/B
        step_fn = train_step if args.no_donate else train_step_donated
        if args.xla_opt:
            # axon rejects TPU flags in XLA_FLAGS (parsed client-side);
            # compiler_options ride the PJRT compile call instead
            opts = dict(kv.split("=", 1) for kv in args.xla_opt)
            compiled = step_fn.lower(model, cfg, state, batch,
                                     jax.random.PRNGKey(1)).compile(
                compiler_options=opts)

            def step_fn(model_, cfg_, state_, batch_, key_):
                return compiled(state_, batch_, key_)

        def run_train(n, state):
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                state, m = step_fn(model, cfg, state, batch,
                                   jax.random.PRNGKey(1))
            np.asarray(m["loss"])
            return time.perf_counter() - t0, state

        _, state = run_train(1, state)  # compile
        n_short = max(iters // 4, 1)
        t_short, state = run_train(n_short, state)
        t_long, state = run_train(iters, state)
        dt_step = max((t_long - t_short) / (iters - n_short), 1e-9)
        fps = n_imgs / dt_step
        print(json.dumps({
            "metric": "train_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / (A100_REFERENCE_FPS_ESTIMATE / 3.0), 3),
            "extra": {"clip_batch": clips, "n_frame": args.frames,
                      "step_ms": round(dt_step * 1e3, 2),
                      "remat": args.remat,
                      "donate_state": not args.no_donate,
                      # v5e bf16 peak ~= 197 TFLOP/s; MFU from the XLA cost
                      # analysis of the full compiled step
                      "step_tflops": round(flops / 1e12, 3) if flops else None,
                      "mfu_pct_v5e": round(
                          flops / dt_step / 197e12 * 100, 1) if flops else None,
                      "image_size": size, "dtype": str(dtype.__name__)},
        }))
        if args.trace:
            from dcnet_tpu.utils.profiling import summarize_xplane
            logdir = f"logs/trace_train_k{args.frames}b{clips}"
            with jax.profiler.trace(logdir):
                _, state = run_train(3, state)
            print(summarize_xplane(logdir, top=15))
        return

    if args.serving:
        # streaming engine: one NEW frame per stream per step (backbone runs
        # once per frame; correspondence reuses the HBM feature ring)
        from dcnet_tpu.serving.engine import GroundingEngine
        n_streams = clips * n_frame  # same per-step pixel budget
        frames = jnp.asarray(
            rng.rand(n_streams, size, size, 3).astype(np.float32))
        sids = jnp.asarray(rng.randint(1, 1000, (n_streams, 20)).astype(np.int32))
        engine = GroundingEngine(model, variables, cfg, n_streams=n_streams,
                                 n_frame=n_frame, topk=5, fuse_window=5,
                                 donate_state=not args.no_donate,
                                 rotate_rings=not args.shift_rings,
                                 int8_rings=args.int8_rings,
                                 int8_chain=bool(args.int8_chain),
                                 compiler_options=(
                                     dict(kv.split("=", 1)
                                          for kv in args.xla_opt)
                                     if args.xla_opt else None))
        if args.quant:
            if args.quant_trunk is None:
                args.quant_trunk = True  # matches engine.quantize default
            engine.quantize(frames[:16], calib_word_ids=sids[:1],
                            trunk=bool(args.quant_trunk))
        if args.serving_breakdown:
            return bench_serving_breakdown(args, engine, frames, sids,
                                           iters, size, dtype)
        state = engine.init_state(sids)
        state, fused, _, _ = engine.step(state, frames)  # compile
        np.asarray(fused)

        def run_serving(n):
            nonlocal state
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                state, out, _, _ = engine.step(state, frames)
            np.asarray(out)
            return time.perf_counter() - t0

        # Same-day protocol IN the bench (serving-shaped programs show
        # ~25% cross-day environment variance, BENCH_NOTES round 3): repeat
        # the two-chain-length measurement and report the median with its
        # spread, so a single unlucky capture can't read as a regression.
        n_short = max(iters // 4, 1)
        reps = 1 if args.smoke else 5
        vals = []
        for _ in range(reps):
            t_short = run_serving(n_short)
            t_long = run_serving(iters)
            dt = max((t_long - t_short) / (iters - n_short), 1e-9)
            vals.append(n_streams / dt)
        fps = float(np.median(vals))
        dt_step = n_streams / fps
        print(json.dumps({
            "metric": "streaming_grounding_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
            "extra": {"n_streams": n_streams, "p50_per_frame_ms":
                      round(dt_step / n_streams * 1000, 3),
                      "repeats": reps,
                      "fps_min": round(min(vals), 1),
                      "fps_max": round(max(vals), 1),
                      "spread_pct": round(
                          (max(vals) - min(vals)) / fps * 100, 1),
                      "donate_state": not args.no_donate,
                      "rotate_rings": not args.shift_rings,
                      "split_corr_conv": args.split_corr_conv,
                      "coattn_batch_refs": args.coattn_batch_refs,
                      "coattn_multiref": args.coattn_multiref,
                      "int8_rings": args.int8_rings,
                      "int8_chain": bool(args.int8_chain),
                      "coattn_int8": args.coattn_int8,
                      "quant_int8_backbone": bool(args.quant),
                      "quant_int8_trunk": bool(args.quant
                                               and args.quant_trunk),
                      "image_size": size, "dtype": str(dtype.__name__)},
        }))
        if args.trace:
            from dcnet_tpu.utils.profiling import summarize_xplane
            logdir = f"logs/trace_serving_s{n_streams}"
            with jax.profiler.trace(logdir):
                run_serving(3)
            print(summarize_xplane(logdir, top=15))
        return

    if args.quant:
        from dcnet_tpu.ops import quant as Q
        qparams = Q.quantize_model_backbone(model, variables, images)
        defs = Q.model_layer_defs(model)
        b = clips

        if args.quant_trunk is None:
            args.quant_trunk = not args.backbone
        if args.quant_trunk:
            # static-PTQ the trunk convs too: calibrate on the float path,
            # then swap in the cfg.trunk_quant="int8" model variant
            # (params shared; only the conv executor changes)
            qcol = Q.calibrate_trunk(
                model, variables,
                lambda m, v: m.apply(v, images, word_ids, n_frame=n_frame,
                                     method=DCNetCls.eval_clip,
                                     mutable=["quant"]))
            model = Q.trunk_quant_variant(model, "int8")
            variables = {**variables, "quant": qcol}

        if args.backbone:
            # step-time breakdown: the int8 backbone + mapping alone
            @jax.jit
            def step(variables, images, word_ids, carry):
                raw = Q.backbone_apply_int8(defs, qparams,
                                            images + carry * 0.0,
                                            act_dtype=dtype,
                                            int8_chain=args.int8_chain)
                feats = model.apply(variables, raw,
                                    method=DCNetCls.map_features)
                return feats[0], sum(jnp.sum(f.astype(jnp.float32))
                                     for f in feats)
        else:
            @jax.jit
            def step(variables, images, word_ids, carry):
                images = images + carry * 0.0
                raw = Q.backbone_apply_int8(defs, qparams, images,
                                            act_dtype=dtype,
                                            int8_chain=args.int8_chain)
                mapped = model.apply(variables, raw,
                                     method=DCNetCls.map_features)
                per_frame = [f.reshape(b, n_frame, *f.shape[1:])
                             for f in mapped]
                out = model.apply(variables, per_frame, word_ids,
                                  method=DCNetCls.eval_features)
                dec = decode_best(out.outbox, cfg)
                return dec.boxes, jnp.sum(dec.score)
    elif args.backbone:
        @jax.jit
        def step(variables, images, word_ids, carry):
            feats = model.apply(variables, images + carry * 0.0,
                                method=DCNetCls.extract_features)
            return feats[0], sum(jnp.sum(f.astype(jnp.float32))
                                 for f in feats)
    else:
        @jax.jit
        def step(variables, images, word_ids, carry):
            # `carry` forces sequential dependency between iterations so the
            # remote runtime cannot overlap/elide executions — on this
            # image's tunneled TPU, block_until_ready returns before
            # execution finishes, so honest timing = chained dispatches +
            # one host fetch at the end.
            images = images + carry * 0.0
            out = model.apply(variables, images, word_ids, n_frame=n_frame,
                              method=DCNetCls.eval_clip)
            dec = decode_best(out.outbox, cfg)
            return dec.boxes, jnp.sum(dec.score)

    if args.xla_opt:
        # same PJRT-compile route as the train path (axon rejects TPU
        # flags in XLA_FLAGS): AOT-compile the eval step with the options
        opts = dict(kv.split("=", 1) for kv in args.xla_opt)
        compiled_step = step.lower(
            variables, images, word_ids,
            jnp.float32(0)).compile(compiler_options=opts)

        def step(v, im, w, c):  # noqa: F811 — intentional rebind
            return compiled_step(v, im, w, c)

    def run(n):
        carry = jnp.float32(0)
        boxes = None
        t0 = time.perf_counter()
        for _ in range(n):
            boxes, carry = step(variables, images, word_ids, carry)
        np.asarray(carry)  # host fetch: waits for the whole chain
        return time.perf_counter() - t0, boxes

    # warmup / compile (+ fetch)
    run(1)
    # two chain lengths cancel the constant tunnel round-trip exactly
    n_short = max(iters // 4, 1)
    t_short, _ = run(n_short)
    t_long, boxes = run(iters)
    dt_step = max((t_long - t_short) / (iters - n_short), 1e-9)

    fps = clips * n_frame / dt_step
    p50_clip_ms = dt_step / clips * 1000.0
    print(json.dumps({
        "metric": ("backbone_only_frames_per_sec_per_chip" if args.backbone
                   else "bert_video_eval_frames_per_sec_per_chip"
                   if args.bert_eval
                   else "video_grounding_eval_frames_per_sec_per_chip"),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
        "extra": {
            "p50_per_clip_ms": round(p50_clip_ms, 3),
            "clip_batch": clips, "n_frame": n_frame, "image_size": size,
            "dtype": str(dtype.__name__),
            "quant_int8_backbone": bool(args.quant),
            "quant_int8_trunk": bool(args.quant and args.quant_trunk),
            "int8_chain": bool(args.quant and args.int8_chain),
            "split_corr_conv": args.split_corr_conv,
            "coattn_batch_refs": args.coattn_batch_refs,
            "coattn_multiref": args.coattn_multiref,
            "coattn_int8": args.coattn_int8,
            "encoder": ("bert-base-uncased (frozen)" if args.bert_eval
                        else "BiLSTM"),
            "device": str(jax.devices()[0].platform),
        },
    }))
    if args.trace:
        from dcnet_tpu.utils.profiling import summarize_xplane
        logdir = f"logs/trace_eval_b{clips}"
        with jax.profiler.trace(logdir):
            run(3)
        print(summarize_xplane(logdir, top=15))


def bench_serving_breakdown(args, engine, frames, sids, iters, size, dtype):
    """Stage-time breakdown of the serving step via nested-prefix programs:
    A = backbone extract only; B = A + ring shift; C1 = B + correspondence
    (co-attention + corr_conv, via DCNet.corr_features); C = B + full trunk
    (eval_features + decode); D = the full step (C + top-k cache + fusion).
    Stage shares = successive differences — the serving analog of the
    train-step backbone/trunk breakdown (BENCH_NOTES)."""
    from dcnet_tpu.eval.temporal import build_frame_cache
    from dcnet_tpu.models.dcnet import DCNet as DCNetCls
    from dcnet_tpu.ops.decode import decode_best

    state = engine.init_state(sids)
    cfg = engine.cfg
    n_streams = engine.n_streams

    def stage_extract(variables, state, frames, carry):
        feats = engine._extract(variables, frames + carry * 0.0)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def _update_rings(state, feats):
        # mirror the engine's ring mode (rotate vs shift)
        if engine.rotate_rings:
            new_slot = jax.lax.rem(state.slot + 1, engine.n_frame)
            return new_slot, tuple(
                jax.lax.dynamic_update_index_in_dim(
                    r, f.astype(r.dtype), new_slot, axis=1)
                for r, f in zip(state.feat_rings, feats))
        return None, tuple(
            jnp.concatenate([r[:, 1:], f[:, None].astype(r.dtype)], axis=1)
            for r, f in zip(state.feat_rings, feats))

    def stage_rings(variables, state, frames, carry):
        feats = engine._extract(variables, frames + carry * 0.0)
        _, rings = _update_rings(state, feats)
        return sum(jnp.sum(r.astype(jnp.float32)) for r in rings)

    def stage_corr(variables, state, frames, carry):
        # prefix C1: + correspondence (co-attention + corr_conv) only —
        # times the corr half of the trunk separately from fusion/heads
        feats = engine._extract(variables, frames + carry * 0.0)
        new_slot, rings = _update_rings(state, feats)
        tmodel, tvars = engine._trunk_model_vars(variables)
        cf = tmodel.apply(tvars, rings, newest_slot=new_slot,
                          method=DCNetCls.corr_features)
        return (sum(jnp.sum(c.astype(jnp.float32)) for c in cf)
                + sum(jnp.sum(r.astype(jnp.float32)) for r in rings))

    def stage_trunk(variables, state, frames, carry):
        feats = engine._extract(variables, frames + carry * 0.0)
        new_slot, rings = _update_rings(state, feats)
        tmodel, tvars = engine._trunk_model_vars(variables)
        out = tmodel.apply(tvars, rings, state.word_ids,
                           language=state.language, newest_slot=new_slot,
                           method=DCNetCls.eval_features)
        dec = decode_best(out.outbox, cfg)
        return (jnp.sum(dec.boxes) + jnp.sum(dec.score)
                + sum(jnp.sum(r.astype(jnp.float32)) for r in rings)
                + sum(jnp.sum(c.astype(jnp.float32))
                      for c in jax.tree_util.tree_leaves(out.corr_feat)))

    def stage_full(variables, state, frames, carry):
        new_state, fused, raw, score = engine._step_impl(
            variables, state, frames + carry * 0.0)
        return (jnp.sum(fused) + jnp.sum(score)
                + sum(jnp.sum(r.astype(jnp.float32))
                      for r in new_state.feat_rings)
                + jnp.sum(new_state.cache_scores))

    names = ["extract", "ring_shift", "corr", "fusion_heads",
             "cache_fusion"]
    stages = [stage_extract, stage_rings, stage_corr, stage_trunk,
              stage_full]
    times = []
    for fn in stages:
        step = jax.jit(fn)

        def run(n):
            carry = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(n):
                carry = step(engine.variables, state, frames, carry)
            np.asarray(carry)
            return time.perf_counter() - t0

        run(1)
        n_short = max(iters // 4, 1)
        t_short = run(n_short)
        t_long = run(iters)
        times.append(max((t_long - t_short) / (iters - n_short), 1e-9))

    shares = {"extract_ms": times[0] * 1e3}
    for i in range(1, len(names)):
        shares[names[i] + "_ms"] = (times[i] - times[i - 1]) * 1e3
    print(json.dumps({
        "metric": "serving_step_breakdown_full_step_ms",
        "value": round(times[3] * 1e3, 3),
        "unit": "ms",
        "vs_baseline": 0.0,
        "extra": {**{k: round(v, 3) for k, v in shares.items()},
                  "cumulative_ms": [round(t * 1e3, 3) for t in times],
                  "n_streams": n_streams,
                  "quant_int8_backbone": engine.qparams is not None,
                  "quant_int8_trunk": engine.trunk_qcol is not None,
                  "image_size": size, "dtype": str(dtype.__name__)},
    }))


def bench_host_pipeline(args):
    """Host input pipeline: JPEG decode + letterbox + normalize at 720p,
    native C++ core (dcnet_tpu/native) vs the Python/cv2 path. No device
    work — this is the feed rate available to the train/eval steps."""
    import tempfile

    import cv2

    from dcnet_tpu import native
    from dcnet_tpu.data import transforms as T

    size = 64 if args.smoke else 256
    n_imgs = 4 if args.smoke else 40
    iters = 2 if args.smoke else 5
    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp(prefix="dcnet_hostbench_")
    paths = []
    y, x = np.mgrid[0:720, 0:1280]
    base = ((x + y) % 256).astype(np.uint8)[..., None].repeat(3, -1)
    for i in range(n_imgs):
        img = np.clip(base.astype(int)
                      + rng.randint(-20, 20, base.shape), 0, 255)
        p = os.path.join(d, f"f{i:03d}.jpg")
        cv2.imwrite(p, img.astype(np.uint8))
        paths.append(p)

    def py_batch():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            boxed, *_ = T.letterbox(img, size)
            T.normalize_image(boxed)

    def best(f, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    py_batch()
    t_py = best(py_batch, iters)
    fps_py = n_imgs / t_py
    fps_cc = None
    if native.available():
        cc = lambda: native.decode_letterbox_batch(  # noqa: E731
            paths, size, T.IMAGENET_MEAN, T.IMAGENET_STD)
        cc()
        fps_cc = n_imgs / best(cc, iters)
    fps = fps_cc or fps_py
    print(json.dumps({
        "metric": "host_input_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / fps_py, 3),  # speedup over Python path
        "extra": {"python_path_fps": round(fps_py, 1),
                  "native_fps": round(fps_cc, 1) if fps_cc else None,
                  "native": native.available(),
                  "threads": os.cpu_count(), "source": "720p JPEG",
                  "letterbox_to": size},
    }))


def bench_single_image(args):
    """BASELINE config 1: ReferIt single-image grounding (Darknet-53 + LSTM,
    256x256, batch 1 on CPU, referit_loader.py:147-340 shapes).

    The baseline here is MEASURED, not estimated: the torch mirror of the
    reference model (tests/test_reference_bridge._RefModel — exact reference
    module graph) runs the SAME weights on the same CPU."""
    import torch

    jax.config.update("jax_platforms", "cpu")  # config 1 is a CPU config
    from dcnet_tpu.config import DCNetConfig
    from dcnet_tpu.models import DCNet
    from dcnet_tpu.models.darknet import mini_backbone_defs, yolov3_layer_defs
    from dcnet_tpu.models.dcnet import DCNet as DCNetCls
    from dcnet_tpu.ops.decode import decode_best
    from dcnet_tpu.train.checkpoint import export_reference_state_dict
    from tests.test_reference_bridge import _RefModel

    size = 64 if args.smoke else 256
    iters = 3 if args.smoke else max(args.iters, 10)
    cfg = DCNetConfig(image_size=size, corpus_size=1000, dataset="referit",
                      interframe_top_k=min(30, (size // 32) ** 4),
                      interframe_neg_n=min(10, (size // 32) ** 2 - 1),
                      crossmodal_neg_n=min(5, (size // 32) ** 2 - 1))
    defs = mini_backbone_defs() if args.smoke else yolov3_layer_defs()
    model = DCNet(cfg=cfg, backbone_defs=defs)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    word_ids = jnp.asarray(rng.randint(1, 1000, (1, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        image.repeat(2, axis=0), word_ids.repeat(2, axis=0), train=False)

    @jax.jit
    def step(variables, image, word_ids, carry):
        out = model.apply(variables, image + carry * 0.0, word_ids,
                          method=DCNetCls.single_image)
        dec = decode_best(out.outbox, cfg)
        return dec.boxes, jnp.sum(dec.score)

    def run(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            _, carry = step(variables, image, word_ids, carry)
        np.asarray(carry)
        return time.perf_counter() - t0

    run(1)
    n_short = max(iters // 4, 1)
    t_short = run(n_short)
    t_long = run(iters)
    ours_ms = max((t_long - t_short) / (iters - n_short), 1e-9) * 1e3

    # torch mirror, same weights, eval mode, single thread count left default
    sd = export_reference_state_dict(variables["params"],
                                     variables["batch_stats"])
    ref = _RefModel(cfg, defs=defs).eval()
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    t_img = torch.from_numpy(np.asarray(image).transpose(0, 3, 1, 2))
    t_ids = torch.from_numpy(np.asarray(word_ids, np.int64))
    with torch.no_grad():
        ref.single_image(t_img, t_ids)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            ref.single_image(t_img, t_ids)
        torch_ms = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({
        "metric": "single_image_grounding_latency_cpu_batch1",
        "value": round(ours_ms, 2),
        "unit": "ms",
        "vs_baseline": round(torch_ms / ours_ms, 3),  # speedup over torch
        "extra": {"torch_reference_ms": round(torch_ms, 2),
                  "image_size": size, "dtype": "float32",
                  "baseline": "measured torch mirror, same weights/CPU"},
    }))


def bench_video_mirror(args):
    """Flagship video-eval config vs a MEASURED baseline: our jitted
    eval_clip and the torch mirror of the reference model
    (tests/test_reference_bridge._RefModel.eval_clip — exact reference
    module graph, /root/reference/model/test_DCNet_model.py:284-483
    semantics) run the SAME weights on the same CPU. This grounds the
    headline's vs_baseline in a measurement, like --single does for
    BASELINE config 1; the A100 figure remains a labeled estimate."""
    import torch

    jax.config.update("jax_platforms", "cpu")
    from dcnet_tpu.config import DCNetConfig
    from dcnet_tpu.models import DCNet
    from dcnet_tpu.models.darknet import mini_backbone_defs, yolov3_layer_defs
    from dcnet_tpu.models.dcnet import DCNet as DCNetCls
    from dcnet_tpu.ops.decode import decode_best
    from dcnet_tpu.train.checkpoint import export_reference_state_dict
    from tests.test_reference_bridge import _RefModel

    size = 64 if args.smoke else 256
    iters = 2 if args.smoke else max(args.iters // 4, 4)
    n_frame = 5
    cfg = DCNetConfig(image_size=size, corpus_size=1000,
                      interframe_top_k=min(30, (size // 32) ** 4),
                      interframe_neg_n=min(10, (size // 32) ** 2 - 1),
                      crossmodal_neg_n=min(5, (size // 32) ** 2 - 1))
    defs = mini_backbone_defs() if args.smoke else yolov3_layer_defs()
    model = DCNet(cfg=cfg, backbone_defs=defs)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(n_frame, size, size, 3).astype(np.float32))
    word_ids = jnp.asarray(rng.randint(1, 1000, (1, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        images[:2], word_ids.repeat(2, axis=0), train=False)

    @jax.jit
    def step(variables, images, word_ids, carry):
        out = model.apply(variables, images + carry * 0.0, word_ids,
                          n_frame=n_frame, method=DCNetCls.eval_clip)
        dec = decode_best(out.outbox, cfg)
        return dec.boxes, jnp.sum(dec.score)

    def run(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            _, carry = step(variables, images, word_ids, carry)
        np.asarray(carry)
        return time.perf_counter() - t0

    run(1)
    n_short = max(iters // 4, 1)
    t_short = run(n_short)
    t_long = run(iters)
    ours_ms = max((t_long - t_short) / (iters - n_short), 1e-9) * 1e3

    sd = export_reference_state_dict(variables["params"],
                                     variables["batch_stats"])
    ref = _RefModel(cfg, defs=defs).eval()
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    t_img = torch.from_numpy(np.asarray(images).transpose(0, 3, 1, 2))
    t_ids = torch.from_numpy(np.asarray(word_ids, np.int64))
    with torch.no_grad():
        ref.eval_clip(t_img, t_ids, n_frame)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            ref.eval_clip(t_img, t_ids, n_frame)
        torch_ms = (time.perf_counter() - t0) / iters * 1e3

    fps = n_frame / (ours_ms / 1e3)
    print(json.dumps({
        "metric": "video_eval_clip_latency_cpu",
        "value": round(ours_ms, 2),
        "unit": "ms",
        "vs_baseline": round(torch_ms / ours_ms, 3),  # speedup over torch
        "extra": {"torch_reference_ms": round(torch_ms, 2),
                  "frames_per_sec_cpu": round(fps, 1),
                  "n_frame": n_frame, "image_size": size, "dtype": "float32",
                  "baseline": "measured torch mirror, same weights/CPU"},
    }))


def bench_train_mirror(args):
    """BASELINE config 2 vs a MEASURED baseline: our jitted train_step and
    the torch reference train step (tests/ref_train_mirror.py — the
    reference's training forward, per-sample sampling loops, 5 losses and
    RMSprop param groups over the _RefModel module graph,
    train_DCNet.py:527-534,563-726) run the SAME weights on the same CPU."""
    import torch

    jax.config.update("jax_platforms", "cpu")
    from dcnet_tpu.config import DCNetConfig
    from dcnet_tpu.models import DCNet
    from dcnet_tpu.models.darknet import mini_backbone_defs, yolov3_layer_defs
    from dcnet_tpu.train.checkpoint import export_reference_state_dict
    from dcnet_tpu.train.state import create_train_state
    from dcnet_tpu.train.step import train_step
    from tests.ref_train_mirror import make_ref_optimizer, ref_train_step
    from tests.test_reference_bridge import _RefModel

    size = 64 if args.smoke else 256
    clips = 1 if args.smoke else 2   # k=2 -> 2*clips images per step
    iters = 2 if args.smoke else max(args.iters // 5, 3)
    n_imgs = 2 * clips
    cfg = DCNetConfig(image_size=size, corpus_size=1000, n_frames_train=2,
                      interframe_top_k=min(30, (size // 32) ** 4),
                      interframe_neg_n=min(10, (size // 32) ** 2 - 1),
                      crossmodal_neg_n=min(5, (size // 32) ** 2 - 1))
    defs = mini_backbone_defs() if args.smoke else yolov3_layer_defs()
    model = DCNet(cfg=cfg, backbone_defs=defs)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(
            rng.rand(n_imgs, size, size, 3).astype(np.float32)),
        "word_ids": jnp.asarray(
            rng.randint(1, 1000, (n_imgs, 20)).astype(np.int32)),
        "bbox": jnp.asarray(np.stack([
            rng.rand(n_imgs) * 50, rng.rand(n_imgs) * 50,
            rng.rand(n_imgs) * 100 + 100, rng.rand(n_imgs) * 100 + 100,
        ], 1).astype(np.float32)),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               steps_per_epoch=1000, sample_batch=batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def run_ours(n, state):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = train_step(model, cfg, state, batch,
                                  jax.random.PRNGKey(1))
        np.asarray(m["loss"])
        return time.perf_counter() - t0, state

    _, state_w = run_ours(1, state)  # compile
    n_short = max(iters // 4, 1)
    t_short, state_w = run_ours(n_short, state_w)
    t_long, _ = run_ours(iters, state_w)
    ours_ms = max((t_long - t_short) / (iters - n_short), 1e-9) * 1e3

    # torch mirror: SAME weights, train mode, reference optimizer recipe
    sd = export_reference_state_dict(variables["params"],
                                     variables["batch_stats"])
    ref = _RefModel(cfg, defs=defs).train()
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    opt = make_ref_optimizer(ref, lr=cfg.lr)
    t_img = torch.from_numpy(np.asarray(batch["images"]).transpose(0, 3, 1, 2))
    t_ids = torch.from_numpy(np.asarray(batch["word_ids"], np.int64))
    t_box = torch.from_numpy(np.asarray(batch["bbox"]))
    ref_train_step(ref, opt, t_img, t_ids, t_box, cfg)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        ref_train_step(ref, opt, t_img, t_ids, t_box, cfg)
    torch_ms = (time.perf_counter() - t0) / iters * 1e3

    fps = n_imgs / (ours_ms / 1e3)
    print(json.dumps({
        "metric": "train_step_latency_cpu_k2",
        "value": round(ours_ms, 2),
        "unit": "ms",
        "vs_baseline": round(torch_ms / ours_ms, 3),  # speedup over torch
        "extra": {"torch_reference_ms": round(torch_ms, 2),
                  "frames_per_sec_cpu": round(fps, 1),
                  "clip_batch": clips, "n_frame": 2, "image_size": size,
                  "dtype": "float32",
                  "baseline": "measured torch mirror train step "
                              "(fwd+5-loss+bwd+RMSprop), same weights/CPU"},
    }))


def bench_bert(args):
    """BASELINE config 4: BERT language encoder at clip batch 32 with the
    full dual-correspondence module (train-mode forward: inter-frame +
    cross-modal sampling active; DCNet_model.py:248-249,477-484)."""
    from dcnet_tpu.config import DCNetConfig
    from dcnet_tpu.models import DCNet
    from dcnet_tpu.models.darknet import mini_backbone_defs

    size = 64 if args.smoke else 256
    clips = 2 if args.smoke else 32
    iters = 3 if args.smoke else args.iters
    dtype = jnp.float32 if (args.fp32 or args.smoke) else jnp.bfloat16
    cfg = DCNetConfig(
        image_size=size, use_lstm=False, corpus_size=0,
        compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        interframe_top_k=min(30, (size // 32) ** 4),
        interframe_neg_n=min(10, (size // 32) ** 2 - 1),
        crossmodal_neg_n=min(5, (size // 32) ** 2 - 1))
    model = DCNet(cfg=cfg, dtype=dtype,
                  backbone_defs=mini_backbone_defs() if args.smoke else None)

    rng = np.random.RandomState(0)
    n_imgs = 2 * clips
    images = jnp.asarray(rng.rand(n_imgs, size, size, 3).astype(np.float32))
    word_ids = jnp.asarray(rng.randint(1, 30000, (n_imgs, 20)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        images[:2], word_ids[:2], train=False)

    @jax.jit
    def step(variables, images, word_ids, carry):
        out, _ = model.apply(
            variables, images + carry * 0.0, word_ids, train=True,
            rngs={"sampling": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        chain = (sum(jnp.sum(ob.astype(jnp.float32)) for ob in out.outbox)
                 + jnp.sum(out.interframe.q.astype(jnp.float32)))
        return chain

    def run(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            carry = step(variables, images, word_ids, carry)
        np.asarray(carry)
        return time.perf_counter() - t0

    run(1)
    n_short = max(iters // 4, 1)
    t_short = run(n_short)
    t_long = run(iters)
    dt_step = max((t_long - t_short) / (iters - n_short), 1e-9)
    fps = n_imgs / dt_step
    print(json.dumps({
        "metric": "bert_dual_correspondence_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
        "extra": {"clip_batch": clips, "step_ms": round(dt_step * 1e3, 2),
                  "image_size": size, "dtype": str(dtype.__name__),
                  "encoder": "bert-base-uncased (frozen, from-scratch flax)",
                  "note": "train-mode forward incl. both contrastive "
                          "sampling branches; vs_baseline uses the eval "
                          "A100 estimate"},
    }))


if __name__ == "__main__":
    main()
