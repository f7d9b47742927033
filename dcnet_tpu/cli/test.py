"""Video-level evaluation + temporal-cache entry point.

Rebuilds `test_DCNet.py --test` (center-frame eval over n-frame clips,
`/root/reference/test_DCNet.py:339-499`) and `--cache` + `post_processing.py`
(two-pass temporal fusion, :546-701 / post_processing.py:205-352) — here the
cache pass and the fusion pass run back-to-back on device, no per-frame
`.pth` files.

Example (data-free smoke):
    python -m dcnet_tpu.cli.test --synthetic --lstm --mini --size 64 \
        --num_frame_k 5 --test --post_process
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dcnet_tpu.cli.common import (
    base_parser, build_dataset, build_model, config_from_args,
    setup_logging, splice_backbone_weights,
)
from dcnet_tpu.data.vid import batch_iterator
from dcnet_tpu.eval.metrics import AverageMeter
from dcnet_tpu.eval.temporal import build_frame_cache
from dcnet_tpu.models.dcnet import DCNet
from dcnet_tpu.ops.boxes import bbox_iou
from dcnet_tpu.ops.decode import decode_best, inverse_letterbox
from dcnet_tpu.train.checkpoint import restore_checkpoint
from dcnet_tpu.train.state import create_train_state


def main(argv=None):
    parser = base_parser("dcnet_tpu video-level evaluation")
    parser.add_argument("--cache", action="store_true",
                        help="build the temporal top-k cache")
    parser.add_argument("--post_process", action="store_true",
                        help="run temporal fusion over the cache")
    parser.add_argument("--topk", default=5, type=int)
    parser.add_argument("--cache_dir", default="./cache", type=str)
    parser.add_argument("--ref_cache_format", action="store_true",
                        help="with --cache, also write the reference's "
                             "per-frame .pth files (test_DCNet.py:641-655) "
                             "so post_processing.py can consume our pass 1")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the clip batch over all devices (the "
                             "reference's eval-time DataParallel, "
                             "test_DCNet.py:273, as a 'data' mesh)")
    parser.add_argument("--save_plot", action="store_true",
                        help="write qualitative JPEGs (test_DCNet.py:985-988)")
    parser.add_argument("--stream_eval", action="store_true",
                        help="extract backbone features once per FRAME and "
                             "reuse them across overlapping windows (the "
                             "reference reruns the backbone on all "
                             "num_frame_k frames of every clip, "
                             "test_DCNet.py:373 — a ~k x backbone saving)")
    parser.add_argument("--quant", action="store_true",
                        help="int8 post-training-quantized backbone "
                             "(ops/quant.py): calibrated on the first "
                             "frames of the split; implies --stream_eval")
    parser.add_argument("--calib_frames", default=32, type=int,
                        help="calibration frames for --quant")
    parser.add_argument("--quant_params", default="", type=str,
                        help="with --quant: load the int8 backbone from "
                             "this .npz if it exists, else calibrate and "
                             "save it there (the deployable quantized "
                             "artifact, ops/quant.py)")
    parser.add_argument("--quant_trunk", action="store_true",
                        help="with --quant: ALSO static-PTQ the trunk convs "
                             "(mapping_visu/corr_conv/fcn — "
                             "cfg.trunk_quant, models/heads.py::QuantConv2D)")
    parser.add_argument("--coattn_batch_refs", action="store_true",
                        help="batch all reference frames through one "
                             "co-attention dot_general "
                             "(cfg.coattn_batch_refs; bench A/B flag)")
    parser.add_argument("--coattn_int8", action="store_true",
                        help="int8 QK co-attention logits "
                             "(cfg.coattn_int8_logits; static 1/127 scale "
                             "from l2-normalization; bench A/B flag)")
    parser.add_argument("--no_split_corr", action="store_true",
                        help="disable the split corr_conv center-half "
                             "hoisting (cfg.split_corr_conv)")
    args = parser.parse_args(argv)
    if args.quant:
        args.stream_eval = True
    if args.num_frame_k == 2:
        args.num_frame_k = 5  # test default (test_DCNet.py:178)
    args.test = True
    if args.savename == "default":
        args.savename = f"model_{args.dataset}_batch{args.batch_size}"
    setup_logging(args.savename, test=True)

    ds, corpus = build_dataset(args, "test", testmode=True)
    cfg = config_from_args(args, corpus_size=len(corpus))
    if args.coattn_batch_refs or args.coattn_int8 or args.no_split_corr:
        cfg = dataclasses.replace(
            cfg,
            coattn_batch_refs=args.coattn_batch_refs,
            coattn_int8_logits=args.coattn_int8,
            split_corr_conv=not args.no_split_corr)
    model = build_model(args, cfg)

    sample = ds[0]
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), steps_per_epoch=1,
        sample_batch={
            "images": sample["images"][:2].repeat(1, axis=0),
            "word_ids": sample["word_ids"][:2]})
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = splice_backbone_weights(args, variables)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    if args.resume:
        state, _, _ = restore_checkpoint(args.resume, state,
                                      with_opt_state=False)

    if args.stream_eval:
        return _stream_eval(args, ds, cfg, model, state)

    k = args.num_frame_k
    center = k // 2

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from dcnet_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicate_state)
        n_dev = len(jax.devices())
        assert args.batch_size % n_dev == 0, \
            f"--batch_size {args.batch_size} not divisible by {n_dev} devices"
        mesh = make_mesh(n_data=n_dev, n_model=1)
        state = state.replace(
            params=replicate_state(mesh, state.params),
            batch_stats=replicate_state(mesh, state.batch_stats))

    @jax.jit
    def forward(params, batch_stats, images, word_ids):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, word_ids, n_frame=k, method=DCNet.eval_clip)

    def put(images_np, word_ids_np):
        """Pad the clip batch to --batch_size and shard it over the mesh
        (clips stay device-contiguous: B*k rows split into B/n_dev chunks).
        Returns (images, word_ids, n_valid)."""
        n_clips = word_ids_np.shape[0]
        if mesh is None:
            return jnp.asarray(images_np), jnp.asarray(word_ids_np), n_clips
        pad = args.batch_size - n_clips
        if pad:
            images_np = np.concatenate(
                [images_np, np.repeat(images_np[-k:], pad, axis=0)])
            word_ids_np = np.concatenate(
                [word_ids_np, np.repeat(word_ids_np[-1:], pad, axis=0)])
        sh = batch_sharding(mesh)
        return (jax.device_put(images_np, sh),
                jax.device_put(word_ids_np, sh), n_clips)

    acc, miou = AverageMeter(), AverageMeter()
    cache_rows = []
    vid_rows = []
    gt_rows = []
    path_rows = []
    # clip-batched eval (the reference is locked to batch_size=1,
    # test_DCNet.py:263; here the whole pipeline is vectorized)
    for batch in batch_iterator(ds, args.batch_size, drop_last=False,
                                num_workers=args.workers):
        images, word_ids, n_valid = put(
            batch["images"].reshape(-1, *batch["images"].shape[2:]),
            batch["word_ids"][:, center])
        out = forward(state.params, state.batch_stats, images, word_ids)
        if n_valid != word_ids.shape[0]:  # drop padded clips
            out = jax.tree_util.tree_map(lambda x: x[:n_valid], out)

        bbox = jnp.clip(jnp.asarray(batch["bbox"][:, center]), 0, cfg.image_size - 1)
        dec = decode_best(out.outbox, cfg)
        ratio = jnp.asarray(batch["ratio"][:, center])
        dw = jnp.asarray(batch["dw"][:, center])
        dh = jnp.asarray(batch["dh"][:, center])
        ow = (cfg.image_size - 2 * dw) / ratio
        oh = (cfg.image_size - 2 * dh) / ratio
        pred = inverse_letterbox(dec.boxes[:, 0], ratio, dw, dh, ow, oh)
        gt = inverse_letterbox(bbox, ratio, dw, dh, ow, oh)
        iou = np.asarray(bbox_iou(pred, gt))
        n = iou.shape[0]
        acc.update(float((iou > 0.5).mean()), n)
        miou.update(float(iou.mean()), n)

        if args.save_plot:
            from dcnet_tpu.eval.visualize import save_grounding_results
            phrases = [p[center] for p in batch.get("phrases", [])] or [""]
            save_grounding_results(
                np.asarray(dec.boxes[:, 0]), np.asarray(bbox),
                batch["images"][:, center], phrases, "test",
                acc.count - n,
                save_path=f"./visulizations/{args.savename}/")

        if args.cache or args.post_process:
            cache_rows.append(build_frame_cache(
                out.outbox, out.corr_feat, args.topk, cfg))
            vid_rows.append(np.asarray(batch["video_id"], np.int32))
            for ii in range(n):
                gt_rows.append((np.asarray(bbox)[ii], float(ratio[ii]),
                                float(dw[ii]), float(dh[ii])))
                path_rows.append(batch["paths"][ii][center])

    print(f"{acc.avg:.6f},{miou.avg:.6f}")

    if args.cache and cache_rows:
        import os
        from dcnet_tpu.cli.post_process import save_cache_npz
        from dcnet_tpu.eval.temporal import FrameCache
        full = FrameCache(
            boxes=jnp.concatenate([c.boxes for c in cache_rows]),
            scores=jnp.concatenate([c.scores for c in cache_rows]),
            feats=jnp.concatenate([c.feats for c in cache_rows]))
        save_cache_npz(
            os.path.join(args.cache_dir, args.savename, "cache.npz"), full,
            np.stack([g[0] for g in gt_rows]),
            np.asarray([g[1] for g in gt_rows], np.float32),
            np.asarray([g[2] for g in gt_rows], np.float32),
            np.asarray([g[3] for g in gt_rows], np.float32),
            video_ids=np.concatenate(vid_rows))
        if args.ref_cache_format:
            from dcnet_tpu.eval.ref_cache import write_reference_cache
            r = jnp.asarray([g[1] for g in gt_rows])[:, None]
            dw_a = jnp.asarray([g[2] for g in gt_rows])[:, None]
            dh_a = jnp.asarray([g[3] for g in gt_rows])[:, None]
            ow_a = (cfg.image_size - 2 * dw_a) / r
            oh_a = (cfg.image_size - 2 * dh_a) / r
            orig_boxes = inverse_letterbox(full.boxes, r, dw_a, dh_a,
                                           ow_a, oh_a)
            write_reference_cache(
                os.path.join(args.cache_dir, args.savename),
                path_rows, FrameCache(orig_boxes, full.scores, full.feats))

    if args.post_process and cache_rows:
        from dcnet_tpu.eval.temporal import FrameCache, fuse_per_video
        cache = FrameCache(
            boxes=jnp.concatenate([c.boxes for c in cache_rows]),
            scores=jnp.concatenate([c.scores for c in cache_rows]),
            feats=jnp.concatenate([c.feats for c in cache_rows]))
        # fuse within each video only; frames at video edges treat
        # out-of-video neighbors as missing (post_processing.py:188-193)
        fused = fuse_per_video(cache, np.concatenate(vid_rows), ref_frames=k)
        pp_acc, pp_miou = AverageMeter(), AverageMeter()
        for t, (gt_box, ratio, dw, dh) in enumerate(gt_rows):
            ow = (cfg.image_size - 2 * dw) / ratio
            oh = (cfg.image_size - 2 * dh) / ratio
            pred = inverse_letterbox(fused[t], jnp.asarray(ratio),
                                     jnp.asarray(dw), jnp.asarray(dh),
                                     jnp.asarray(ow), jnp.asarray(oh))
            gt = inverse_letterbox(jnp.asarray(gt_box), jnp.asarray(ratio),
                                   jnp.asarray(dw), jnp.asarray(dh),
                                   jnp.asarray(ow), jnp.asarray(oh))
            iou = float(bbox_iou(pred[None], gt[None])[0])
            pp_acc.update(float(iou > 0.5))
            pp_miou.update(iou)
        print(f"post_process: {pp_acc.avg:.6f},{pp_miou.avg:.6f}")
    return acc.avg


def _stream_eval(args, ds, cfg, model, state):
    """Feature-cached offline video eval: the backbone runs ONCE per frame;
    overlapping windows reuse the per-frame features (the offline analog of
    the serving engine's HBM feature ring). Numerically identical to the
    window-recompute path — eval_features consumes the same mapped
    features eval_clip would compute."""
    from dcnet_tpu.data import transforms as T

    k = args.num_frame_k
    center = k // 2
    cb = max(args.batch_size, 1)   # trunk batch (centers)
    fb = cb * k                    # backbone batch (frames)

    if getattr(args, "quant", False):
        # int8 backbone: calibrate activation scales on the first frames of
        # the split, then run the quantized stack + float mapping head
        import os
        from dcnet_tpu.ops import quant as Q
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if args.quant_params and os.path.exists(args.quant_params):
            qparams = Q.load_qparams(args.quant_params)
        else:
            # calibration frames: the first distinct frames of the split,
            # through the same decode+letterbox+normalize preprocessing
            calib = []
            seen = []
            for row in ds.chunks:
                for p in row[0]:
                    if p not in seen:
                        seen.append(p)
                    if len(seen) >= args.calib_frames:
                        break
                if len(seen) >= args.calib_frames:
                    break
            for p in seen:
                img = ds._read_image(p)
                img, *_ = T.letterbox(img, ds.imsize)
                calib.append(T.normalize_image(img).astype(np.float32))
            qparams = Q.quantize_model_backbone(
                model, variables, jnp.asarray(np.stack(calib)))
            if args.quant_params:
                Q.save_qparams(args.quant_params, qparams)

        qcol = None
        if getattr(args, "quant_trunk", False):
            # trunk PTQ: calibrate the trunk convs' activation scales on a
            # float eval_clip pass over the first clip, then trace the
            # cfg.trunk_quant="int8" model variant (params shared)
            s0 = ds[0]
            ci = jnp.asarray(s0["images"].astype(np.float32))
            cw = jnp.asarray(s0["word_ids"][center:center + 1].astype(np.int32))
            qcol = Q.calibrate_trunk(
                model, variables,
                lambda m, v: m.apply(v, ci, cw, n_frame=k,
                                     method=type(m).eval_clip,
                                     mutable=["quant"]))
            model = Q.trunk_quant_variant(model, "int8")

        def _vars(params, batch_stats):
            v = {"params": params, "batch_stats": batch_stats}
            if qcol is not None:
                v["quant"] = qcol  # scalar scales; baked into the trace
            return v

        @jax.jit
        def extract(params, batch_stats, images):
            return Q.quant_extract_features(model, _vars(params, batch_stats),
                                            qparams, images)

        @jax.jit
        def trunk(params, batch_stats, per_frame, word_ids):
            return model.apply(_vars(params, batch_stats), per_frame,
                               word_ids, method=DCNet.eval_features)
    else:
        @jax.jit
        def extract(params, batch_stats, images):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, method=DCNet.extract_features)

        @jax.jit
        def trunk(params, batch_stats, per_frame, word_ids):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               per_frame, word_ids, method=DCNet.eval_features)

    by_video = {}
    for row in ds.chunks:
        by_video.setdefault(row[3], []).append(row)

    acc, miou = AverageMeter(), AverageMeter()
    cache_rows, vid_rows, fused_gt = [], [], []
    for vid, rows in by_video.items():
        # unique frame sequence: rows are consecutive sliding windows, so
        # frames = first window + the last frame of each later window
        paths = list(rows[0][0]) + [r[0][-1] for r in rows[1:]]
        if ds._native_on():  # raises if native explicitly requested but absent
            # one native call decodes+letterboxes the whole video in
            # parallel (bit-identical to the Python path below)
            from dcnet_tpu import native
            import os as _os
            full = [_os.path.join(ds.image_root, p) for p in paths]
            frames, ratios, dws, dhs, ok = native.decode_letterbox_batch(
                full, ds.imsize, T.IMAGENET_MEAN, T.IMAGENET_STD)
            if not ok.all():
                raise FileNotFoundError(full[int(np.argmin(ok))])
            metas = list(zip(ratios, dws, dhs))
        else:
            imgs, metas = [], []
            for p in paths:  # decode ONCE per frame (vs once per window)
                img = ds._read_image(p)
                img, ratio, dw, dh = T.letterbox(img, ds.imsize)
                imgs.append(T.normalize_image(img).astype(np.float32))
                metas.append((ratio, dw, dh))
            frames = np.stack(imgs)
        n_frames = frames.shape[0]

        feats = None  # per scale (T, h, w, C), built in padded batches
        for s0 in range(0, n_frames, fb):
            chunk = frames[s0:s0 + fb]
            pad = fb - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            f = extract(state.params, state.batch_stats, jnp.asarray(chunk))
            f = [x[:fb - pad] for x in f]
            feats = f if feats is None else [
                jnp.concatenate([a, b]) for a, b in zip(feats, f)]

        n_centers = len(rows)
        win = np.arange(n_centers)[:, None] + np.arange(k)[None]  # (N, k)
        ids = np.stack([ds._tokenize(r[2][center].lower())[0]
                        for r in rows]).astype(np.int32)
        gts = np.stack([np.asarray(r[1][center], np.float64) for r in rows])

        for s0 in range(0, n_centers, cb):
            sel = win[s0:s0 + cb]
            n = sel.shape[0]
            pad = cb - n
            if pad:
                sel = np.concatenate([sel, np.repeat(sel[-1:], pad, 0)])
            per_frame = tuple(jnp.take(f, jnp.asarray(sel), axis=0)
                              for f in feats)
            wi = ids[s0:s0 + cb]
            if pad:
                wi = np.concatenate([wi, np.repeat(wi[-1:], pad, 0)])
            out = trunk(state.params, state.batch_stats, per_frame,
                        jnp.asarray(wi))
            out = jax.tree_util.tree_map(lambda x: x[:n], out)
            dec = decode_best(out.outbox, cfg)

            for j in range(n):
                ratio, dw, dh = metas[s0 + j + center]
                ow, oh = ((cfg.image_size - 2 * dw) / ratio,
                          (cfg.image_size - 2 * dh) / ratio)
                pred = inverse_letterbox(
                    dec.boxes[j, 0], jnp.asarray(ratio), jnp.asarray(dw),
                    jnp.asarray(dh), jnp.asarray(ow), jnp.asarray(oh))
                iou = float(bbox_iou(pred[None],
                                     jnp.asarray(gts[s0 + j][None]))[0])
                acc.update(float(iou > 0.5))
                miou.update(iou)
                fused_gt.append((gts[s0 + j], ratio, dw, dh))
            if args.post_process:
                cache_rows.append(build_frame_cache(
                    out.outbox, out.corr_feat, args.topk, cfg))
                vid_rows.append(np.full((n,), vid, np.int32))

    print(f"{acc.avg:.6f},{miou.avg:.6f}")

    if args.post_process and cache_rows:
        from dcnet_tpu.eval.temporal import FrameCache, fuse_per_video
        cache = FrameCache(
            boxes=jnp.concatenate([c.boxes for c in cache_rows]),
            scores=jnp.concatenate([c.scores for c in cache_rows]),
            feats=jnp.concatenate([c.feats for c in cache_rows]))
        fused = fuse_per_video(cache, np.concatenate(vid_rows), ref_frames=k)
        pp_acc, pp_miou = AverageMeter(), AverageMeter()
        for t, (gt, ratio, dw, dh) in enumerate(fused_gt):
            ow, oh = ((cfg.image_size - 2 * dw) / ratio,
                      (cfg.image_size - 2 * dh) / ratio)
            pred = inverse_letterbox(
                fused[t], jnp.asarray(ratio), jnp.asarray(dw),
                jnp.asarray(dh), jnp.asarray(ow), jnp.asarray(oh))
            iou = float(bbox_iou(pred[None], jnp.asarray(gt[None]))[0])
            pp_acc.update(float(iou > 0.5))
            pp_miou.update(iou)
        print(f"post_process: {pp_acc.avg:.6f},{pp_miou.avg:.6f}")
    return acc.avg


if __name__ == "__main__":
    main()
