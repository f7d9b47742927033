"""CLI regression tests (in-process mains on synthetic data).

The heavier CLI flows are exercised by the data-free smokes documented in
CLAUDE.md; these tests lock in the two equivalences that matter:
--stream_eval == standard window-recompute eval, and the train CLI's
one-step end-to-end path.
"""

import contextlib
import io
import os

import numpy as np
import pytest

from conftest import ensure_lock, lock_available, materialize_synthetic32


def _patched_build_dataset(root, limit_rows=None):
    def build_dataset(args, split, testmode=False, num_frame_k=None):
        from dcnet_tpu.data.synthetic import build_synthetic_corpus
        from dcnet_tpu.data.vid import VIDDataset
        index = os.path.join(root, f"VID_video_level_{split}.json")
        corpus = build_synthetic_corpus()
        k = num_frame_k if num_frame_k is not None else args.num_frame_k
        tok = None
        if not args.lstm:  # BERT path tokenizes with its own vocab
            from dcnet_tpu.data.bert_tokenize import get_bert_tokenizer
            tok = get_bert_tokenizer(args.bert_model)
        ds = VIDDataset(index, corpus if args.lstm else None, split=split,
                        imsize=args.size, num_frame_k=k,
                        max_query_len=args.time, testmode=testmode,
                        image_root=root, seed=args.seed, bert_tokenizer=tok)
        if limit_rows:
            ds.chunks = ds.chunks[:limit_rows]
        return ds, corpus
    return build_dataset


def _run_main(module, argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        module.main(argv)
    return out.getvalue()


def _metrics_line(text):
    for line in reversed(text.strip().splitlines()):
        parts = line.split(",")
        if len(parts) == 2:
            try:
                return float(parts[0]), float(parts[1])
            except ValueError:
                continue
    raise AssertionError(f"no metrics line in: {text!r}")


@pytest.mark.skipif(
    not lock_available(),
    reason="no LSTM lock: neither saved_models/converge32b nor the committed tests/locks/converge32tiny.npz — regenerate with: python tools/make_converge32.py [--tiny]")
def test_stream_eval_matches_standard(monkeypatch):
    """--stream_eval (backbone once per frame) reproduces the standard
    window-recompute eval metrics on trained weights."""
    import dcnet_tpu.cli.test as tmod

    resume, extra = ensure_lock()
    monkeypatch.setattr(
        tmod, "build_dataset",
        _patched_build_dataset("data/synthetic32", limit_rows=10))
    base = ["--synthetic", "--lstm", "--mini", "--size", "64",
            "--num_frame_k", "5", "--test", "--batch_size", "4",
            "--resume", resume,
            "--savename", "cli_eq_test"] + extra
    acc_std, miou_std = _metrics_line(_run_main(tmod, base))
    acc_str, miou_str = _metrics_line(_run_main(tmod, base + ["--stream_eval"]))
    assert abs(acc_std - acc_str) < 1e-6
    assert abs(miou_std - miou_str) < 2e-3  # fp reassociation only
    assert miou_std > 0.05  # trained weights actually ground something


@pytest.mark.skipif(
    not lock_available(),
    reason="no LSTM lock: neither saved_models/converge32b nor the committed tests/locks/converge32tiny.npz — regenerate with: python tools/make_converge32.py [--tiny]")
def test_quant_eval_close_to_fp(monkeypatch):
    """--quant (int8 backbone, calibrated scales) stays close to the float
    stream-eval metrics on trained weights — the accuracy cost of the 2x
    MXU int8 path is bounded."""
    import dcnet_tpu.cli.test as tmod

    resume, extra = ensure_lock()
    monkeypatch.setattr(
        tmod, "build_dataset",
        _patched_build_dataset("data/synthetic32", limit_rows=10))
    base = ["--synthetic", "--lstm", "--mini", "--size", "64",
            "--num_frame_k", "5", "--test", "--batch_size", "4",
            "--resume", resume,
            "--savename", "cli_quant_test", "--stream_eval"] + extra
    acc_fp, miou_fp = _metrics_line(_run_main(tmod, base))
    acc_q, miou_q = _metrics_line(_run_main(tmod, base + ["--quant"]))
    assert miou_fp > 0.05  # trained weights ground something
    assert abs(miou_q - miou_fp) < 0.03, (miou_fp, miou_q)
    assert abs(acc_q - acc_fp) < 0.11, (acc_fp, acc_q)
    # trunk PTQ on top of the int8 backbone: accuracy still within noise
    acc_t, miou_t = _metrics_line(
        _run_main(tmod, base + ["--quant", "--quant_trunk"]))
    assert abs(miou_t - miou_fp) < 0.03, (miou_fp, miou_t)
    assert abs(acc_t - acc_fp) < 0.11, (acc_fp, acc_t)


@pytest.mark.skipif(
    not lock_available(),
    reason="no LSTM lock: neither saved_models/converge32b nor the committed tests/locks/converge32tiny.npz — regenerate with: python tools/make_converge32.py [--tiny]")
@pytest.mark.heavy
def test_coattn_variants_close_to_default(monkeypatch):
    """The co-attention A/B variants (batched-reference dot_general, int8 QK
    logits, split-corr off) reproduce the default eval metrics on trained
    weights. Batched refs and no-split are algebraic rearrangements (tight
    tolerance); int8 logits quantize the QK product (quant-level bound)."""
    import dcnet_tpu.cli.test as tmod

    resume, extra = ensure_lock()
    monkeypatch.setattr(
        tmod, "build_dataset",
        _patched_build_dataset("data/synthetic32", limit_rows=10))
    base = ["--synthetic", "--lstm", "--mini", "--size", "64",
            "--num_frame_k", "5", "--test", "--batch_size", "4",
            "--resume", resume,
            "--savename", "cli_coattn_test"] + extra
    acc0, miou0 = _metrics_line(_run_main(tmod, base))
    assert miou0 > 0.05  # trained weights ground something
    acc_b, miou_b = _metrics_line(
        _run_main(tmod, base + ["--coattn_batch_refs"]))
    assert abs(miou_b - miou0) < 2e-3, (miou0, miou_b)
    assert abs(acc_b - acc0) < 1e-6, (acc0, acc_b)
    acc_s, miou_s = _metrics_line(_run_main(tmod, base + ["--no_split_corr"]))
    assert abs(miou_s - miou0) < 2e-3, (miou0, miou_s)
    assert abs(acc_s - acc0) < 1e-6, (acc0, acc_s)
    acc_i, miou_i = _metrics_line(_run_main(tmod, base + ["--coattn_int8"]))
    assert abs(miou_i - miou0) < 0.03, (miou0, miou_i)
    assert abs(acc_i - acc0) < 0.11, (acc0, acc_i)


@pytest.mark.skipif(
    not lock_available(bert=True),
    reason="no BERT lock: neither saved_models/converge32bert nor the committed tests/locks/converge32tinybert.npz — regenerate with: python tools/make_converge32.py --bert [--tiny]")
def test_bert_eval_locks(monkeypatch):
    """The BERT-path accuracy lock (BASELINE config 4): trained
    converge32bert weights ground the synthetic test split, --stream_eval
    matches standard eval, and the int8 backbone + trunk PTQ (which on
    the BERT path calibrates on BERT-conditioned fcn tiles) stay within
    noise — the BERT twin of the LSTM locks above."""
    import dcnet_tpu.cli.test as tmod

    resume, extra = ensure_lock(bert=True)
    monkeypatch.setattr(
        tmod, "build_dataset",
        _patched_build_dataset("data/synthetic32", limit_rows=10))
    base = ["--synthetic", "--mini", "--size", "64",
            "--bert_model", "bert-mini",
            "--num_frame_k", "5", "--test", "--batch_size", "4",
            "--resume", resume,
            "--savename", "cli_bert_lock"] + extra
    acc_std, miou_std = _metrics_line(_run_main(tmod, base))
    assert miou_std > 0.05  # trained BERT trunk grounds something
    acc_str, miou_str = _metrics_line(
        _run_main(tmod, base + ["--stream_eval"]))
    assert abs(acc_std - acc_str) < 1e-6
    assert abs(miou_std - miou_str) < 2e-3
    acc_q, miou_q = _metrics_line(
        _run_main(tmod, base + ["--stream_eval", "--quant",
                                "--quant_trunk"]))
    # One-sided: the lock bounds quant DEGRADATION. On the tiny-256 lock
    # (miou ~0.09, far from converged) int8 jitter can land above fp —
    # measured +0.037 on this artifact — and that is not a regression.
    assert miou_q > miou_std - 0.03, (miou_std, miou_q)
    assert acc_q > acc_std - 0.11, (acc_std, acc_q)


def test_quant_eval_cli_smoke(tmp_path, monkeypatch):
    """--quant end to end on random weights: calibrates, quantizes, runs
    the int8 backbone through the stream-eval path, metrics finite."""
    import dcnet_tpu.cli.test as tmod
    from dcnet_tpu.data.synthetic import generate_synthetic_vid

    root = str(tmp_path / "data")
    generate_synthetic_vid(root, "test", num_videos=2, frames_per_video=6)
    monkeypatch.setattr(tmod, "build_dataset",
                        _patched_build_dataset(root, limit_rows=4))
    monkeypatch.chdir(tmp_path)
    out = _run_main(tmod, [
        "--synthetic", "--lstm", "--mini", "--size", "64",
        "--num_frame_k", "5", "--test", "--batch_size", "2",
        "--quant", "--calib_frames", "8", "--savename", "cli_quant_smoke"])
    acc, miou = _metrics_line(out)
    assert np.isfinite(acc) and np.isfinite(miou)


@pytest.mark.heavy
def test_train_cli_one_step(tmp_path, monkeypatch):
    """Full train CLI path end to end: one optimizer step + validation +
    checkpoint write on generated data."""
    import dcnet_tpu.cli.train as trmod
    from dcnet_tpu.data.synthetic import generate_synthetic_vid

    root = str(tmp_path / "data")
    for split in ("train", "test"):
        generate_synthetic_vid(root, split, num_videos=2,
                               frames_per_video=4, height=96, width=128)
    monkeypatch.setattr(trmod, "build_dataset",
                        _patched_build_dataset(root))
    monkeypatch.chdir(tmp_path)
    out = _run_main(trmod, [
        "--synthetic", "--lstm", "--mini", "--size", "64",
        "--batch_size", "2", "--nb_epoch", "1", "--max_steps", "1",
        "--workers", "0", "--devices", "2",
        "--savename", "cli_train_test"])
    assert "accu" in out
    assert os.path.isdir(str(tmp_path / "saved_models" / "cli_train_test"))


def test_data_parallel_eval_matches_single_device(tmp_path, monkeypatch):
    """--data_parallel (the reference's eval-time DataParallel analog,
    test_DCNet.py:273) reproduces single-device metrics exactly, including
    a non-divisible final batch through the pad/shard/unpad path
    (cli/test.py::put)."""
    import jax
    import dcnet_tpu.cli.test as tmod
    from dcnet_tpu.data.synthetic import generate_synthetic_vid

    assert len(jax.devices()) == 8  # conftest provisions the virtual mesh
    root = str(tmp_path / "data")
    generate_synthetic_vid(root, "test", num_videos=3, frames_per_video=9)
    # 3 videos x 5 windows = 15 rows -> limit to 10: one full batch of 8
    # plus a final batch of 2 that must be padded to 8 and un-padded
    monkeypatch.setattr(tmod, "build_dataset",
                        _patched_build_dataset(root, limit_rows=10))
    monkeypatch.chdir(tmp_path)
    base = ["--synthetic", "--lstm", "--mini", "--size", "64",
            "--num_frame_k", "5", "--test", "--batch_size", "8",
            "--workers", "0", "--savename", "cli_dp_test"]
    acc_1, miou_1 = _metrics_line(_run_main(tmod, base))
    acc_dp, miou_dp = _metrics_line(_run_main(tmod, base + ["--data_parallel"]))
    assert acc_dp == acc_1
    assert abs(miou_dp - miou_1) < 1e-6


def test_serve_cli_smoke(tmp_path, monkeypatch):
    """Streaming serving CLI end to end on synthetic streams: engine init,
    ticks, state checkpoint + resume (preemption-safe serving)."""
    import dcnet_tpu.cli.serve as smod

    monkeypatch.chdir(tmp_path)
    state_file = str(tmp_path / "streams.npz")
    base = ["--synthetic", "--lstm", "--mini", "--size", "64",
            "--n_streams", "2", "--ticks", "4", "--print_every", "2",
            "--state_file", state_file]
    out = _run_main(smod, base)
    assert "served 8 predictions over 2 streams" in out
    assert os.path.exists(state_file)
    out2 = _run_main(smod, base + ["--ticks", "2"])
    assert "resumed stream state" in out2
    assert "frames_seen=[4, 4]" in out2


def test_serve_cli_frames_root(tmp_path, monkeypatch):
    """--frames_root serves real frame directories (phrase.txt + jpgs per
    stream dir) end to end, with throttled state checkpointing
    (--state_every) and a resume that carries frames_seen over."""
    import cv2
    import dcnet_tpu.cli.serve as smod

    rng = np.random.RandomState(0)
    root = tmp_path / "streams"
    for i, phrase in enumerate(["red box left", "blue ball right"]):
        d = root / f"s{i}"
        d.mkdir(parents=True)
        (d / "phrase.txt").write_text(phrase)
        for t in range(6):
            img = (rng.rand(72, 96, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"f{t:03d}.jpg"), img)
    monkeypatch.chdir(tmp_path)
    state_file = str(tmp_path / "st.npz")
    base = ["--frames_root", str(root), "--lstm", "--mini", "--size", "64",
            "--n_streams", "2", "--print_every", "3",
            "--state_file", state_file]
    out = _run_main(smod, base + ["--ticks", "6", "--state_every", "2"])
    assert "served 12 predictions over 2 streams" in out
    assert os.path.exists(state_file)
    out2 = _run_main(smod, base + ["--ticks", "2"])
    assert "resumed stream state" in out2
    assert "frames_seen=[6, 6]" in out2


def test_make_converge32_regenerates_dataset(tmp_path, monkeypatch):
    """tools/make_converge32.py reproduces data/synthetic32 exactly (seed
    13): the accuracy-lock corpus is deterministically regenerable."""
    import hashlib
    import json
    import sys
    materialize_synthetic32()
    repo = os.getcwd()
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        import make_converge32 as mk
    finally:
        sys.path.pop(0)
    monkeypatch.chdir(tmp_path)
    mk.make_dataset()
    for split in ("train", "test"):
        new = json.load(open(tmp_path / mk.DATA_ROOT
                             / f"VID_video_level_{split}.json"))
        ref = json.load(open(os.path.join(
            repo, "data/synthetic32", f"VID_video_level_{split}.json")))
        assert new == ref, split
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()  # noqa: E731
    frames = sorted(os.listdir(os.path.join(repo, "data/synthetic32/frames")))
    assert frames == sorted(os.listdir(tmp_path / mk.DATA_ROOT / "frames"))
    for f in frames[::16]:  # spot-check byte identity
        assert h(os.path.join(repo, "data/synthetic32/frames", f)) == \
            h(str(tmp_path / mk.DATA_ROOT / "frames" / f)), f
