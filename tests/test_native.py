"""Native (C++) host loader: build, parity vs the Python/cv2 path, and
dataset integration. The C++ core (dcnet_tpu/native/host_loader.cc) must
produce bit-identical output to dcnet_tpu/data/transforms.py — same
letterbox geometry (utils/transforms.py:123-137 semantics) and same
float32 normalization — so the two paths are freely interchangeable."""

import os

import numpy as np
import pytest

from dcnet_tpu import native
from dcnet_tpu.data import transforms as T
from dcnet_tpu.data.synthetic import build_synthetic_corpus, generate_synthetic_vid
from dcnet_tpu.data.vid import VIDDataset

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.unavailable_reason()}")


def _write_images(tmp_path, shapes, ext="png", seed=0):
    import cv2
    rng = np.random.RandomState(seed)
    paths = []
    for i, (h, w) in enumerate(shapes):
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        p = str(tmp_path / f"img{i}.{ext}")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_decode_letterbox_bit_parity(tmp_path):
    """PNG (lossless) input: native output == Python path, bitwise."""
    import cv2
    paths = _write_images(
        tmp_path, [(480, 640), (333, 217), (64, 64), (721, 405), (13, 999)])
    out, ratios, dws, dhs, ok = native.decode_letterbox_batch(
        paths, 256, T.IMAGENET_MEAN, T.IMAGENET_STD)
    assert ok.all()
    for i, p in enumerate(paths):
        raw = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        boxed, ratio, dw, dh = T.letterbox(raw, 256)
        ref = T.normalize_image(boxed)
        np.testing.assert_array_equal(out[i], ref)
        assert ratios[i] == ratio and dws[i] == dw and dhs[i] == dh


def test_decode_letterbox_jpeg_close(tmp_path):
    """JPEG decode may differ across libjpeg builds; require near-equality
    (exact on this image, but tolerate +-2/255 per pixel pre-normalize)."""
    import cv2
    paths = _write_images(tmp_path, [(300, 400)], ext="jpg")
    out, _, _, _, ok = native.decode_letterbox_batch(
        paths, 128, T.IMAGENET_MEAN, T.IMAGENET_STD)
    assert ok.all()
    raw = cv2.cvtColor(cv2.imread(paths[0]), cv2.COLOR_BGR2RGB)
    boxed, *_ = T.letterbox(raw, 128)
    ref = T.normalize_image(boxed)
    # 2/255 in uint8 space, inflated by the largest 1/std
    tol = 2.0 / 255.0 / float(T.IMAGENET_STD.min())
    assert np.abs(out[0] - ref).max() <= tol


def test_grayscale_inputs_match_python(tmp_path):
    """Single-channel sources: VID frames are occasionally grayscale.
    PNG goes through the same cv::imdecode as the Python path (bitwise);
    grayscale JPEG replicates Y into RGB in both libjpeg and cv2 (within
    the cross-build JPEG tolerance)."""
    import cv2
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (240, 320), np.uint8)
    p_png = str(tmp_path / "g.png")
    p_jpg = str(tmp_path / "g.jpg")
    cv2.imwrite(p_png, gray)
    cv2.imwrite(p_jpg, gray)
    out, _, _, _, ok = native.decode_letterbox_batch(
        [p_png, p_jpg], 128, T.IMAGENET_MEAN, T.IMAGENET_STD)
    assert ok.all()
    tol = 2.0 / 255.0 / float(T.IMAGENET_STD.min())
    for i, p in enumerate([p_png, p_jpg]):
        raw = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        boxed, *_ = T.letterbox(raw, 128)
        ref = T.normalize_image(boxed)
        if p.endswith(".png"):
            np.testing.assert_array_equal(out[i], ref)
        else:
            assert np.abs(out[i] - ref).max() <= tol


def test_failed_decode_flagged(tmp_path):
    paths = _write_images(tmp_path, [(100, 100)]) + ["/nonexistent/x.png"]
    out, _, _, _, ok = native.decode_letterbox_batch(
        paths, 64, T.IMAGENET_MEAN, T.IMAGENET_STD)
    assert list(ok) == [True, False]
    assert (out[1] == 0).all()


def test_decode_batch_rgb(tmp_path):
    import cv2
    paths = _write_images(tmp_path, [(240, 320), (77, 191)])
    imgs = native.decode_batch_rgb(paths + ["/nope.png"])
    assert imgs[2] is None
    for p, im in zip(paths, imgs):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(im, ref)


@pytest.mark.parametrize("split,augment", [("test", False), ("train", True)])
def test_vid_dataset_native_matches_python(tmp_path, split, augment):
    """VIDDataset(use_native=True) == VIDDataset(use_native=False) on every
    key, for both the fused eval path and the decode-only train path."""
    root = str(tmp_path)
    index = generate_synthetic_vid(root, split, num_videos=2,
                                   frames_per_video=5)
    corpus = build_synthetic_corpus()
    kw = dict(split=split, imsize=64, num_frame_k=2, image_root=root,
              testmode=(split == "test"), augment=augment)
    ds_py = VIDDataset(index, corpus, use_native=False, **kw)
    ds_cc = VIDDataset(index, corpus, use_native=True, **kw)
    for idx in range(min(3, len(ds_py))):
        a, b = ds_py[idx], ds_cc[idx]
        assert set(a) == set(b)
        for k in a:
            if isinstance(a[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            else:
                assert a[k] == b[k], k


def test_explicit_native_request_errors_when_disabled(tmp_path, monkeypatch):
    """use_native=True must raise (not silently fall back) when the core is
    unavailable; use_native=None falls back quietly."""
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "test", num_videos=1,
                                   frames_per_video=3)
    ds = VIDDataset(index, build_synthetic_corpus(), split="test", imsize=64,
                    num_frame_k=2, image_root=root, use_native=True)
    monkeypatch.setattr(native, "available", lambda: False)
    with pytest.raises(RuntimeError, match="native loader requested"):
        ds[0]
    ds_auto = VIDDataset(index, build_synthetic_corpus(), split="test",
                         imsize=64, num_frame_k=2, image_root=root)
    item = ds_auto[0]
    assert item["images"].shape == (2, 64, 64, 3)
