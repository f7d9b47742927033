"""Data pipeline tests: letterbox parity, chunking semantics, synthetic VID
end-to-end, referit pipeline, batch iterator sharding."""

import numpy as np
import pytest

from dcnet_tpu.data import transforms as T
from dcnet_tpu.data.corpus import Corpus
from dcnet_tpu.data.synthetic import (
    build_synthetic_corpus, generate_synthetic_vid, synthetic_phrases,
)
from dcnet_tpu.data.vid import VIDDataset, batch_iterator, get_chunks


def test_letterbox_matches_reference_geometry():
    rng = np.random.RandomState(0)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    out, ratio, dw, dh = T.letterbox(img, 256)
    assert out.shape == (256, 256, 3)
    assert abs(ratio - 256 / 320) < 1e-9
    assert abs(dw - 0.0) < 1e-9
    assert abs(dh - (256 - round(240 * 256 / 320)) / 2) < 1e-9
    # padding rows are the gray color
    assert np.all(np.abs(out[0].astype(float) - [124, 116, 104]) < 2)
    # round-trip box mapping
    bbox = np.array([10.0, 20.0, 100.0, 200.0])
    mapped = bbox.copy()
    mapped[[0, 2]] = mapped[[0, 2]] * ratio + dw
    mapped[[1, 3]] = mapped[[1, 3]] * ratio + dh
    back = T.inverse_letterbox_box(mapped, ratio, dw, dh)
    np.testing.assert_allclose(back, bbox, atol=1e-9)


def test_flip_swaps_phrase_and_box():
    img = np.zeros((10, 20, 3), np.uint8)
    bbox = np.array([2.0, 1.0, 8.0, 5.0])
    _, b2, p2 = T.horizontal_flip(img, bbox, "left of the right pole")
    assert p2 == "right of the left pole"
    np.testing.assert_allclose(b2, [20 - 8 - 1, 1, 20 - 2 - 1, 5])


def test_hsv_jitter_legacy_mode():
    """legacy_hsv=True reproduces the reference's saturation no-op
    (vid_loader.py:360-365 never multiplies S by `a`) while consuming the
    same RNG draws, so downstream augmentation geometry is unchanged."""
    rng0 = np.random.RandomState(7)
    img = (rng0.rand(32, 32, 3) * 255).astype(np.uint8)

    legacy = T.hsv_jitter(img, np.random.default_rng(3), legacy_hsv=True)
    fixed = T.hsv_jitter(img, np.random.default_rng(3), legacy_hsv=False)

    def sat(x):
        return T.cv2.cvtColor(T.cv2.cvtColor(x, T.cv2.COLOR_RGB2BGR),
                              T.cv2.COLOR_BGR2HSV)[:, :, 1].astype(float)

    # seed 3 first draw: a < 1, so the fixed path visibly dims saturation
    assert np.mean(sat(legacy)) > np.mean(sat(fixed)) + 1.0
    # same number of RNG draws in both modes
    r1, r2 = np.random.default_rng(3), np.random.default_rng(3)
    T.hsv_jitter(img, r1, legacy_hsv=True)
    T.hsv_jitter(img, r2, legacy_hsv=False)
    assert r1.random() == r2.random()


def test_wrap_points_identity():
    bbox = np.array([10.0, 20.0, 50.0, 70.0])
    out = T.wrap_points(bbox, np.eye(3), 100, 0.0)
    np.testing.assert_allclose(out, bbox, atol=1e-9)


def test_get_chunks_windowing():
    # k=2: frames [i-1, i], valid centers 1..n-2 (vid_loader.py:159-167)
    track = [[f"f{i}.jpg", [0, 0, 1, 1], "p"] for i in range(6)]
    chunks = get_chunks([track], "test", 2)
    assert len(chunks) == 4
    assert chunks[0][0] == ["f0.jpg", "f1.jpg"]
    assert chunks[-1][0] == ["f3.jpg", "f4.jpg"]
    # k=5: frames [i-2, i+2], centers 2..n-4
    chunks5 = get_chunks([track], "test", 5)
    assert len(chunks5) == 1
    assert chunks5[0][0] == [f"f{i}.jpg" for i in range(5)]


def test_synthetic_vid_end_to_end(tmp_path):
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "train", num_videos=2,
                                   frames_per_video=5)
    corpus = build_synthetic_corpus()
    ds = VIDDataset(index, corpus, split="train", imsize=64, num_frame_k=2,
                    image_root=root)
    assert len(ds) > 0
    item = ds[0]
    assert item["images"].shape == (2, 64, 64, 3)
    assert item["word_ids"].shape == (2, 20)
    assert item["bbox"].shape == (2, 4)
    assert np.isfinite(item["images"]).all()
    b = item["bbox"]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
    assert (b >= 0).all() and (b <= 64).all()
    # augmentations differ between epochs but are reproducible within one
    item_a = ds[0]
    ds.set_epoch(0)
    item_b = ds[0]
    np.testing.assert_allclose(item_a["images"], item_b["images"])
    ds.set_epoch(1)
    item_c = ds[0]
    assert np.abs(item_c["images"] - item_a["images"]).max() > 1e-3


def test_testmode_returns_geometry(tmp_path):
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "test", num_videos=2,
                                   frames_per_video=6)
    corpus = build_synthetic_corpus()
    ds = VIDDataset(index, corpus, split="test", imsize=64, num_frame_k=5,
                    image_root=root, testmode=True)
    item = ds[0]
    assert item["ratio"].shape == (5,) and item["dw"].shape == (5,)
    assert len(item["paths"]) == 5 and len(item["phrases"]) == 5
    # inverse letterbox returns the original-scale box
    back = T.inverse_letterbox_box(
        item["bbox"][0].astype(np.float64), float(item["ratio"][0]),
        float(item["dw"][0]), float(item["dh"][0]))
    assert back[2] <= 480 + 1 and back[3] <= 320 + 1


def test_batch_iterator_sharding(tmp_path):
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "test", num_videos=3,
                                   frames_per_video=6)
    corpus = build_synthetic_corpus()
    ds = VIDDataset(index, corpus, split="test", imsize=64, num_frame_k=2,
                    image_root=root)
    all_batches = list(batch_iterator(ds, 2, drop_last=False))
    shard0 = list(batch_iterator(ds, 2, drop_last=False, num_shards=2,
                                 shard_index=0))
    shard1 = list(batch_iterator(ds, 2, drop_last=False, num_shards=2,
                                 shard_index=1))
    n_all = sum(b["images"].shape[0] for b in all_batches)
    n_sh = sum(b["images"].shape[0] for b in shard0 + shard1)
    assert n_all == n_sh == len(ds)
    assert all_batches[0]["images"].shape[1:] == (2, 64, 64, 3)
    # threaded loading gives identical batches
    threaded = list(batch_iterator(ds, 2, drop_last=False, num_workers=4))
    np.testing.assert_allclose(threaded[0]["images"],
                               all_batches[0]["images"])


def test_batch_iterator_process_workers(tmp_path, monkeypatch):
    """Worker processes (the torch DataLoader analog) yield exactly the
    batches the in-process path yields. The single-core guard is bypassed
    so the fork-pool machinery actually runs."""
    import dcnet_tpu.data.vid as vidmod

    root = str(tmp_path)
    index = generate_synthetic_vid(root, "train", num_videos=2,
                                   frames_per_video=5)
    corpus = build_synthetic_corpus()
    ds = VIDDataset(index, corpus, split="train", imsize=64, num_frame_k=2,
                    image_root=root)
    monkeypatch.setattr(vidmod.os, "cpu_count", lambda: 4)
    got = list(batch_iterator(ds, 2, num_workers=2, worker_type="process"))
    want = list(batch_iterator(ds, 2, num_workers=0))
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["images"], w["images"])
        np.testing.assert_array_equal(g["word_ids"], w["word_ids"])
        np.testing.assert_array_equal(g["bbox"], w["bbox"])


def test_referit_dataset(tmp_path):
    import cv2
    import json
    root = str(tmp_path)
    img = np.zeros((100, 150, 3), np.uint8)
    img[20:60, 30:90] = (200, 30, 30)
    cv2.imwrite(f"{root}/img0.jpg", img)
    index = [["img0.jpg", [30, 20, 90, 60], "the red patch"]]
    with open(f"{root}/referit_test.json", "w") as f:
        json.dump(index, f)
    from dcnet_tpu.data.referit import ReferItDataset
    corpus = Corpus.build(["the red patch"])
    ds = ReferItDataset(f"{root}/referit_test.json", corpus, imsize=64,
                        image_root=root, testmode=True)
    item = ds[0]
    assert item["images"].shape == (1, 64, 64, 3)
    assert item["word_ids"].shape == (1, 20)


def test_refcoco_xywh_conversion(tmp_path):
    import cv2
    import json
    root = str(tmp_path)
    cv2.imwrite(f"{root}/c.jpg", np.zeros((50, 50, 3), np.uint8))
    index = [["c.jpg", None, [10, 10, 20, 15], "thing", []]]
    with open(f"{root}/unc_test.json", "w") as f:
        json.dump(index, f)
    from dcnet_tpu.data.referit import ReferItDataset
    ds = ReferItDataset(f"{root}/unc_test.json", Corpus.build(["thing"]),
                        dataset="unc", imsize=50, image_root=root)
    item = ds[0]
    np.testing.assert_allclose(item["bbox"][0], [10, 10, 30, 25], atol=0.5)


def test_grain_pipeline(tmp_path):
    from dcnet_tpu.data.grain_pipeline import grain_loader
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "train", num_videos=3,
                                   frames_per_video=6)
    ds = VIDDataset(index, build_synthetic_corpus(), split="train", imsize=64,
                    num_frame_k=2, image_root=root)
    batches = list(grain_loader(ds, batch_size=2, shuffle=True, seed=0))
    assert len(batches) == len(ds) // 2
    assert batches[0]["images"].shape == (2, 2, 64, 64, 3)
    # deterministic under the same seed
    again = list(grain_loader(ds, batch_size=2, shuffle=True, seed=0))
    np.testing.assert_allclose(batches[0]["images"], again[0]["images"])


def test_prefetch_to_device(tmp_path):
    from dcnet_tpu.data.vid import prefetch_to_device
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "test", num_videos=2,
                                   frames_per_video=6)
    ds = VIDDataset(index, build_synthetic_corpus(), split="test", imsize=64,
                    num_frame_k=2, image_root=root)
    plain = list(batch_iterator(ds, 2, drop_last=False))
    fetched = list(prefetch_to_device(
        batch_iterator(ds, 2, drop_last=False), size=2))
    assert len(plain) == len(fetched)
    for a, b in zip(plain, fetched):
        np.testing.assert_allclose(a["images"], np.asarray(b["images"]))


def test_vid_dataset_bert_tokenizer(tmp_path):
    from dcnet_tpu.data.bert_tokenize import FallbackBertTokenizer
    root = str(tmp_path)
    index = generate_synthetic_vid(root, "test", num_videos=1,
                                   frames_per_video=5)
    ds = VIDDataset(index, corpus=None, split="test", imsize=64,
                    num_frame_k=2, image_root=root,
                    bert_tokenizer=FallbackBertTokenizer())
    item = ds[0]
    assert item["word_ids"].shape == (2, 20)
    assert item["word_ids"][0, 0] == 101          # [CLS]
    assert (item["word_mask"][0] >= 0).all()
    assert item["word_mask"][0].sum() > 2         # real tokens masked 1


class _RefDict:  # stand-in matching the reference pickle's attribute layout
    def __init__(self):
        self.idx2word = ["a", "red", "thing", "<unk>", "<pad>", "<eos>"]


class _RefCorpus:
    def __init__(self):
        self.dictionary = _RefDict()


def test_torch_pth_index_ingestion(tmp_path):
    """The reference ships torch-pickled index files
    (data/VID/VID_video_level_{split}.pth, vid_loader.py:270); our loader
    must ingest them directly."""
    import cv2
    import torch
    root = str(tmp_path)
    img = np.zeros((60, 80, 3), np.uint8)
    img[10:40, 20:60] = (180, 40, 40)
    cv2.imwrite(f"{root}/f0.jpg", img)
    cv2.imwrite(f"{root}/f1.jpg", img)
    cv2.imwrite(f"{root}/f2.jpg", img)
    track = [[f"f{i}.jpg", [20, 10, 60, 40], "a red thing"] for i in range(3)]
    torch.save([track], f"{root}/VID_video_level_test.pth")
    ds = VIDDataset(f"{root}/VID_video_level_test.pth",
                    Corpus.build(["a red thing"]), split="test", imsize=64,
                    num_frame_k=2, image_root=root)
    item = ds[0]
    assert item["images"].shape == (2, 64, 64, 3)

    # reference corpus.pth ingestion (utils.word_utils.Corpus pickle)
    import sys, types
    from dcnet_tpu.data.corpus import load_reference_corpus

    mod = types.ModuleType("utils.word_utils")
    mod.Corpus, mod.Dictionary = _RefCorpus, _RefDict
    sys.modules.setdefault("utils", types.ModuleType("utils"))
    sys.modules["utils.word_utils"] = mod
    _RefCorpus.__module__ = "utils.word_utils"
    _RefDict.__module__ = "utils.word_utils"
    _RefCorpus.__qualname__ = "Corpus"
    _RefDict.__qualname__ = "Dictionary"
    torch.save(_RefCorpus(), f"{root}/corpus.pth")
    c = load_reference_corpus(f"{root}/corpus.pth")
    assert len(c) == 6 and "red" in c


def test_resize_pad_geometry():
    """resize_pad: aspect-preserving scale + centered zero padding
    (ResizePad parity, reference utils/transforms.py:16-46)."""
    import dcnet_tpu.data.transforms as T

    img = np.full((100, 200, 3), 255, np.uint8)
    out = T.resize_pad(img, (64, 64))
    assert out.shape == (64, 64, 3)
    # scale 0.32 -> 32x64 content, centered vertically at rows 16..48
    assert (out[16:48] == 255).all()
    assert (out[:16] == 0).all() and (out[48:] == 0).all()
    gray = T.resize_pad(np.full((50, 50), 7, np.uint8), (64, 32))
    assert gray.shape == (64, 32, 1)  # grayscale comes back HW1


def test_crop_resize_inverts_resize_pad():
    """crop_resize recovers a smooth map embedded by resize_pad (the
    reference pairs them as pad-for-net / unpad-for-eval)."""
    import dcnet_tpu.data.transforms as T

    yy, xx = np.mgrid[0:40, 0:80].astype(np.float32)
    field = (yy / 40 + xx / 80) / 2
    padded = T.resize_pad(field, (64, 64))[..., 0]
    # undo: network output (64x64) back to the original 40x80 geometry
    recovered = np.asarray(T.crop_resize(padded, (40, 80)))
    assert recovered.shape == (40, 80)
    inner = (slice(4, 36), slice(8, 72))  # away from pad-boundary blur
    assert np.abs(recovered[inner] - field[inner]).max() < 0.05


def test_resize_image_and_annotation_scale_largest_side():
    """resize_image / resize_annotation: largest side -> size, aspect kept
    (ResizeImage/ResizeAnnotation parity, reference transforms.py:78-114)."""
    import dcnet_tpu.data.transforms as T

    img = np.random.RandomState(0).rand(3, 60, 120).astype(np.float32)
    out = np.asarray(T.resize_image(img, 32))
    assert out.shape == (3, 16, 32)
    ann = np.random.RandomState(1).rand(90, 45).astype(np.float32)
    out2 = np.asarray(T.resize_annotation(ann, 30))
    assert out2.shape == (30, 15)
    # constant maps stay constant under bilinear resampling
    const = np.asarray(T.resize_annotation(np.ones((50, 70), np.float32), 35))
    np.testing.assert_allclose(const, 1.0, atol=1e-6)
