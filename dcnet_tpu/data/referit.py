"""Single-image referring-expression datasets.

Rebuilds `/root/reference/dataset/referit_loader.py:147-340`: the same
decode/augment/letterbox/tokenize pipeline over per-image index entries for
referit / flickr / unc(+) / gref / OTB. RefCOCO-family boxes arrive as
xywh and are converted to xyxy (referit_loader pull_item; the same
`bbox[2:] += bbox[:2]` rule as vid_loader.py:299-301's else branch).

Index: the reference's `{dataset}_{split}.pth` torch pickles or a native
JSON list with the same per-entry tuples.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from dcnet_tpu.data.corpus import Corpus
from dcnet_tpu.data import transforms as T

_XYWH_DATASETS = {"unc", "unc+", "gref"}


def load_index(path: str) -> List:
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


class ReferItDataset:
    def __init__(
        self, index_path: str, corpus: Optional[Corpus],
        dataset: str = "referit", imsize: int = 256, max_query_len: int = 20,
        augment: bool = False, testmode: bool = False, image_root: str = "",
        seed: int = 13, bert_tokenizer: Optional[Any] = None,
        legacy_hsv: bool = False, use_native: Optional[bool] = None,
    ):
        self.legacy_hsv = legacy_hsv
        self.use_native = use_native
        self.entries = load_index(index_path)
        self.dataset = dataset
        self.imsize = imsize
        self.query_len = max_query_len
        self.corpus = corpus
        self.bert_tokenizer = bert_tokenizer
        self.augment = augment
        self.testmode = testmode
        self.image_root = image_root
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.entries)

    def _unpack(self, entry) -> Tuple[str, np.ndarray, str]:
        if len(entry) >= 5:      # refcoco family: (img, mask, bbox, phrase, attri)
            img_file, _, bbox, phrase = entry[0], entry[1], entry[2], entry[3]
        else:                     # referit/flickr/VID/OTB: (img, bbox, phrase)
            img_file, bbox, phrase = entry[0], entry[1], entry[2]
        # np.array (not asarray): always copy, so in-place letterbox scaling
        # in __getitem__ can never corrupt the stored index entry when a
        # .pth index already holds float64 arrays (ADVICE r2).
        bbox = np.array(bbox, np.float64)
        if self.dataset in _XYWH_DATASETS:
            bbox[2] += bbox[0]
            bbox[3] += bbox[1]
        return img_file, bbox, str(phrase)

    def _tokenize(self, phrase: str) -> Tuple[np.ndarray, np.ndarray]:
        if self.corpus is not None:
            ids = self.corpus.tokenize(phrase, self.query_len)
            return ids, np.zeros_like(ids)
        from dcnet_tpu.data.bert_tokenize import encode_phrase
        return encode_phrase(self.bert_tokenizer, phrase, self.query_len)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        idx = int(idx)
        img_file, bbox, phrase = self._unpack(self.entries[idx])
        phrase = phrase.lower()
        ori_phrase = phrase
        full = os.path.join(self.image_root, img_file)
        native = None
        if self.use_native is not False:
            from dcnet_tpu import native as _native
            if _native.available():
                native = _native
            elif self.use_native:
                raise RuntimeError(
                    f"native loader requested but unavailable: "
                    f"{_native.unavailable_reason()}")
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self._epoch * 10_007 + idx) % (2 ** 63))

        if not self.augment and native is not None:
            # fused C++ decode+letterbox+normalize (dcnet_tpu/native)
            images, ratios, dws, dhs, ok = native.decode_letterbox_batch(
                [full], self.imsize, T.IMAGENET_MEAN, T.IMAGENET_STD)
            if not ok[0]:
                raise FileNotFoundError(full)
            ratio, dw, dh = float(ratios[0]), float(dws[0]), float(dhs[0])
            bbox[[0, 2]] = bbox[[0, 2]] * ratio + dw
            bbox[[1, 3]] = bbox[[1, 3]] * ratio + dh
            word_ids, word_mask = self._tokenize(phrase)
            out = {
                "images": images.astype(np.float32),  # (1,H,W,3)
                "word_ids": word_ids[None].astype(np.int32),
                "word_mask": word_mask[None].astype(np.int32),
                "bbox": bbox[None].astype(np.float32),
            }
            if self.testmode:
                out["ratio"] = np.asarray([ratio], np.float32)
                out["dw"] = np.asarray([dw], np.float32)
                out["dh"] = np.asarray([dh], np.float32)
                out["paths"] = [img_file]
                out["phrases"] = [ori_phrase]
            return out

        if native is not None:
            img = native.decode_batch_rgb([full])[0]
            if img is None:
                raise FileNotFoundError(full)
        else:
            img = T.cv2.imread(full)
            if img is None:
                raise FileNotFoundError(img_file)
            img = T.cv2.cvtColor(img, T.cv2.COLOR_BGR2RGB)

        if self.augment:
            if rng.random() > 0.5:
                img, bbox, phrase = T.horizontal_flip(img, bbox, phrase)
            img = T.hsv_jitter(img, rng, legacy_hsv=self.legacy_hsv)
            img, ratio, dw, dh = T.letterbox(img, self.imsize)
            bbox[[0, 2]] = bbox[[0, 2]] * ratio + dw
            bbox[[1, 3]] = bbox[[1, 3]] * ratio + dh
            img, bbox, _, _ = T.random_affine(img, bbox, rng)
        else:
            img, ratio, dw, dh = T.letterbox(img, self.imsize)
            bbox[[0, 2]] = bbox[[0, 2]] * ratio + dw
            bbox[[1, 3]] = bbox[[1, 3]] * ratio + dh

        word_ids, word_mask = self._tokenize(phrase)
        out = {
            "images": T.normalize_image(img)[None].astype(np.float32),  # (1,H,W,3)
            "word_ids": word_ids[None].astype(np.int32),
            "word_mask": word_mask[None].astype(np.int32),
            "bbox": bbox[None].astype(np.float32),
        }
        if self.testmode:
            out["ratio"] = np.asarray([ratio], np.float32)
            out["dw"] = np.asarray([dw], np.float32)
            out["dh"] = np.asarray([dh], np.float32)
            out["paths"] = [img_file]
            out["phrases"] = [ori_phrase]
        return out
