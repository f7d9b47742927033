"""VID video-clip grounding dataset + host input pipeline.

Rebuilds `/root/reference/dataset/vid_loader.py:143-440`:
- `get_chunks` sliding-window clip extraction over the video-level index
  (`getChunk`, :143-180), including the train-time random annotation-track
  pick per video;
- per-item pipeline: decode -> joint augment (flip + phrase left/right swap,
  HSV jitter, letterbox, per-frame random affine) -> normalize -> tokenize;
- test mode additionally returns (ratio, dw, dh, paths, phrases).

Index formats: the reference's torch-pickled `VID_video_level_{split}.pth`
(loaded via torch when available) or a native JSON with the same nesting:
train: [video][track][frame] = [img_path, [x1,y1,x2,y2], phrase]
test:  [video][frame] = [img_path, [x1,y1,x2,y2], phrase]
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from dcnet_tpu.data.corpus import Corpus
from dcnet_tpu.data import transforms as T


Frame = Tuple[str, Sequence[float], str]
# (frame paths, boxes, phrases, video index) — the video index marks clip
# provenance so temporal fusion never crosses a video boundary
# (the reference keys its cache files by video dir, test_DCNet.py:641-648).
Chunk = Tuple[List[str], List[np.ndarray], List[str], int]


def load_index(path: str) -> List:
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def get_chunks(videos: List, split: str, num_frame_k: int,
               rng: Optional[np.random.Generator] = None) -> List[Chunk]:
    """Sliding window of `num_frame_k` consecutive frames per center index
    (vid_loader.py:143-180). Train picks one random track per video."""
    rng = rng or np.random.default_rng(0)
    num_floor = int(math.floor(num_frame_k / 2))
    num_ceil = int(math.ceil(num_frame_k / 2))
    chunks: List[Chunk] = []
    for video_id, vid in enumerate(videos):
        track = vid[int(rng.integers(0, len(vid)))] if split == "train" else vid
        n = len(track)
        for center in range(n):
            if center - num_floor < 0 or center + num_ceil > n - 1:
                continue
            paths, boxes, phrases = [], [], []
            for i in range(center - num_floor, center + num_ceil):
                f = track[int(np.clip(i, 0, n - 1))]
                paths.append(f[0])
                boxes.append(np.asarray(f[1], np.float64))
                phrases.append(str(f[2]))
            chunks.append((paths, boxes, phrases, video_id))
    return chunks


class VIDDataset:
    """Map-style clip dataset. `__getitem__` returns numpy arrays ready to
    stack into a batch."""

    def __init__(
        self, index_path: str, corpus: Optional[Corpus], split: str = "train",
        imsize: int = 256, num_frame_k: int = 2, max_query_len: int = 20,
        augment: Optional[bool] = None, testmode: bool = False,
        image_root: str = "", seed: int = 13,
        bert_tokenizer: Optional[Any] = None, legacy_hsv: bool = False,
        use_native: Optional[bool] = None,
    ):
        self.legacy_hsv = legacy_hsv
        self.use_native = use_native
        self.imsize = imsize
        self.k = num_frame_k
        self.query_len = max_query_len
        self.corpus = corpus
        self.bert_tokenizer = bert_tokenizer
        self.testmode = testmode
        self.augment = (split == "train") if augment is None else augment
        self.image_root = image_root
        self.seed = seed
        self.split = split
        self._videos = load_index(index_path)
        self.set_epoch(0)

    def set_epoch(self, epoch: int) -> None:
        """Re-draw the random track picks (DistributedSampler.set_epoch
        analog for the track-sampling randomness)."""
        rng = np.random.default_rng(self.seed + epoch)
        self.chunks = get_chunks(self._videos, self.split, self.k, rng)
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.chunks)

    def _native_on(self) -> bool:
        """use_native=None resolves to 'if the C++ core is available'."""
        if self.use_native is False:
            return False
        from dcnet_tpu import native
        ok = native.available()
        if self.use_native and not ok:  # explicit request must not be silent
            raise RuntimeError(
                f"native loader requested but unavailable: "
                f"{native.unavailable_reason()}")
        return ok

    def _read_image(self, path: str) -> np.ndarray:
        full = os.path.join(self.image_root, path)
        img = T.cv2.imread(full)
        if img is None:
            raise FileNotFoundError(full)
        if img.ndim == 2 or img.shape[-1] == 1:
            img = np.stack([np.squeeze(img)] * 3, axis=-1)
        else:
            img = T.cv2.cvtColor(img, T.cv2.COLOR_BGR2RGB)
        return img

    def _read_images(self, paths: List[str]) -> List[np.ndarray]:
        """Decode all frames of a clip; the C++ core decodes them in
        parallel (dcnet_tpu/native), the fallback loops over cv2."""
        if self._native_on():
            from dcnet_tpu import native
            full = [os.path.join(self.image_root, p) for p in paths]
            imgs = native.decode_batch_rgb(full)
            for p, im in zip(full, imgs):
                if im is None:
                    raise FileNotFoundError(p)
            return imgs
        return [self._read_image(p) for p in paths]

    def _tokenize(self, phrase: str) -> Tuple[np.ndarray, np.ndarray]:
        if self.corpus is not None:
            ids = self.corpus.tokenize(phrase, self.query_len)
            return ids, np.zeros_like(ids)
        from dcnet_tpu.data.bert_tokenize import encode_phrase
        return encode_phrase(self.bert_tokenizer, phrase, self.query_len)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        idx = int(idx)  # numpy ints overflow the seed arithmetic below
        paths, bboxs, phrases, video_id = self.chunks[idx]
        bboxs = [b.copy() for b in bboxs]
        phrases = [p.lower() for p in phrases]
        ori_phrases = list(phrases)
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self._epoch * 10_007 + idx) % (2 ** 63))

        if not self.augment and self._native_on():
            # Fused native fast path: one C call decodes + letterboxes +
            # normalizes the whole clip in parallel (bit-identical to the
            # Python path below; tests/test_native.py).
            from dcnet_tpu import native
            full = [os.path.join(self.image_root, p) for p in paths]
            images, ratios, dws, dhs, ok = native.decode_letterbox_batch(
                full, self.imsize, T.IMAGENET_MEAN, T.IMAGENET_STD)
            if not ok.all():
                raise FileNotFoundError(full[int(np.argmin(ok))])
            for i in range(self.k):
                bboxs[i][[0, 2]] = bboxs[i][[0, 2]] * ratios[i] + dws[i]
                bboxs[i][[1, 3]] = bboxs[i][[1, 3]] * ratios[i] + dhs[i]
            return self._pack(images, bboxs, phrases, ori_phrases,
                              list(ratios), list(dws), list(dhs),
                              video_id, paths)

        imgs = self._read_images(paths)
        ratios, dws, dhs = [], [], []
        if self.augment:
            if rng.random() > 0.5:  # shared flip (vid_loader.py:351-355)
                for i in range(self.k):
                    imgs[i], bboxs[i], phrases[i] = T.horizontal_flip(
                        imgs[i], bboxs[i], phrases[i])
            for i in range(self.k):  # per-frame HSV + letterbox
                img = T.hsv_jitter(imgs[i], rng, legacy_hsv=self.legacy_hsv)
                imgs[i], ratio, dw, dh = T.letterbox(img, self.imsize)
                ratios.append(ratio); dws.append(dw); dhs.append(dh)
                bboxs[i][[0, 2]] = bboxs[i][[0, 2]] * ratio + dw
                bboxs[i][[1, 3]] = bboxs[i][[1, 3]] * ratio + dh
            for i in range(self.k):  # per-frame affine (vid_loader.py:381-384)
                imgs[i], bboxs[i], _, _ = T.random_affine(imgs[i], bboxs[i], rng)
        else:
            for i in range(self.k):
                imgs[i], ratio, dw, dh = T.letterbox(imgs[i], self.imsize)
                ratios.append(ratio); dws.append(dw); dhs.append(dh)
                bboxs[i][[0, 2]] = bboxs[i][[0, 2]] * ratio + dw
                bboxs[i][[1, 3]] = bboxs[i][[1, 3]] * ratio + dh

        images = np.stack([T.normalize_image(im) for im in imgs])  # (k,H,W,3)
        return self._pack(images, bboxs, phrases, ori_phrases,
                          ratios, dws, dhs, video_id, paths)

    def _pack(self, images, bboxs, phrases, ori_phrases, ratios, dws, dhs,
              video_id, paths) -> Dict[str, np.ndarray]:
        ids_masks = [self._tokenize(p) for p in phrases]
        word_ids = np.stack([im[0] for im in ids_masks]).astype(np.int32)
        word_mask = np.stack([im[1] for im in ids_masks]).astype(np.int32)
        out = {
            "images": images.astype(np.float32),
            "word_ids": word_ids,
            "word_mask": word_mask,
            "bbox": np.stack(bboxs).astype(np.float32),
        }
        if self.testmode:
            out["ratio"] = np.asarray(ratios, np.float32)
            out["dw"] = np.asarray(dws, np.float32)
            out["dh"] = np.asarray(dhs, np.float32)
            out["video_id"] = np.asarray(video_id, np.int32)
            out["paths"] = paths
            out["phrases"] = ori_phrases
        return out


_WORKER_DS = None


def _init_worker(dataset) -> None:
    global _WORKER_DS
    _WORKER_DS = dataset
    try:  # one cv2 thread per worker process (vid_loader.py:34)
        import cv2
        cv2.setNumThreads(0)
    except Exception:
        pass


def _worker_get(idx: int):
    return _WORKER_DS[idx]


def batch_iterator(
    dataset, batch_size: int, shuffle: bool = False, seed: int = 0,
    drop_last: bool = True, num_shards: int = 1, shard_index: int = 0,
    num_workers: int = 0, worker_type: str = "process",
) -> Iterator[Dict[str, np.ndarray]]:
    """Minimal host batch iterator with per-host sharding
    (DistributedSampler analog, train_DCNet.py:467-478) and parallel
    decoding. num_workers > 0 uses worker PROCESSES by default (the torch
    DataLoader analog — cv2 decode/augment is GIL-bound, so threads cap at
    ~1 core); worker_type="thread" keeps the in-process pool (cheap for
    tiny smoke datasets, required for unpicklable datasets)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    order = order[shard_index::num_shards]
    n = len(order)

    def collate(items):
        out: Dict[str, Any] = {}
        for key in items[0]:
            vals = [it[key] for it in items]
            if isinstance(vals[0], np.ndarray):
                out[key] = np.stack(vals)
            else:
                out[key] = vals
        return out

    def batches_from(get_many):
        for start in range(0, n, batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) < batch_size and drop_last:
                break
            yield collate(get_many([int(i) for i in idxs]))

    if num_workers > 0 and worker_type == "process" and (os.cpu_count() or 1) > 1:
        # worker processes only pay off with >1 core (single-core hosts —
        # like this dev image — are faster in-process: no IPC)
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        try:
            ctx = mp.get_context("fork")  # cheap worker start on linux
        except ValueError:  # pragma: no cover
            ctx = mp.get_context()
        try:
            with ProcessPoolExecutor(num_workers, mp_context=ctx,
                                     initializer=_init_worker,
                                     initargs=(dataset,)) as pool:
                yield from batches_from(
                    lambda idxs: list(pool.map(_worker_get, idxs,
                                               chunksize=1)))
            return
        except (TypeError, AttributeError, ImportError):
            pass  # unpicklable dataset -> thread fallback below
    if num_workers > 0:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(num_workers) as pool:
            yield from batches_from(
                lambda idxs: list(pool.map(dataset.__getitem__, idxs)))
    else:
        yield from batches_from(lambda idxs: [dataset[i] for i in idxs])


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Decode-ahead + async H2D transfer (the DataLoader worker/pin_memory
    analog, train_DCNet.py:473-478): a background thread keeps `size`
    batches in flight so host preprocessing overlaps device compute."""
    import queue
    import threading

    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def put(batch):
        from dcnet_tpu.parallel.mesh import place_host_batch
        dev = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                dev[k] = (place_host_batch(sharding, v)
                          if sharding is not None else jax.device_put(v))
            else:
                dev[k] = v
        q.put(dev)

    def producer():
        try:
            for batch in iterator:
                put(batch)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
