"""Synthetic grounding data for tests and data-free benchmarking.

The reference has no fixtures at all (SURVEY.md §4); this module generates
procedural "videos" — a colored rectangle moving over a textured background,
with a phrase naming its color/size — in the exact nested-index format of
`data/VID/VID_video_level_{split}.pth`, so the real VIDDataset pipeline
(decode -> augment -> letterbox -> tokenize) is exercised end-to-end.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

from dcnet_tpu.data.corpus import Corpus

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 60), "blue": (40, 70, 200),
    "yellow": (220, 200, 40), "purple": (150, 60, 180),
}
SIZES = {"small": 30, "large": 70}


def synthetic_phrases() -> List[str]:
    return [f"the {s} {c} box moving {d}"
            for s in SIZES for c in COLORS for d in ("left", "right")]


def build_synthetic_corpus() -> Corpus:
    return Corpus.build(synthetic_phrases())


def _render_frame(rng: np.random.Generator, h: int, w: int,
                  color: Tuple[int, int, int], cx: float, cy: float,
                  side: int) -> Tuple[np.ndarray, np.ndarray]:
    img = (rng.integers(0, 80, (h, w, 3))).astype(np.uint8)
    x1 = int(np.clip(cx - side / 2, 0, w - 2))
    y1 = int(np.clip(cy - side / 2, 0, h - 2))
    x2 = int(np.clip(cx + side / 2, x1 + 1, w - 1))
    y2 = int(np.clip(cy + side / 2, y1 + 1, h - 1))
    img[y1:y2, x1:x2] = np.asarray(color, np.uint8)
    return img, np.asarray([x1, y1, x2, y2], np.float64)


def generate_synthetic_vid(
    root: str, split: str = "train", num_videos: int = 4,
    frames_per_video: int = 6, height: int = 320, width: int = 480,
    seed: int = 0,
) -> str:
    """Write JPEG frames + a JSON index under `root`. Returns the index path.

    Train index nesting: [video][track][frame]; test: [video][frame]
    (matching getChunk's two shapes, vid_loader.py:150-155).
    """
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    colors = list(COLORS)
    videos = []
    for v in range(num_videos):
        color_name = colors[int(rng.integers(len(colors)))]
        size_name = "small" if rng.random() < 0.5 else "large"
        direction = "left" if rng.random() < 0.5 else "right"
        phrase = f"the {size_name} {color_name} box moving {direction}"
        side = SIZES[size_name]
        cx = rng.uniform(side, width - side)
        cy = rng.uniform(side, height - side)
        vx = (-1 if direction == "left" else 1) * rng.uniform(5, 15)
        track = []
        for f in range(frames_per_video):
            img, bbox = _render_frame(
                rng, height, width, COLORS[color_name], cx, cy, side)
            rel = os.path.join("frames", f"v{v:03d}_f{f:03d}.jpg")
            cv2.imwrite(os.path.join(root, rel),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            track.append([rel, bbox.tolist(), phrase])
            cx = float(np.clip(cx + vx, side / 2, width - side / 2))
            cy = float(np.clip(cy + rng.uniform(-3, 3), side / 2,
                               height - side / 2))
        videos.append([track] if split == "train" else track)

    index_path = os.path.join(root, f"VID_video_level_{split}.json")
    with open(index_path, "w") as f:
        json.dump(videos, f)
    return index_path
