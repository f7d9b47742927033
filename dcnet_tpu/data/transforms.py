"""Host-side image transforms (numpy/cv2) for the input pipeline.

Rebuilds `/root/reference/utils/transforms.py:123-275` and the augmentation
block of `dataset/vid_loader.py:339-398`. These stay on host (outside jit)
for bit-parity with cv2's INTER_AREA letterbox and warpPerspective — the
device pipeline receives fixed-size normalized tensors (SURVEY.md §7.7).

Randomness comes from an explicit numpy Generator instead of the global
`random` module, so workers are reproducible and shardable.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)  # avoid contention in loader workers (vid_loader.py:34)
    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False

# ImageNet normalization (train_DCNet.py:420-425)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PAD_COLOR = (123.7, 116.3, 103.5)


def letterbox(img: np.ndarray, height: int,
              color: Tuple[float, float, float] = PAD_COLOR
              ) -> Tuple[np.ndarray, float, float, float]:
    """Aspect-preserving resize (INTER_AREA) + gray padding to a square.

    Returns (img, ratio, dw, dh) (utils/transforms.py:123-137)."""
    shape = img.shape[:2]
    ratio = float(height) / max(shape)
    new_shape = (round(shape[1] * ratio), round(shape[0] * ratio))
    dw = (height - new_shape[0]) / 2
    dh = (height - new_shape[1]) / 2
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    img = cv2.resize(img, new_shape, interpolation=cv2.INTER_AREA)
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, ratio, dw, dh


def inverse_letterbox_box(bbox: np.ndarray, ratio: float, dw: float,
                          dh: float) -> np.ndarray:
    """Map an xyxy box from letterboxed coords back to the original image."""
    out = bbox.astype(np.float64).copy()
    out[[0, 2]] = (out[[0, 2]] - dw) / ratio
    out[[1, 3]] = (out[[1, 3]] - dh) / ratio
    return out


def hsv_jitter(img: np.ndarray, rng: np.random.Generator,
               fraction: float = 0.50, legacy_hsv: bool = False) -> np.ndarray:
    """Random saturation/value scaling (vid_loader.py:357-373). img RGB.

    The reference draws the saturation factor `a` but never multiplies S by
    it (vid_loader.py:362-365 computes S and clips, sans `S *= a`), so its
    saturation jitter is a no-op. We apply the evidently intended jitter;
    `legacy_hsv=True` reproduces the reference's no-op exactly (the factor
    is still drawn, keeping the RNG sequence — and hence all downstream
    augmentation geometry — aligned with the fixed behavior).
    """
    img_hsv = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           cv2.COLOR_BGR2HSV)
    s = img_hsv[:, :, 1].astype(np.float32)
    v = img_hsv[:, :, 2].astype(np.float32)
    a = (rng.random() * 2 - 1) * fraction + 1
    if not legacy_hsv:
        s *= a
    if a > 1:
        np.clip(s, 0, 255, out=s)
    a = (rng.random() * 2 - 1) * fraction + 1
    v *= a
    if a > 1:
        np.clip(v, 0, 255, out=v)
    img_hsv[:, :, 1] = s.astype(np.uint8)
    img_hsv[:, :, 2] = v.astype(np.uint8)
    return cv2.cvtColor(cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR),
                        cv2.COLOR_BGR2RGB)


def horizontal_flip(img: np.ndarray, bbox: np.ndarray, phrase: str
                    ) -> Tuple[np.ndarray, np.ndarray, str]:
    """Flip + left/right phrase swap (vid_loader.py:351-355)."""
    w = img.shape[1]
    img = cv2.flip(img, 1)
    bbox = bbox.copy()
    bbox[0], bbox[2] = w - bbox[2] - 1, w - bbox[0] - 1
    phrase = (phrase.replace("right", "*&^special^&*")
              .replace("left", "right").replace("*&^special^&*", "left"))
    return img, bbox, phrase


def wrap_points(bbox: np.ndarray, M: np.ndarray, height: int,
                angle: float) -> np.ndarray:
    """Warp an xyxy box through the affine matrix with the reference's
    angle-based shrink + clipping (utils/transforms.py:236-275)."""
    points = bbox.astype(np.float64)
    xy = np.ones((4, 3))
    xy[:, :2] = points[[0, 1, 2, 3, 0, 3, 2, 1]].reshape(4, 2)
    xy = (xy @ M.T)[:, :2].reshape(1, 8)
    x = xy[:, [0, 2, 4, 6]]
    y = xy[:, [1, 3, 5, 7]]
    xy = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, 1).T
    radians = angle * math.pi / 180
    reduction = max(abs(math.sin(radians)), abs(math.cos(radians))) ** 0.5
    cx = (xy[:, 2] + xy[:, 0]) / 2
    cy = (xy[:, 3] + xy[:, 1]) / 2
    w = (xy[:, 2] - xy[:, 0]) * reduction
    h = (xy[:, 3] - xy[:, 1]) * reduction
    xy = np.concatenate((cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)
                        ).reshape(4, 1).T
    np.clip(xy, 0, height, out=xy)
    return xy[0]


def random_affine(
    img: np.ndarray, bbox: np.ndarray, rng: np.random.Generator,
    degrees: Tuple[float, float] = (-5, 5),
    translate: Tuple[float, float] = (0.10, 0.10),
    scale: Tuple[float, float] = (0.90, 1.10),
    shear: Tuple[float, float] = (-2, 2),
    border_value: Tuple[float, float, float] = PAD_COLOR,
    M: Optional[np.ndarray] = None, angle: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Rotation/scale/translation/shear warp of image + box
    (utils/transforms.py:139-185). Pass (M, angle) to share one transform
    across a clip (the random_affine_set variant, :187-234)."""
    height = max(img.shape[0], img.shape[1])
    if M is None:
        a = rng.random() * (degrees[1] - degrees[0]) + degrees[0]
        s = rng.random() * (scale[1] - scale[0]) + scale[0]
        R = np.eye(3)
        R[:2] = cv2.getRotationMatrix2D(
            angle=a, center=(img.shape[1] / 2, img.shape[0] / 2), scale=s)
        T = np.eye(3)
        T[0, 2] = (rng.random() * 2 - 1) * translate[0] * img.shape[0]
        T[1, 2] = (rng.random() * 2 - 1) * translate[1] * img.shape[1]
        S = np.eye(3)
        S[0, 1] = math.tan((rng.random() * (shear[1] - shear[0]) + shear[0])
                           * math.pi / 180)
        S[1, 0] = math.tan((rng.random() * (shear[1] - shear[0]) + shear[0])
                           * math.pi / 180)
        M = S @ T @ R
        angle = a
    imw = cv2.warpPerspective(img, M, dsize=(height, height),
                              flags=cv2.INTER_LINEAR, borderValue=border_value)
    new_bbox = wrap_points(bbox, M, height, angle)
    return imw, new_bbox, M, angle


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC -> float32 normalized (ToTensor + Normalize), kept HWC
    for the NHWC device pipeline."""
    return ((img.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """Inverse of normalize_image -> uint8 RGB (for visualization; fixes the
    reference's 0.299-vs-0.229 typo at train_DCNet.py:233)."""
    out = (img * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Dead-code parity: the reference exports four resize transforms that no DCNet
# path calls (/root/reference/utils/transforms.py:16-114, re-exported at
# utils/__init__.py:12-16 with only commented imports remaining). Ported for
# API completeness like the other dead components (losses_extra, segmentation
# metrics). Host-side ones stay numpy/cv2; the tensor-side ones use
# jax.image.resize (the reference used torch F.upsample bilinear).
# ---------------------------------------------------------------------------


def resize_pad(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Aspect-preserving resize + center-pad to (h, w) with zeros
    (ResizePad, /root/reference/utils/transforms.py:16-46). Grayscale
    inputs come back HW1, color HWC — matching the reference's contract."""
    out_h, out_w = size
    h, w = img.shape[:2]
    scale = min(out_h / h, out_w / w)
    rh, rw = int(np.round(h * scale)), int(np.round(w * scale))
    pad_h, pad_w = (out_h - rh) // 2, (out_w - rw) // 2
    resized = cv2.resize(img, (rw, rh))
    if img.ndim <= 2:
        resized = resized[..., None]
    out = np.zeros((out_h, out_w, resized.shape[-1]), resized.dtype)
    out[pad_h:pad_h + rh, pad_w:pad_w + rw] = resized
    return out


def crop_resize(img, size: Tuple[int, int]):
    """Undo resize_pad on a 2-D map: bilinear-resize by the MAX ratio, then
    center-crop to (h, w) (CropResize, reference transforms.py:49-75 —
    the inverse used to map mask predictions back to input geometry)."""
    import jax.numpy as jnp
    from jax.image import resize as jresize

    img = jnp.asarray(img)
    in_h, in_w = size
    im_h, im_w = img.shape[:2]
    scale = max(in_h / im_h, in_w / im_w)
    rh, rw = int(np.round(im_h * scale)), int(np.round(im_w * scale))
    crop_h, crop_w = (rh - in_h) // 2, (rw - in_w) // 2
    resized = jresize(img, (rh, rw), method="bilinear")
    return resized[crop_h:crop_h + in_h, crop_w:crop_w + in_w]


def resize_image(img, size: int):
    """Scale so the LARGEST side equals `size` (aspect kept), bilinear —
    CHW tensor in/out (ResizeImage, reference transforms.py:78-94)."""
    import jax.numpy as jnp
    from jax.image import resize as jresize

    img = jnp.asarray(img)
    im_h, im_w = img.shape[-2:]
    scale = min(size / im_h, size / im_w)
    rh, rw = int(np.round(im_h * scale)), int(np.round(im_w * scale))
    return jresize(img, (*img.shape[:-2], rh, rw), method="bilinear")


def resize_annotation(ann, size: int):
    """resize_image for a 2-D annotation/mask map (ResizeAnnotation,
    reference transforms.py:97-114)."""
    import jax.numpy as jnp
    from jax.image import resize as jresize

    ann = jnp.asarray(ann)
    im_h, im_w = ann.shape[-2:]
    scale = min(size / im_h, size / im_w)
    rh, rw = int(np.round(im_h * scale)), int(np.round(im_w * scale))
    return jresize(ann, (rh, rw), method="bilinear")
