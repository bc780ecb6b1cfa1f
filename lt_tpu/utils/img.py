"""Host-side image utilities: bbox math, crop/resize, normalization.

Functional parity target: /root/reference/mvn/utils/img.py — ``crop_image``
(:10-24), ``resize_image`` (:27-28), ``get_square_bbox`` (:31-53),
``scale_bbox`` (:56-69), ImageNet normalization (:7, :102-115).

These run in the host data pipeline (numpy), not on device. cv2 is used when
available (matching the reference's INTER_AREA resize); PIL is the fallback.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover - depends on environment
    cv2 = None
    _HAS_CV2 = False

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def crop_image(image: np.ndarray, bbox) -> np.ndarray:
    """Crop (left, upper, right, lower), zero-padding out-of-bounds areas.

    Mirrors img.py:10-24 (PIL crop semantics: the output always has the bbox
    size; missing parts are zeros).
    """
    left, upper, right, lower = (int(v) for v in bbox)
    out_h, out_w = lower - upper, right - left
    out = np.zeros((out_h, out_w) + image.shape[2:], image.dtype)

    src_y0, src_y1 = max(0, upper), min(image.shape[0], lower)
    src_x0, src_x1 = max(0, left), min(image.shape[1], right)
    if src_y1 > src_y0 and src_x1 > src_x0:
        dst_y0 = src_y0 - upper
        dst_x0 = src_x0 - left
        out[dst_y0:dst_y0 + (src_y1 - src_y0),
            dst_x0:dst_x0 + (src_x1 - src_x0)] = image[src_y0:src_y1,
                                                       src_x0:src_x1]
    return out


def resize_image(image: np.ndarray, shape) -> np.ndarray:
    """Resize to (height, width). INTER_AREA like img.py:27-28."""
    if _HAS_CV2:
        return cv2.resize(image, (shape[1], shape[0]),
                          interpolation=cv2.INTER_AREA)
    from PIL import Image

    pil = Image.fromarray(image)
    return np.asarray(pil.resize((shape[1], shape[0]), Image.BILINEAR))


def get_square_bbox(bbox):
    """Stretch the shorter side to make the bbox square (img.py:31-53)."""
    left, upper, right, lower = bbox
    width, height = right - left, lower - upper
    if width > height:
        y_center = (upper + lower) // 2
        upper = y_center - width // 2
        lower = upper + width
    else:
        x_center = (left + right) // 2
        left = x_center - height // 2
        right = left + height
    return left, upper, right, lower


def scale_bbox(bbox, scale: float):
    """Scale a bbox about its center with int rounding (img.py:56-69)."""
    left, upper, right, lower = bbox
    width, height = right - left, lower - upper
    x_center, y_center = (right + left) // 2, (lower + upper) // 2
    new_width, new_height = int(scale * width), int(scale * height)
    new_left = x_center - new_width // 2
    new_right = new_left + new_width
    new_upper = y_center - new_height // 2
    new_lower = new_upper + new_height
    return new_left, new_upper, new_right, new_lower


def normalize_image(image: np.ndarray) -> np.ndarray:
    """uint8 [0, 255] -> ImageNet-normalized float (img.py:102-110)."""
    return ((image / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def denormalize_image(image: np.ndarray) -> np.ndarray:
    """Inverse of normalize_image, clipped to [0, 255] (img.py:113-115)."""
    return np.clip(255.0 * (image * IMAGENET_STD + IMAGENET_MEAN), 0, 255)
