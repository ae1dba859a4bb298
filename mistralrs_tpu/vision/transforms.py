"""Image transform pipeline (host-side preprocessing).

Reference parity: mistralrs-vision/src/ — `ImageTransform`/`ApplyTransforms`
(lib.rs:32-47), transforms.rs (`ToTensor`, `Normalize`, `InterpolateResize`
bicubic, `Rescale`), ops.rs (`pad`, `make_pixel_mask`,
`get_resize_image_size`). Images flow as numpy [C, H, W] float32; resizing
uses PIL bicubic (the same resampler the HF processors the reference mirrors
use), everything else is vectorized numpy.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_tensor(img: "Image.Image") -> np.ndarray:
    """PIL -> [C, H, W] float32 scaled to [0, 1] (ref ToTensor)."""
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def to_tensor_no_rescale(img: "Image.Image") -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32)
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def rescale(x: np.ndarray, factor: float) -> np.ndarray:
    return x * factor


def normalize(x: np.ndarray, mean, std) -> np.ndarray:
    """x: [C, H, W]; per-channel mean/std (ref Normalize)."""
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, np.float32).reshape(-1, 1, 1)
    return (x - mean) / std


def interpolate_resize(img: "Image.Image", size: tuple[int, int]) -> "Image.Image":
    """Bicubic resize to (height, width) (ref InterpolateResize)."""
    h, w = size
    return img.resize((w, h), Image.Resampling.BICUBIC)


def pad_to(x: np.ndarray, height: int, width: int, value: float = 0.0) -> np.ndarray:
    """Bottom/right pad [C, H, W] to (height, width) (ref ops.rs pad)."""
    c, h, w = x.shape
    out = np.full((c, height, width), value, np.float32)
    out[:, :h, :w] = x
    return out


def make_pixel_mask(x: np.ndarray, valid_h: int, valid_w: int) -> np.ndarray:
    """[H, W] int mask of valid (unpadded) pixels (ref make_pixel_mask)."""
    _, h, w = x.shape
    mask = np.zeros((h, w), np.int32)
    mask[:valid_h, :valid_w] = 1
    return mask


def get_resize_image_size(
    h: int, w: int, shortest_edge: int, longest_edge: int | None = None
) -> tuple[int, int]:
    """Aspect-preserving size with shortest/longest-edge caps
    (ref ops.rs get_resize_image_size; HF semantics: the short side becomes
    exactly `shortest_edge`, the long side truncates)."""
    short, long = (h, w) if h <= w else (w, h)
    new_short = shortest_edge
    new_long = int(new_short * long / short)
    if longest_edge is not None and new_long > longest_edge:
        new_long = longest_edge
        new_short = int(new_long * short / long)
    return (new_short, new_long) if h <= w else (new_long, new_short)


def preprocess_standard(
    img: "Image.Image",
    size: tuple[int, int],
    mean,
    std,
    rescale_factor: float = 1 / 255.0,
) -> np.ndarray:
    """The common resize -> rescale -> normalize chain -> [C, H, W]."""
    img = interpolate_resize(img, size)
    x = to_tensor_no_rescale(img) * rescale_factor
    return normalize(x, mean, std)
