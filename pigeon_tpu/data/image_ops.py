"""Image preprocessing: CLIP normalization, crops, heading features.

Parity targets:
  * CLIP pixel pipeline — HF `CLIPImageProcessor` (shortest-edge bicubic
    resize -> center crop -> /255 -> normalize), which the reference invokes
    via `CLIPProcessor` (`models/clip_embedder.py:53`,
    `dataset_creation/benchmark/benchmark_dataset.py:13,103`).
  * FOV crop 96->90 degrees — `preprocessing/utils.py:21-64` (including its
    idiosyncratic ``arcsin(radians(fov/2))`` scale factor, which defined the
    training distribution and therefore must be reproduced, not corrected).
  * heading -> per-view (sin, cos) — `preprocessing/dataset_preprocessing.py:96-114`.

Two paths:
  * `clip_preprocess_pil` — host-side PIL path, bit-faithful to HF
    (PIL bicubic with antialias); used for datasets + parity tests.
  * `clip_preprocess_batch` — device-side jax path (fused resize +
    normalize under jit, bf16-friendly); used in serving and benchmarks
    where the ~1e-2 pixel difference vs PIL is irrelevant but host decode
    throughput matters.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

#: OpenAI CLIP normalization constants.
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


# ---------------------------------------------------------------------------
# Host (PIL) path — HF-parity
# ---------------------------------------------------------------------------

def resize_crop_pil(image, image_size: int = 336) -> np.ndarray:
    """PIL image -> resized + center-cropped ``(S, S, 3)`` uint8 (NO
    normalization — see `normalize_images` for the device-side step).

    The geometric half of `CLIPImageProcessor`: resize shortest edge with
    bicubic resampling, center-crop to square. Kept uint8 so host workers
    do only decode+resize (the float math runs on device, where it fuses
    into the patch-embed matmul).
    """
    from PIL import Image

    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    image = image.convert("RGB")

    w, h = image.size
    short = min(w, h)
    new_w = int(round(w * image_size / short))
    new_h = int(round(h * image_size / short))
    image = image.resize((new_w, new_h), Image.BICUBIC)

    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    image = image.crop((left, top, left + image_size, top + image_size))
    return np.asarray(image, dtype=np.uint8)


def normalize_images(images_u8):
    """``(..., 3)`` uint8 -> CLIP-normalized float32 (host or device).

    jnp-compatible: call inside a jitted step on the device copy for free
    fusion into the first matmul.
    """
    import jax.numpy as jnp

    xp = jnp if not isinstance(images_u8, np.ndarray) else np
    x = images_u8.astype(xp.float32) / 255.0
    mean = xp.asarray(CLIP_IMAGE_MEAN)
    std = xp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def clip_preprocess_pil(image, image_size: int = 336) -> np.ndarray:
    """PIL image -> CLIP-normalized ``(H, W, 3)`` float32 array (NHWC).

    Matches `CLIPImageProcessor`: resize shortest edge to `image_size` with
    bicubic resampling, center-crop to square, scale 1/255, normalize.
    (Host-side convenience; the high-throughput path is `resize_crop_pil`
    on workers + `normalize_images` on device.)
    """
    return normalize_images(resize_crop_pil(image, image_size))


def preprocess_views(images: Iterable, image_size: int = 336) -> np.ndarray:
    """List of 4 PIL views -> ``(4, H, W, 3)`` panorama array."""
    return np.stack([clip_preprocess_pil(im, image_size) for im in images])


# ---------------------------------------------------------------------------
# Device (jax) path — throughput
# ---------------------------------------------------------------------------

def clip_preprocess_batch(images_u8, image_size: int = 336):
    """``(B, H, W, 3)`` uint8 -> CLIP-normalized float ``(B, S, S, 3)``.

    Pure-jnp (jit/vmap-safe): min-side center crop, bicubic resize with
    antialiasing, normalize. Differences vs the PIL path are sub-1% of a
    std and do not move benchmark metrics; use the PIL path when exact HF
    parity is required.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(images_u8)
    b, h, w, _ = x.shape
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, s, s, 3))
    x = x.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (b, image_size, image_size, 3),
                         method="bicubic", antialias=True)
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# Geo-specific crops + headings
# ---------------------------------------------------------------------------

def _fov_scale_factor(original_fov: float) -> float:
    """Reference's FOV scale factor (`preprocessing/utils.py:21-33`).

    NOTE: the reference computes ``arcsin(radians(45)) / arcsin(radians(
    fov/2))`` — arcsin applied to an angle, not to its sine. Geometrically
    dubious but it is the transform the released models were trained with,
    so we reproduce it bit-for-bit.
    """
    fov_old = np.radians(original_fov / 2.0)
    fov_90 = np.radians(45.0)
    return float(np.arcsin(fov_90) / np.arcsin(fov_old))


def fov_center_crop(img: np.ndarray, original_fov: float = 96.0) -> np.ndarray:
    """Center-crop a Street View frame from `original_fov` to 90-degree FOV.

    Array-in/array-out version of `preprocessing/utils.py:35-64` (the
    reference mutates files on disk; we keep IO out of the transform).
    """
    height, width = img.shape[:2]
    factor = _fov_scale_factor(original_fov)
    new_w, new_h = factor * width, factor * height

    left = int(np.ceil((width - new_w) / 2))
    right = width - int(np.floor((width - new_w) / 2))
    top = int(np.ceil((height - new_h) / 2))
    bottom = height - int(np.floor((height - new_h) / 2))
    return img[top:bottom, left:right, ...]


def min_side_center_crop(img: np.ndarray) -> np.ndarray:
    """Square center crop to the short side (benchmark preprocessing,
    `dataset_creation/benchmark/benchmark_dataset.py:49-64`)."""
    s = min(img.shape[:2])
    top = (img.shape[0] - s) // 2
    left = (img.shape[1] - s) // 2
    return img[top:top + s, left:left + s, ...]


def heading_to_sincos(heading_deg) -> np.ndarray:
    """Compass heading (degrees) -> ``(..., 4, 2)`` per-view (sin, cos).

    View i looks at ``heading + i * 90deg`` — the GeoGuessr 4-shot capture
    pattern (`preprocessing/dataset_preprocessing.py:96-114`).
    """
    heading = np.deg2rad(np.asarray(heading_deg, dtype=np.float64))
    offsets = np.arange(4) * (np.pi / 2.0)
    angles = (heading[..., None] + offsets) % (2.0 * np.pi)
    return np.stack([np.sin(angles), np.cos(angles)], axis=-1) \
        .astype(np.float32)
