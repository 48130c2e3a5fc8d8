"""Native JPEG decode kernel (native/decode.cpp) — PIL-parity tests.

The behavioral contract is the pipeline's PIL path: `Image.draft` (DCT-
domain power-of-two reduction) + `image_ops.resize_crop_pil` (bicubic
shortest-edge resize + center crop), which is what
`data/pipeline.py::load_pixels` runs when the native kernel is absent.
The native output must match within a small per-pixel tolerance —
differences come only from float vs PIL's 8.8 fixed-point filter
arithmetic (measured mean <~0.2, max <~5 of 255 across shapes).
"""

import io
import os

import numpy as np
import pandas as pd
import pytest

from pigeon_tpu.data import native_decode
from pigeon_tpu.data.image_ops import resize_crop_pil

pytestmark = pytest.mark.skipif(
    not native_decode.available(),
    reason="native decode kernel unavailable (no toolchain/libjpeg)")


def _photo_like(w, h, seed=0, gray=False):
    """8x8 constant blocks of noise — ADVERSARIAL for resampling
    comparisons (sharpest possible edges everywhere); used for the
    bit-near parity mode."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(h // 8 + 1, w // 8 + 1, 1 if gray else 3))
    x = np.kron(x, np.ones((8, 8, 1)))[:h, :w]
    x = (255 * (x - x.min()) / (np.ptp(x) + 1e-9)).astype(np.uint8)
    return x[..., 0] if gray else x


def _band_limited(w, h, seed=0, gray=False):
    """Smooth low-frequency content + mild noise — what real photographs
    look like to a resampler; used to bound fast-mode quality."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    x = np.stack([
        127 + 110 * np.sin(xx / 23 + seed),
        127 + 110 * np.cos(yy / 31 + seed * 0.7),
        127 + 110 * np.sin((xx + yy) / 41),
    ], -1)
    x += rng.normal(0, 6, x.shape)
    x = x.clip(0, 255).astype(np.uint8)
    return x[..., 0] if gray else x


def _jpeg_bytes(w, h, seed=0, gray=False, quality=85, content=None):
    from PIL import Image

    arr = (content or _photo_like)(w, h, seed, gray)
    im = Image.fromarray(arr, "L" if gray else "RGB")
    b = io.BytesIO()
    im.save(b, "JPEG", quality=quality)
    return b.getvalue()


def _pil_reference(data: bytes, target: int) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im.draft("RGB", (target, target))
        return resize_crop_pil(im, target)


SHAPES = [
    (640, 480, False),    # landscape, no DCT reduction at 336
    (480, 640, False),    # portrait
    (336, 336, False),    # exact size (decode only)
    (1600, 900, False),   # 1/2 DCT scale kicks in
    (2800, 2100, False),  # 1/4 DCT scale
    (200, 150, False),    # upscale
    (640, 480, True),     # grayscale JPEG -> RGB
    (337, 451, False),    # odd dims
]


@pytest.mark.parametrize("w,h,gray", SHAPES)
def test_parity_vs_pil(w, h, gray):
    data = _jpeg_bytes(w, h, seed=w + h, gray=gray)
    nat = native_decode.decode_resize_crop(data, 336, fast=False)
    assert nat is not None and nat.shape == (336, 336, 3)
    ref = _pil_reference(data, 336)
    d = np.abs(nat.astype(np.int16) - ref.astype(np.int16))
    assert d.mean() <= 0.5, d.mean()
    assert d.max() <= 8, d.max()


@pytest.mark.parametrize("w,h,gray", SHAPES)
def test_fast_mode_quality_bounded(w, h, gray):
    """fast=True decodes at libjpeg-turbo M/8 IDCT scale (fewer pixels
    than PIL can reach) — same resampling quality class. On band-limited
    (photo-like) content the delta vs the PIL path is tiny; the blocky
    worst case gets a looser but still-bounded check."""
    data = _jpeg_bytes(w, h, seed=w + h, gray=gray, content=_band_limited)
    fast = native_decode.decode_resize_crop(data, 336, fast=True)
    ref = _pil_reference(data, 336)
    d = np.abs(fast.astype(np.int16) - ref.astype(np.int16))
    assert d.mean() <= 2.0, d.mean()
    assert np.percentile(d, 99) <= 12, np.percentile(d, 99)

    worst = _jpeg_bytes(w, h, seed=w + h, gray=gray)  # 8x8 block noise
    fast_w = native_decode.decode_resize_crop(worst, 336, fast=True)
    ref_w = _pil_reference(worst, 336)
    dw = np.abs(fast_w.astype(np.int16) - ref_w.astype(np.int16))
    assert dw.mean() <= 12.0, dw.mean()


def test_other_target_sizes():
    data = _jpeg_bytes(500, 700, seed=3)
    for target in (224, 96):
        nat = native_decode.decode_resize_crop(data, target, fast=False)
        ref = _pil_reference(data, target)
        assert nat.shape == (target, target, 3)
        assert np.abs(nat.astype(np.int16)
                      - ref.astype(np.int16)).mean() <= 0.5


def test_corrupt_and_truncated_inputs():
    assert native_decode.decode_resize_crop(b"not a jpeg", 336) is None
    data = _jpeg_bytes(640, 480)
    assert native_decode.decode_resize_crop(data[:200], 336) is None
    assert native_decode.decode_resize_crop(b"", 336) is None


def test_batch_mixed_success_and_failure():
    bufs = [_jpeg_bytes(640, 480, seed=1), b"bad",
            _jpeg_bytes(480, 640, seed=2)]
    outs = native_decode.decode_resize_crop_batch(bufs, 336, fast=False)
    assert outs[1] is None
    for i in (0, 2):
        ref = _pil_reference(bufs[i], 336)
        assert np.abs(outs[i].astype(np.int16)
                      - ref.astype(np.int16)).mean() <= 0.5
    # fast-mode batch agrees with fast-mode single-image decode
    fast_outs = native_decode.decode_resize_crop_batch(bufs, 336)
    np.testing.assert_array_equal(
        fast_outs[0],
        native_decode.decode_resize_crop(bufs[0], 336, fast=True))


def test_pipeline_uses_native_path_with_pil_parity(tmp_path):
    """End-to-end through TabularImageDataset.load_pixels: the uint8 wire
    path must produce PIL-parity pixels whether or not the native kernel
    handled the decode (PNG exercises the extension-gated fallback)."""
    from PIL import Image

    from pigeon_tpu.data.pipeline import TabularImageDataset

    arr = _band_limited(640, 480, seed=9)
    Image.fromarray(arr).save(tmp_path / "a.jpg", quality=90)
    Image.fromarray(arr).save(tmp_path / "b.png")
    df = pd.DataFrame([
        {"image": "a.jpg", "lng": 0.0, "lat": 0.0},
        {"image": "b.png", "lng": 1.0, "lat": 1.0},
    ])
    ds = TabularImageDataset(df, image_dir=str(tmp_path), image_size=336,
                             normalize=False)
    with open(tmp_path / "a.jpg", "rb") as f:
        ref_jpg = _pil_reference(f.read(), 336)
    out_jpg = ds.load_pixels(df.iloc[0])
    assert out_jpg.dtype == np.uint8 and out_jpg.shape == (336, 336, 3)
    # pipeline uses the fast mode -> slightly looser bound than parity
    assert np.abs(out_jpg.astype(np.int16)
                  - ref_jpg.astype(np.int16)).mean() <= 2.0

    out_png = ds.load_pixels(df.iloc[1])  # PIL fallback path
    assert out_png.shape == (336, 336, 3)


def test_env_kill_switch(monkeypatch):
    """PIGEON_NATIVE_DECODE=0 disables the kernel (fresh module state)."""
    import importlib

    import pigeon_tpu.data.native_decode as nd

    monkeypatch.setenv("PIGEON_NATIVE_DECODE", "0")
    fresh = importlib.reload(nd)
    try:
        assert fresh.available() is False
        assert fresh.decode_resize_crop(_jpeg_bytes(64, 64), 336) is None
    finally:
        monkeypatch.delenv("PIGEON_NATIVE_DECODE")
        importlib.reload(nd)
