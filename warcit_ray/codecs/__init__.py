"""Codec dispatch by the ``fmt`` column of the image table
(input_hint schema), plus perceptual hashing.

fmt values: 'png' | 'bmp' | 'ppm' (lossless), 'dctq' (lossy).
"""

from __future__ import annotations

import numpy as np

from .dctq import dctq_decode, dctq_encode, psnr
from .raster import bmp_decode, bmp_encode, png_decode, png_encode, ppm_decode, ppm_encode

LOSSLESS_FMTS = ("png", "bmp", "ppm")
LOSSY_FMTS = ("dctq",)
ALL_FMTS = LOSSLESS_FMTS + LOSSY_FMTS

_ENCODERS = {"png": png_encode, "bmp": bmp_encode, "ppm": ppm_encode, "dctq": dctq_encode}
_DECODERS = {"png": png_decode, "bmp": bmp_decode, "ppm": ppm_decode, "dctq": dctq_decode}

MIME_BY_FMT = {
    "png": "image/png",
    "bmp": "image/bmp",
    "ppm": "image/x-portable-pixmap",
    "dctq": "image/x-dctq",
}


def encode(img: np.ndarray, fmt: str, **kw) -> bytes:
    return _ENCODERS[fmt](img, **kw)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def sniff_fmt(data: bytes) -> str | None:
    if data.startswith(b"\x89PNG"):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data.startswith(b"DCTQ"):
        return "dctq"
    return None


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash: 32x32 grayscale -> 2-D DCT -> low 8x8
    (skipping DC) thresholded at the median (the public pHash recipe)."""
    from .dctq import _dct_matrix

    h, w = img.shape[:2]
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    # area-average down to 32x32 via bincount-free reduceat on both axes
    ys = (np.arange(32 + 1) * h) // 32
    xs = (np.arange(32 + 1) * w) // 32
    rowsum = np.add.reduceat(gray, ys[:-1], axis=0)
    cell = np.add.reduceat(rowsum, xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs))
    small = cell / counts
    d32 = _dct_matrix(32)
    dct = d32 @ small @ d32.T
    low = dct[:8, :8].flatten()[1:]
    med = np.median(low)
    bits = (low > med).astype(np.uint64)
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | b
    return int(out)
