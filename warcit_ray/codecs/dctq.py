"""DCTQ — the in-repo lossy codec (JPEG-shaped: 8x8 block DCT +
uniform quantization + zlib entropy stage), fully vectorized numpy.

Exists because no system image codec is installed and the per-row
invariant (BASELINE.json input_hint) requires a lossy format whose
decode achieves PSNR >= 40 dB against the source pixels. Quality 90
(default) quantizes lightly enough to clear 40 dB on natural-ish
synthetic images while still being genuinely lossy.

Format (little-endian): b'DCTQ' | u32 h | u32 w | u8 quality |
zlib(int16 coeff tensor, C order, shape (3, ceil(h/8)*8, ceil(w/8)*8)).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"DCTQ"

# Base quantization table (flat mid-strength; scaled by quality below).
_BASE_Q = np.array(
    [
        [8, 6, 6, 8, 12, 20, 26, 31],
        [6, 6, 7, 10, 13, 29, 30, 28],
        [7, 7, 8, 12, 20, 29, 35, 28],
        [7, 9, 11, 15, 26, 44, 40, 31],
        [9, 11, 19, 28, 34, 55, 52, 39],
        [12, 18, 28, 32, 41, 52, 57, 46],
        [25, 32, 39, 44, 52, 61, 60, 51],
        [36, 46, 48, 49, 56, 50, 52, 50],
    ],
    dtype=np.float64,
)


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_D8 = _dct_matrix(8)


def _qtable(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    q = np.floor((_BASE_Q * scale + 50.0) / 100.0)
    return np.clip(q, 1, 255)


def _blockify(chan: np.ndarray) -> np.ndarray:
    """(H, W) -> (H/8, W/8, 8, 8) without copying more than once."""
    H, W = chan.shape
    return chan.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray) -> np.ndarray:
    nb, mb = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nb * 8, mb * 8)


def dctq_encode(img: np.ndarray, quality: int = 90) -> bytes:
    h, w = img.shape[:2]
    H, W = (h + 7) & ~7, (w + 7) & ~7
    q = _qtable(quality)
    coeffs = np.empty((3, H, W), dtype=np.int16)
    padded = np.zeros((H, W), dtype=np.float64)
    for c in range(3):
        padded[:h, :w] = img[:, :, c].astype(np.float64) - 128.0
        if h < H:
            padded[h:, :w] = padded[h - 1: h, :w]
        if w < W:
            padded[:, w:] = padded[:, w - 1: w]
        blocks = _blockify(padded)
        # 2-D DCT per block: D @ B @ D.T via einsum over the whole tensor
        dct = np.einsum("ij,abjk,lk->abil", _D8, blocks, _D8, optimize=True)
        coeffs[c] = _unblockify(np.round(dct / q).astype(np.int16))
    body = zlib.compress(coeffs.tobytes(), 6)
    return _MAGIC + struct.pack("<IIB", h, w, quality) + body


def dctq_decode(data: bytes) -> np.ndarray:
    if not data.startswith(_MAGIC):
        raise ValueError("not a DCTQ payload")
    h, w, quality = struct.unpack_from("<IIB", data, 4)
    H, W = (h + 7) & ~7, (w + 7) & ~7
    q = _qtable(quality)
    coeffs = np.frombuffer(zlib.decompress(data[13:]), dtype=np.int16).reshape(3, H, W)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        blocks = _blockify(coeffs[c].astype(np.float64)) * q
        idct = np.einsum("ji,abjk,kl->abil", _D8, blocks, _D8, optimize=True)
        chan = _unblockify(idct) + 128.0
        out[:, :, c] = np.clip(np.round(chan[:h, :w]), 0, 255).astype(np.uint8)
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
