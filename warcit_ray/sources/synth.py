"""Deterministic synthetic image+caption corpus.

BASELINE.json ``input_hint`` fixes the input shape: a Lance table of
image + caption pairs with columns
  (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64).
Lance itself is not installed in this environment, so the table is
materialized as Parquet — both are Arrow-native columnar formats and
the engine reads either through :func:`read_image_table`.

Every row is a pure function of (seed, row index): rerunning the
generator at any scale yields byte-identical tables, which is what the
correctness and resume tests key on.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import ALL_FMTS, encode, phash64

CAPTION_WORDS = (
    "red blue green amber violet crimson teal ochre silver golden "
    "cat dog bird fish horse fox owl bear wolf hare "
    "sitting running sleeping flying swimming hunting watching resting "
    "meadow forest river mountain shore desert city garden harbor field"
).split()

IMAGE_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)


def make_image(idx: int, seed: int = 42) -> np.ndarray:
    """Deterministic natural-ish RGB image for row ``idx``: smooth
    per-channel sinusoid fields plus mild noise (so the lossy codec is
    meaningfully exercised but clears PSNR >= 40 dB)."""
    rng = np.random.default_rng(seed * 1_000_003 + idx)
    h = int(rng.integers(40, 97))
    w = int(rng.integers(40, 97))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.empty((h, w, 3), dtype=np.float64)
    for c in range(3):
        fy, fx = rng.uniform(5, 16, size=2)
        phase = rng.uniform(0, 6.28, size=2)
        amp = rng.uniform(40, 80)
        img[:, :, c] = 128 + amp * np.sin(yy / fy + phase[0]) * np.cos(xx / fx + phase[1])
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_caption(idx: int, seed: int = 42) -> str:
    rng = np.random.default_rng(seed * 7_000_003 + idx)
    n = int(rng.integers(4, 10))
    words = [CAPTION_WORDS[int(i)] for i in rng.integers(0, len(CAPTION_WORDS), n)]
    return " ".join(words)


def make_row(idx: int, seed: int = 42) -> dict:
    img = make_image(idx, seed)
    fmt = ALL_FMTS[idx % len(ALL_FMTS)]
    return {
        "image_id": "img%08d" % idx,
        "bytes": encode(img, fmt),
        "w": img.shape[1],
        "h": img.shape[0],
        "fmt": fmt,
        "caption": make_caption(idx, seed),
        "phash": np.int64(np.uint64(phash64(img)).astype(np.int64)),
    }


def make_image_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [make_row(i, seed) for i in range(start, start + n)]
    cols = {name: [r[name] for r in rows] for name in IMAGE_SCHEMA.names}
    return pa.table(cols, schema=IMAGE_SCHEMA)


def write_image_table(path: str, n: int, seed: int = 42, rows_per_file: int = 2048,
                      row_group_size: int = 256) -> str:
    """Write the corpus as a partitioned Parquet directory (one file per
    row range — the resumable layout the sinks also use). Small row
    groups keep reads splittable (Ray parallelizes parquet at row-group
    granularity)."""
    os.makedirs(path, exist_ok=True)
    for start in range(0, n, rows_per_file):
        cnt = min(rows_per_file, n - start)
        fp = os.path.join(path, "part-%06d.parquet" % (start // rows_per_file))
        if not os.path.exists(fp):
            pq.write_table(make_image_table(cnt, seed, start), fp,
                           row_group_size=row_group_size)
    return path


def read_image_table(path: str, columns: list[str] | None = None, **kw):
    """Reader shim: Lance if available and the path is a Lance dataset,
    else Parquet (ray.data.read_parquet). Column pruning pushed down."""
    import ray.data as rd

    if path.endswith(".lance"):  # pragma: no cover - pylance not installed here
        return rd.read_lance(path, columns=columns, **kw)
    return rd.read_parquet(path, columns=columns, **kw)
