"""Multimodal actor-pool stages: real image resize/features, stubbed
video/audio with real plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from warcit_ray.codecs import decode
from warcit_ray.sources.synth import make_image_table
from warcit_ray.stages.multimodal import (
    AudioFeatures,
    ImageDecodeResize,
    ImageFeatures,
    VideoFrameSample,
    area_resize,
)


def _batch(n=6):
    return make_image_table(n).select(["image_id", "bytes", "fmt"])


def test_area_resize_shapes_and_determinism():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    down = area_resize(img, 16, 16)
    assert down.shape == (16, 16, 3)
    assert np.array_equal(down, area_resize(img, 16, 16))
    up = area_resize(img, 100, 140)
    assert up.shape == (100, 140, 3)
    # constant image survives exactly
    const = np.full((40, 40, 3), 77, dtype=np.uint8)
    assert (area_resize(const, 13, 9) == 77).all()


def test_image_decode_resize_stage():
    out = ImageDecodeResize(24, 24)(_batch())
    assert out.column("resize_ok").to_pylist() == [True] * 6
    for b in out.column("resized").to_pylist():
        assert decode(b, "png").shape == (24, 24, 3)


def test_image_features_stage():
    out = ImageFeatures()(_batch())
    df = out.to_pandas()
    assert (df["mean_r"].between(0, 255)).all()
    assert (df["edge_density"] > 0).all()
    assert (df["phash64"] >= 0).all()


def test_video_stub_modes():
    b = _batch(3)
    out = VideoFrameSample(n_frames=4)(b)
    frames = out.column("frames").to_pylist()
    assert all(len(f) == 4 for f in frames)
    # frames decode as PNGs with the configured size
    assert decode(frames[0][0], "png").shape == (16, 16, 3)
    # deterministic per content
    out2 = VideoFrameSample(n_frames=4)(b)
    assert out.column("frames").to_pylist() == out2.column("frames").to_pylist()
    with pytest.raises(NotImplementedError):
        VideoFrameSample(strict=True)(b)


def test_audio_stub_modes():
    b = _batch(3)
    out = AudioFeatures()(b)
    assert out.column("rms").to_pylist() == AudioFeatures()(b).column("rms").to_pylist()
    with pytest.raises(NotImplementedError):
        AudioFeatures(strict=True)(b)


def test_stages_run_in_ray_pipeline():
    import ray.data as rd

    ds = rd.from_arrow(make_image_table(12))
    out = ds.map_batches(ImageDecodeResize, fn_constructor_args=(16, 16),
                         batch_size=4, batch_format="pyarrow", concurrency=2)
    t = out.to_pandas()
    assert len(t) == 12 and t["resize_ok"].all()
