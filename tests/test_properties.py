"""Property-based tests (hypothesis) for the scalar library and state
structures — SURVEY §5 test-plan item 5."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from warcit_ray.codecs import decode, encode
from warcit_ray.functions.timestamps import (
    iso_date_to_timestamp,
    normalize_fixed_dt,
    pad_timestamp,
    timestamp_to_iso_date,
)
from warcit_ray.functions.urls import ESCAPE_CHARS, escape_path, escape_path_array
from warcit_ray.state.cuckoo import CuckooFilter

paths = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="%"),
    min_size=0, max_size=40,
)


@given(paths)
@settings(max_examples=200, deadline=None)
def test_escape_path_no_reserved_chars_survive(p):
    out = escape_path(p)
    for ch in ESCAPE_CHARS:
        assert ch not in out
    assert not out.startswith((".", "/")) and not out.endswith((".", "/"))


@given(st.lists(paths, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_escape_path_array_equals_scalar(ps):
    arr = escape_path_array(pa.array(ps, type=pa.string()))
    assert arr.to_pylist() == [escape_path(p) for p in ps]


@given(st.integers(1000, 9999), st.integers(1, 12), st.integers(1, 28),
       st.integers(0, 23), st.integers(0, 59), st.integers(0, 59))
@settings(max_examples=100, deadline=None)
def test_timestamp_roundtrip(y, mo, d, h, mi, s):
    ts14 = "%04d%02d%02d%02d%02d%02d" % (y, mo, d, h, mi, s)
    iso = timestamp_to_iso_date(ts14)
    assert iso_date_to_timestamp(iso) == ts14


@given(st.integers(1000, 9999), st.sampled_from([4, 6, 8, 10, 12, 14]))
@settings(max_examples=60, deadline=None)
def test_pad_down_is_floor(year, length):
    ts = ("%04d" % year) + "0615120000"
    partial = ts[:length]
    padded = pad_timestamp(partial)
    assert len(padded) == 14
    assert padded[:length] == partial
    # pad-down: the padded instant is <= any real instant sharing the prefix
    assert padded <= partial + "9" * (14 - length)
    assert normalize_fixed_dt(partial) == timestamp_to_iso_date(padded)


@given(st.lists(st.integers(1, 2**63 - 1), min_size=1, max_size=300))
@settings(max_examples=40, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(4096)
    arr = np.array(keys, dtype=np.uint64)
    added = f.add_if_absent_batch(arr)
    assert added.sum() == len(np.unique(arr))
    assert f.contains_batch(np.unique(arr)).all()
    # idempotent
    assert f.add_if_absent_batch(arr).sum() == 0


@given(st.integers(1, 60), st.integers(1, 60), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_lossless_codecs_roundtrip_any_image(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for fmt in ("png", "bmp", "ppm"):
        assert np.array_equal(decode(encode(img, fmt), fmt), img)


_URL_CHARS = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=40)


@given(host=_URL_CHARS, path=_URL_CHARS,
       scheme=st.sampled_from(["http://", "https://"]))
@settings(max_examples=300, deadline=None)
def test_url_path_fast_path_matches_urlsplit(scheme, host, path):
    from urllib.parse import urlsplit

    from warcit_ray.state.robots import url_path

    url = scheme + host + "/" + path
    try:
        want = urlsplit(url).path or "/"
    except ValueError:
        want = "/"
    assert url_path(url) == want


@given(host=_URL_CHARS, path=_URL_CHARS,
       scheme=st.sampled_from(["http://", "https://"]))
@settings(max_examples=300, deadline=None)
def test_surt_host_fast_path_matches_urlsplit(scheme, host, path):
    from urllib.parse import urlsplit

    from warcit_ray.functions.urls import surt_host

    url = scheme + host + "/" + path
    try:
        want = (urlsplit(url).hostname or "").lower()
    except ValueError:
        want = ""
    assert surt_host(url) == want
