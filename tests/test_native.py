"""Native C++ mask codecs vs the pure-Python reference implementations."""

import numpy as np
import pytest

from human_instance_segmentation_tpu.data import native
from human_instance_segmentation_tpu.data.coco import (
    _leb_string_decode,
    _leb_string_encode,
    rle_encode,
)


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def _py_rle_decode(counts, h, w):
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((w, h)).T


def test_native_rle_decode_matches_python(lib, rng):
    m = (rng.random((23, 17)) > 0.5).astype(np.uint8)
    counts = rle_encode(m)["counts"]
    ref = _py_rle_decode(counts, 23, 17)
    out = native.rle_decode_native(counts, 23, 17)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(out, m)


def test_native_rle_encode_round_trip(lib, rng):
    m = (rng.random((31, 9)) > 0.3).astype(np.uint8)
    counts = native.rle_encode_native(m)
    assert counts is not None
    np.testing.assert_array_equal(native.rle_decode_native(counts, 31, 9), m)
    # matches the python encoder exactly
    assert counts == rle_encode(m)["counts"]


def test_native_leb_codec(lib, rng):
    m = (rng.random((13, 29)) > 0.5).astype(np.uint8)
    counts = rle_encode(m)["counts"]
    s_py = _leb_string_encode(counts)
    s_native = native.leb_encode_native(counts)
    assert s_native == s_py
    assert native.leb_decode_native(s_py.encode("ascii")) == counts
    assert _leb_string_decode(s_native) == counts


def test_native_rasterizer_close_to_pil(lib):
    from human_instance_segmentation_tpu.data.coco import polygons_to_mask

    poly = [[10.0, 10.0, 50.0, 12.0, 45.0, 55.0, 8.0, 40.0]]
    nat = native.rasterize_polygons_native(poly, 64, 64)
    pil = polygons_to_mask(poly, 64, 64, use_native=False)
    inter = (nat & pil).sum()
    union = (nat | pil).sum()
    assert inter / union > 0.95  # algorithms differ only at boundary pixels
    # interior exactness
    assert nat[30, 30] == pil[30, 30] == 1
    assert nat[0, 0] == pil[0, 0] == 0


def test_native_is_used_by_default(lib):
    # rle_decode_counts should route through the native lib when available
    from human_instance_segmentation_tpu.data.coco import rle_decode_counts

    m = rle_decode_counts([3, 4, 5], 4, 3)
    assert m.shape == (4, 3)
    assert m.sum() == 4
