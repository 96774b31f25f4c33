"""Native C++ data-path kernels vs cv2/numpy references."""

import numpy as np
import pytest

from textflux_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_fill_poly_matches_cv2(lib):
    import cv2

    poly = np.array([[10, 5], [90, 12], [85, 60], [15, 55]], np.float32)
    ours = np.zeros((80, 100), np.uint8)
    native.fill_poly(ours, poly)
    ref = np.zeros((80, 100), np.uint8)
    cv2.fillPoly(ref, [poly.astype(np.int32)], 255)
    # scanline vs cv2 edge conventions differ by <= 1px on the boundary
    mismatch = (ours != ref).mean()
    assert mismatch < 0.02
    assert ours[30, 50] == 255 and ours[0, 0] == 0


def test_morphology_matches_cv2(lib, rng):
    import cv2

    mask = ((rng.random((40, 60)) > 0.8) * 255).astype(np.uint8)
    kernel = np.ones((3, 3), np.uint8)
    np.testing.assert_array_equal(
        native.dilate(mask.copy(), 2), cv2.dilate(mask, kernel, iterations=2))
    np.testing.assert_array_equal(
        native.erode(mask.copy(), 1), cv2.erode(mask, kernel, iterations=1))

    # border semantics: a mask touching the image edge must NOT erode away
    # (cv2 treats out-of-bounds as +inf for erode; the old kernel used 0 and
    # zeroed every border-touching region)
    border = np.zeros((10, 10), np.uint8)
    border[:4, :4] = 255
    np.testing.assert_array_equal(
        native.erode(border.copy(), 1), cv2.erode(border, kernel, iterations=1))
    assert native.erode(border.copy(), 1)[0, 0] == 255
    np.testing.assert_array_equal(
        native.dilate(border.copy(), 1), cv2.dilate(border, kernel, iterations=1))


def test_normalize(lib, rng):
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    np.testing.assert_allclose(
        native.normalize_pm1(img), img.astype(np.float32) / 127.5 - 1.0, atol=1e-6)
    np.testing.assert_allclose(
        native.normalize_01(img), img.astype(np.float32) / 255.0, atol=1e-7)
