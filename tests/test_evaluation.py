"""Metric harness tests: Levenshtein/NED/SeqAcc, crops, Frechet distance."""

import numpy as np
import pytest

from textflux_tpu.evaluation import (
    crop_polygon_region,
    evaluate_texts,
    frechet_distance,
    gaussian_stats,
    levenshtein,
    normalized_edit_distance,
    sequence_accuracy,
)
from textflux_tpu.evaluation.fid import fid_from_features


def test_levenshtein_basic():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_levenshtein_matches_library():
    import Levenshtein as L

    rng = np.random.default_rng(0)
    alpha = "abcdef"
    for _ in range(50):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 10)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 10)))
        assert levenshtein(a, b) == L.distance(a, b)


def test_metrics():
    assert sequence_accuracy("abc", "abc") == 1.0
    assert sequence_accuracy("abc", "abd") == 0.0
    # reference denominator: maxlen + 1e-5 (eval_dgocr.py get_ld)
    assert normalized_edit_distance("abc", "abd") == pytest.approx(
        1 - 1 / (3 + 1e-5))
    out = evaluate_texts(["hi", "there"], ["hi", "their"])
    assert out["seq_acc"] == 0.5
    assert out["count"] == 2


def test_crop_polygon_region():
    img = np.zeros((100, 200, 3), np.uint8)
    img[40:60, 50:150] = 255
    poly = [[50, 40], [150, 40], [150, 60], [50, 60]]
    crop = crop_polygon_region(img, poly, target_height=48)
    assert crop.shape[0] == 48
    assert crop.mean() > 200  # grabbed the white region


def test_crop_rotated_region():
    import cv2

    img = np.zeros((200, 200, 3), np.uint8)
    pts = np.array([[60, 40], [160, 90], [140, 130], [40, 80]], np.int32)
    cv2.fillPoly(img, [pts], (255, 255, 255))
    crop = crop_polygon_region(img, pts, target_height=48)
    assert crop.shape[0] == 48 and crop.mean() > 150


def test_frechet_identical_is_zero(rng):
    x = rng.standard_normal((500, 8))
    mu, sigma = gaussian_stats(x)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-3)


def test_frechet_mean_shift(rng):
    x = rng.standard_normal((5000, 4))
    y = x + 2.0
    d = fid_from_features(x, y)
    assert d == pytest.approx(4.0 * 4, rel=0.05)  # ||2*ones(4)||^2 = 16


def test_vertical_crop_rotates_counterclockwise():
    """Reference protocol (eval_dgocr.py:207-208): vertical strips rotate 90
    deg CCW (transpose+flip == rot90 k=1) at h > 1.2w, so the TOP of a
    vertical text region lands on the LEFT of the horizontal strip. The old
    code rotated clockwise (180 deg off) behind a 1.5 threshold."""
    from textflux_tpu.evaluation.crop import crop_polygon_region

    img = np.zeros((200, 200, 3), np.uint8)
    # vertical region 40w x 120h (aspect 3 > 1.2), top quarter white
    img[40:70, 80:120] = 255
    img[70:160, 80:120] = 40
    poly = [[80, 40], [120, 40], [120, 160], [80, 160]]
    crop = crop_polygon_region(img, poly, target_height=48)
    assert crop.shape[1] > crop.shape[0]          # rotated to horizontal
    left = crop[:, : crop.shape[1] // 4].mean()
    right = crop[:, -crop.shape[1] // 4:].mean()
    assert left > right + 50, (left, right)       # top-of-text on the LEFT

    # aspect 1.3 sits in the reference's rotate band (1.2 < 1.3)
    img2 = np.zeros((200, 200, 3), np.uint8)
    img2[40:170, 80:180] = 128
    poly2 = [[80, 40], [180, 40], [180, 170], [80, 170]]
    crop2 = crop_polygon_region(img2, poly2, target_height=48)
    assert crop2.shape[1] >= crop2.shape[0]


def test_crop_diamond_region_not_degenerate():
    """~45-degree rects tie on the corner-ordering sum/diff trick and used to
    produce a singular homography (black crop); the reference's x-sort
    ordering never degenerates."""
    from textflux_tpu.evaluation.crop import crop_polygon_region, min_bounding_rect

    img = np.zeros((200, 200, 3), np.uint8)
    poly = [[100, 40], [160, 100], [100, 160], [40, 100]]
    import cv2

    cv2.fillPoly(img, [np.asarray(poly, np.int32)], (200, 120, 60))
    mask = np.zeros((200, 200), np.uint8)
    cv2.fillPoly(mask, [np.asarray(poly, np.int32)], 255)
    corners = min_bounding_rect(mask)
    # four DISTINCT corners
    assert len({tuple(np.round(c, 3)) for c in corners}) == 4
    crop = crop_polygon_region(img, poly, target_height=48)
    assert crop.mean() > 30                        # content, not a black crop


def test_ned_char_id_protocol():
    """With a recognizer dictionary, NED runs over char IDs with OOV chars
    collapsed to the last dict id and the reference's +1e-5 denominator
    (eval_dgocr.py:194-196,291-293)."""
    from textflux_tpu.evaluation.metrics import normalized_edit_distance

    char2id = {c: i for i, c in enumerate("abcdef")}
    # two different OOV chars collapse to the same id -> equal sequences
    assert normalized_edit_distance("aXb", "aYb", char2id) == pytest.approx(
        1.0, abs=1e-4)
    # but differ from raw-string comparison
    assert normalized_edit_distance("aXb", "aYb") < 0.9
    # denominator parity: dist 1 over maxlen 3 -> 1 - 1/(3+1e-5)
    got = normalized_edit_distance("abc", "abd", char2id)
    assert got == pytest.approx(1.0 - 1.0 / (3 + 1e-5))
