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
    assert normalized_edit_distance("abc", "abd") == pytest.approx(1 - 1 / 3)
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
