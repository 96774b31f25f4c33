"""Dataset + loader tests against synthetic AnyText-format fixtures."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from textflux_tpu.data import (
    AnyWordSingleLineDataset,
    BucketedLoader,
    CombinedFolderDataset,
    UnionDataset,
)


@pytest.fixture()
def anyword_fixture(tmp_path, rng):
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    data = {"data_list": []}
    for i in range(6):
        name = f"img_{i}.png"
        Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8)).save(img_root / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [
                {"text": f"word{i}", "polygon": [[10, 10], [80, 10], [80, 40], [10, 40]]},
                {"text": "", "polygon": []},  # filtered
            ],
        })
    data["data_list"].append({"img_name": "missing.png", "annotations": []})  # dropped
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(data))
    return str(json_path), str(img_root)


def test_anyword_dataset(anyword_fixture):
    json_path, img_root = anyword_fixture
    ds = AnyWordSingleLineDataset([(json_path, img_root)], resolutions=[128], seed=1)
    assert len(ds) == 6
    s = ds[0]
    h, w = s["pixel_values"].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert s["mask"].shape == (h, w)
    assert s["pixel_values"].min() >= -1.0 and s["pixel_values"].max() <= 1.0
    assert "word0" in s["prompt"]
    assert s["bucket"] == (h, w)
    # mask is empty over the glyph strip (top) region on most samples
    assert s["mask"].max() <= 1.0


def test_combined_folder_dataset(tmp_path, rng):
    d = tmp_path / "set"
    (d / "mask").mkdir(parents=True)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(d / f"s_{i}.png")
        Image.fromarray((rng.random((96, 96)) > 0.5).astype(np.uint8) * 255).save(
            d / "mask" / f"s_{i}_mask.png")
        (d / f"s_{i}.txt").write_text(f"hello{i}\n")
    ds = CombinedFolderDataset(str(d), img_size=96)
    assert len(ds) == 3
    s = ds[1]
    assert "hello1" in s["prompt"]
    assert s["pixel_values"].shape[:2] == s["mask"].shape

    union = UnionDataset(str(tmp_path), img_size=96)
    assert len(union) == 3
    assert union[2]["bucket"] == s["bucket"]


def test_bucketed_loader(anyword_fixture):
    json_path, img_root = anyword_fixture
    ds = AnyWordSingleLineDataset([(json_path, img_root)], resolutions=[128], seed=1)
    loader = BucketedLoader(ds, batch_size=2, grad_accum=1, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) >= 2
    b = batches[0]
    assert b["pixel_values"].shape[0] == 1 and b["pixel_values"].shape[1] == 2
    assert b["mask"].shape[:2] == (1, 2)
    assert len(b["prompts"]) == 2


def test_bucketed_loader_no_mixed_shapes(tmp_path, rng):
    d = tmp_path / "set"
    (d / "mask").mkdir(parents=True)
    for i, size in enumerate([96, 96, 128, 128, 96, 128]):
        Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)).save(d / f"s_{i}.png")
        Image.fromarray(np.zeros((size, size), np.uint8)).save(d / "mask" / f"s_{i}_mask.png")
        (d / f"s_{i}.txt").write_text("x\n")
    ds = CombinedFolderDataset(str(d), img_size=[96, 128], seed=3)
    loader = BucketedLoader(ds, batch_size=2, grad_accum=1, num_workers=1, seed=0)
    for b in loader:
        h, w = b["bucket"]
        assert b["pixel_values"].shape[2:4] == (h, w)
