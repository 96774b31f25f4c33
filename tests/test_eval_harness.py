"""Eval drivers: item prep geometry + OCR harness with a stub recognizer."""

import json

import numpy as np
import pytest
from PIL import Image

from textflux_tpu.cli.eval_ocr import evaluate_directory
from textflux_tpu.cli.run_eval import crop_scene, load_items, prepare_item
from textflux_tpu.rendering import load_font


@pytest.fixture()
def gt_fixture(tmp_path, rng):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    data = {"data_list": []}
    for i in range(3):
        name = f"e_{i}.png"
        Image.fromarray(rng.integers(0, 255, (128, 160, 3), np.uint8)).save(imgs / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [{"text": f"gt{i}", "polygon": [[20, 30], [120, 30], [120, 70], [20, 70]]}],
        })
    jp = tmp_path / "gt.json"
    jp.write_text(json.dumps(data))
    return str(jp), str(imgs), tmp_path


def test_prepare_item_geometry(gt_fixture):
    jp, imgs, _ = gt_fixture
    items = load_items(jp)
    assert len(items) == 3
    prep = prepare_item(items[0], imgs, load_font(size=60), 0.15625)
    # 160 wide, strip = int(160*0.15625)=25, canvas 160x153 -> snap 160x128
    assert prep["size"] == (160, 128)
    assert prep["image"].size == (160, 128)
    # strip region of the mask is black
    m = np.array(prep["mask"])
    assert m[:10].max() == 0

    fake_result = Image.new("RGB", prep["size"], (50, 50, 50))
    cropped = crop_scene(fake_result, prep["orig_h"], prep["strip_h"])
    assert cropped.size[0] == 160 and cropped.size[1] < 128


def test_ocr_harness_with_stub_recognizer(gt_fixture):
    jp, imgs, _ = gt_fixture
    mapping = iter(["gt0", "gt1", "wrong"])

    def recognizer(crop):
        assert crop.ndim == 3 and crop.shape[0] == 48
        return next(mapping)

    metrics = evaluate_directory(imgs, jp, recognizer)
    assert metrics["count"] == 3
    assert metrics["seq_acc"] == pytest.approx(2 / 3)
    assert metrics["ned"] < 1.0
