"""Glyph rendering / composition behavior tests (golden geometry vs the
reference logic, no weights needed)."""

import numpy as np
import pytest
from PIL import Image

from textflux_tpu.rendering import (
    choose_concat_direction,
    concat_multiline,
    concat_singleline,
    crop_multiline_result,
    crop_singleline_result,
    draw_glyph_flexible,
    draw_glyph_polygon,
    draw_glyph_strip,
    extract_mask,
    load_font,
    render_glyph_multi,
    insert_spaces,
    SINGLE_LINE_STRIP_RATIO,
)


@pytest.fixture(scope="module")
def font():
    return load_font(size=60)


def test_flexible_renders_white_on_black(font):
    img = draw_glyph_flexible(font, "HELLO", 512, 80)
    arr = np.array(img)
    assert arr.shape == (80, 512, 3)
    assert arr.max() == 255 and arr.min() == 0
    # text is centered: ink in the middle rows
    assert arr[30:50].sum() > 0
    # empty text -> all black
    assert np.array(draw_glyph_flexible(font, "  ", 512, 80)).max() == 0


def test_strip_clamps_height(font):
    img = draw_glyph_strip(font, "abc", 600, 400)
    assert img.size == (600, 100)  # min(600//6, 400)


def test_insert_spaces():
    assert insert_spaces("ab", 2) == "a  b"
    assert insert_spaces("x", 3) == "x"


def test_polygon_render_horizontal(font):
    poly = np.array([[50, 40], [250, 40], [250, 90], [50, 90]])
    out = draw_glyph_polygon(font, "TEXT", poly, width=300, height=120)
    assert out.shape == (120, 300, 4)
    ys, xs = np.nonzero(out[..., 3])
    assert len(ys) > 0
    # ink stays around the polygon region
    assert 20 <= ys.mean() <= 110 and 40 <= xs.mean() <= 260


def test_polygon_render_vertical(font):
    poly = np.array([[40, 20], [80, 20], [80, 260], [40, 260]])
    out = draw_glyph_polygon(font, "AB", poly, width=120, height=300)
    ys, xs = np.nonzero(out[..., 3])
    assert len(ys) > 0
    assert ys.max() - ys.min() > xs.max() - xs.min()  # vertically laid out


def test_render_glyph_multi_orders_regions(font):
    mask = Image.new("L", (200, 200), 0)
    arr = np.array(mask)
    arr[20:60, 20:180] = 255     # top region
    arr[120:160, 20:180] = 255   # bottom region
    mask = Image.fromarray(arr)
    original = Image.new("RGB", (200, 200), (10, 10, 10))
    out = render_glyph_multi(original, mask, ["TOP", "BOT"], font=font)
    a = np.array(out.convert("L"))
    assert a[:100].sum() > 0 and a[100:].sum() > 0


def test_extract_mask_diff():
    orig = Image.new("RGB", (64, 64), (100, 100, 100))
    drawn = np.array(orig).copy()
    drawn[10:20, 10:20] = 255
    mask = extract_mask(orig, Image.fromarray(drawn))
    m = np.array(mask.convert("L"))
    assert m[15, 15] == 255 and m[40, 40] == 0


def test_extract_mask_sketch_dict():
    orig = Image.new("RGB", (32, 32), 0)
    sketch = {"mask": np.full((32, 32, 3), 200, np.uint8), "image": None}
    m = np.array(extract_mask(orig, sketch).convert("L"))
    assert (m == 255).all()


def test_concat_and_crop_roundtrip_multiline():
    original = Image.new("RGB", (100, 60), (5, 5, 5))       # wide => vertical
    mask = Image.new("RGB", (100, 60), 0)
    rendered = Image.new("RGB", (100, 60), (255, 0, 0))
    combined, cmask, direction = concat_multiline(original, mask, rendered)
    assert direction == "vertical"
    assert combined.size == (100, 120)
    cropped = crop_multiline_result(combined, direction)
    assert cropped.size == (100, 60)
    np.testing.assert_array_equal(np.array(cropped), np.array(original))

    tall = Image.new("RGB", (60, 100), (5, 5, 5))           # tall => horizontal
    _, _, d2 = concat_multiline(tall, Image.new("RGB", (60, 100)), Image.new("RGB", (60, 100)))
    assert d2 == "horizontal"
    assert choose_concat_direction(100, 60) == "horizontal"


def test_concat_and_crop_singleline(font):
    original = Image.new("RGB", (512, 512), (9, 9, 9))
    mask = Image.new("RGB", (512, 512), 0)
    strip_h = int(512 * SINGLE_LINE_STRIP_RATIO)
    strip = draw_glyph_flexible(font, "word", 512, strip_h)
    combined, cmask, sh = concat_singleline(original, mask, strip)
    assert sh == 80
    assert combined.size == (512, 592)
    # mask over the strip must be black
    assert np.array(cmask)[:80].max() == 0
    # crop on a resized result (e.g. snapped to //32: 576 high)
    result = combined.resize((512, 576))
    cropped = crop_singleline_result(result, 512, sh)
    assert cropped.size == (512, 576 - int(576 * 80 / 592))


def test_dataset_strip_is_binary_like_reference():
    """The DATASET strip renderer must produce hard-binary pixels (reference
    draws on a mode-'1' canvas, image_datasets/dataset.py:62); the inference
    strip (draw_glyph_flexible) keeps RGB antialiasing (run_inference.py:123)."""
    font = load_font()
    strip = np.asarray(draw_glyph_strip(font, "Hello", 600, 100))
    assert set(np.unique(strip)) <= {0, 255}
    assert strip.max() == 255 and strip.min() == 0
    flex = np.asarray(draw_glyph_flexible(font, "Hello", 600, 100))
    assert len(np.unique(flex)) > 2  # antialiased edges


def test_load_font_explicit_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="font not found"):
        load_font(str(tmp_path / "nope.ttf"))
