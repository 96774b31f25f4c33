"""Demo callback tests on the tiny pipeline (gradio-free)."""

import numpy as np
import pytest
from PIL import Image

from tests.helpers import tiny_pipeline
from textflux_tpu.cli.demo import demo_custom, demo_custom_beta, demo_normal
from textflux_tpu.rendering import load_font


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline()


@pytest.fixture()
def scene(rng):
    original = Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8))
    drawn = np.array(original).copy()
    drawn[20:40, 30:70] = 255
    return original, Image.fromarray(drawn)


def test_demo_custom(pipe, scene):
    original, drawn = scene
    font = load_font(size=40)
    cropped, full, rendered = demo_custom(
        pipe, original, drawn, "hi", steps=1, seed=0, sampler="euler", font=font)
    assert full.size == (96, 128)     # vertical concat, snapped
    assert cropped.size == (96, 64)


def test_demo_normal(pipe, scene):
    original, _ = scene
    mask = Image.new("RGB", original.size, 0)
    out = demo_normal(pipe, original, mask, "word", steps=1, sampler="euler")
    assert out.size == (96, 64)


def test_demo_custom_beta_singleline(pipe, scene):
    original, drawn = scene
    cropped, full, strip = demo_custom_beta(
        pipe, original, drawn, "single", steps=1, seed=0, sampler="euler")
    assert strip.size[1] == int(96 * 0.15625)
    assert full.size[0] == 96


def test_demo_custom_beta_multiline(pipe, scene):
    original, drawn = scene
    cropped, full, strip = demo_custom_beta(
        pipe, original, drawn, "one\ntwo", steps=1, seed=0, sampler="euler")
    # stacked strips: 2 * min(96//6, 64/2) = 2*16
    assert strip.size == (96, 32)


def test_ui_click_callbacks_match_wiring(pipe, rng):
    """gradio isn't installable here (UI pinned to SUPPORTED_GRADIO 3.x);
    assert the click callbacks build_ui wires accept exactly the component
    lists it passes and produce images, so the Blocks layer only depends on
    the pinned gr API, not on callback arity."""
    import inspect

    from textflux_tpu.cli.demo import (
        SUPPORTED_GRADIO,
        _custom_click,
        _normal_click,
        demo_custom_beta,
    )

    assert SUPPORTED_GRADIO.startswith("3.")

    # Derive the expected arities from build_ui's ACTUAL wiring via a stub
    # gradio (hand-duplicating '6' and '3' here could not catch a component
    # added to the click inputs without updating the callback).
    import sys
    import types

    recorded = []

    class _Comp:
        def __init__(self, *a, **k):
            pass

        def click(self, fn, inputs, outputs):
            recorded.append((fn, list(inputs)))

    class _Ctx(_Comp):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    stub = types.ModuleType("gradio")
    stub.__version__ = "3.50.1"
    for name in ("Image", "Textbox", "Slider", "Number", "Button", "Markdown"):
        setattr(stub, name, _Comp)
    for name in ("Blocks", "Tab"):
        setattr(stub, name, _Ctx)
    sys.modules["gradio"] = stub
    try:
        from textflux_tpu.cli.demo import build_ui

        build_ui(pipe)
    finally:
        del sys.modules["gradio"]
    assert len(recorded) == 2
    for fn, inputs in recorded:
        assert len(inspect.signature(fn).parameters) == len(inputs), \
            (fn, len(inputs))

    cb = _custom_click(pipe, demo_custom_beta)
    # [original, words, steps, guidance, seed, overshoot_c] — 6 components
    assert len(inspect.signature(cb).parameters) == 6
    original = Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    drawn = np.array(original).copy()
    drawn[20:40, 10:50] = 255
    sketch = {"image": original, "mask": Image.fromarray(drawn)}
    out = cb(sketch, "hi", 1, 7.0, 0, 2.0)
    assert out.size[0] == 64

    cb2 = _normal_click(pipe)
    # [combined, cmask, words2] — 3 components
    assert len(inspect.signature(cb2).parameters) == 3
    combined = Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))
    mask = Image.fromarray((rng.random((64, 64)) > 0.8).astype(np.uint8) * 255)
    out2 = cb2(combined, mask, "word")
    assert out2.size == (64, 64)
