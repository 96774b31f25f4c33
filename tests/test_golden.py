"""Golden fixed-seed regression gate.

Runs the tiny deterministic pipeline (JAX-initialized params, PRNGKey(0)) on
the `resource/example/` fixtures at a fixed seed and asserts the outputs match
committed expectations, for the euler, overshoot, and quantized paths — so an
output-changing regression (sampler math, packing, conditioning, quant layout)
fails CI instead of relying on the manual verify drive. The reference's
analogue is the eyeball-golden `resource/example/results/` idiom (SURVEY §4).

The glyph-rendering path gets its own golden (the composed conditioning
canvas), decoupled from the DiT goldens so a font/PIL change cannot masquerade
as a pipeline regression (DiT goldens consume raw fixture pixels only).

After an INTENTIONAL output change, regenerate and commit:

    TEXTFLUX_GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
    git add tests/golden && git commit
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from helpers import FLUX_TINY, tiny_pipeline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
EXAMPLE = os.path.join(os.path.dirname(__file__), "..", "resource", "example")
SEED = 7


def _check(name: str, arr: np.ndarray, atol: float, mean_tol: float = None):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    arr = np.asarray(arr, np.float32)
    if os.environ.get("TEXTFLUX_GOLDEN_REGEN") == "1":
        # save-and-return (no skip): a test may check several goldens
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, out=arr)
        return
    assert os.path.exists(path), (
        f"missing golden {path} — generate with TEXTFLUX_GOLDEN_REGEN=1 "
        "python -m pytest tests/test_golden.py -q, review, and commit")
    want = np.load(path)["out"]
    assert want.shape == arr.shape, f"{name}: shape {arr.shape} != golden {want.shape}"
    if mean_tol is not None:  # loose image-level check (host-side rendering)
        assert float(np.mean(np.abs(arr - want))) < mean_tol, (
            f"{name}: mean abs diff {np.mean(np.abs(arr - want)):.4f} >= {mean_tol}")
    else:
        np.testing.assert_allclose(arr, want, atol=atol,
                                   err_msg=f"golden mismatch: {name}")


def _fixture_inputs():
    img = Image.open(os.path.join(EXAMPLE, "ori", "ori_0001.png"))
    mask = Image.open(os.path.join(EXAMPLE, "mask", "mask_0001.png"))
    return img, mask


def _run(pipe, sampler="euler", **kw):
    img, mask = _fixture_inputs()
    return pipe(image=img, mask_image=mask, words=["OPEN"], height=32, width=48,
                seed=SEED, sampler=sampler, dtype=jnp.float32,
                output_type="np", **kw)


def test_golden_euler():
    _check("euler", _run(tiny_pipeline()), atol=2e-3)


def test_golden_overshoot():
    _check("overshoot", _run(tiny_pipeline(), sampler="overshoot",
                             overshoot_c=2.0), atol=2e-3)


def test_golden_quantized_weight_only():
    """int8 weight-only path (min_size=0 forces quantization of the tiny
    denses so the dequant-on-read matmul path is exercised end to end)."""
    from textflux_tpu.io.quantize import quantize_tree

    pipe = tiny_pipeline()
    pipe.flux_params = quantize_tree(pipe.flux_params, min_size=0,
                                     mode="weight_only")
    _check("int8_weight_only", _run(pipe), atol=2e-3)


def test_golden_w8a8():
    from textflux_tpu.io.quantize import quantize_tree

    pipe = tiny_pipeline()
    pipe.flux_params = quantize_tree(pipe.flux_params, min_size=0, mode="w8a8")
    _check("int8_w8a8", _run(pipe), atol=2e-3)


def test_golden_nf4_and_mixed():
    """NF4 and mixed int8/NF4 paths. FLUX_TINY's hidden dim (16) makes every
    dense fall back to weight_only (NF4 needs in-dim % 128 == 0), so this
    golden uses a width-128 tiny config: the half-split nibble packing, the
    per-64-row absmax, the double-quantized absmax and the mixed IO-boundary
    policy (io/quantize.py MIXED_INT8_NAMES) are all exercised end to end."""
    from textflux_tpu.io.quantize import quantize_tree
    from helpers import tiny_pipeline_wide

    pipe = tiny_pipeline_wide()
    base = pipe.flux_params
    pipe.flux_params = quantize_tree(base, min_size=0, mode="nf4")
    _check("nf4_w128", _run(pipe), atol=2e-3)
    pipe.flux_params = quantize_tree(base, min_size=0, mode="mixed",
                                     double_quant=True)
    _check("mixed_dq_w128", _run(pipe), atol=2e-3)


def test_golden_rendered_canvas():
    """The host-side glyph-render + concat path: strip render, vstack, mask
    extension. Loose mean tolerance absorbs sub-pixel antialiasing drift in
    PIL/freetype while still catching layout/scaling regressions."""
    from textflux_tpu.rendering.compose import concat_singleline
    from textflux_tpu.rendering.glyph import draw_glyph_strip, load_font

    img, mask = _fixture_inputs()
    strip = draw_glyph_strip(load_font(), "OPEN", img.width, img.height)
    canvas, full_mask, strip_h = concat_singleline(img, mask, strip)
    assert strip_h == strip.height
    _check("canvas", np.asarray(canvas.convert("RGB"), np.float32) / 255.0,
           atol=0.0, mean_tol=0.01)
    _check("canvas_mask", np.asarray(full_mask.convert("L"), np.float32) / 255.0,
           atol=0.0, mean_tol=0.005)


def test_golden_latents_bf16_fused_independence():
    """The goldens above pin the f32/xla path; this guards the bf16 path's
    *structure* (not bitwise): bf16 output must stay within bf16-rounding
    distance of the f32 golden run."""
    pipe = tiny_pipeline()
    ref = _run(pipe)
    img, mask = _fixture_inputs()
    out = np.asarray(pipe(image=img, mask_image=mask, words=["OPEN"],
                          height=32, width=48, seed=SEED, dtype=jnp.bfloat16,
                          output_type="np"), np.float32)
    assert out.shape == ref.shape
    assert float(np.mean(np.abs(out - ref))) < 0.05
