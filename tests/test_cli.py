"""End-to-end CLI flow on the tiny pipeline: render -> concat -> fill -> crop -> save."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from tests.helpers import tiny_pipeline
from textflux_tpu.cli.run_inference import render_conditioning, run, save_results


@pytest.fixture()
def example(tmp_path):
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8))
    mask = np.zeros((64, 96), np.uint8)
    mask[20:40, 30:70] = 255
    img_p, mask_p, words_p = tmp_path / "ori.png", tmp_path / "mask.png", tmp_path / "words.txt"
    img.save(img_p)
    Image.fromarray(mask).convert("RGB").save(mask_p)
    return img_p, mask_p, words_p, tmp_path


def test_singleline_flow(example):
    img_p, mask_p, words_p, tmp = example
    words_p.write_text("hello\n")
    pipe = tiny_pipeline()
    result, cropped, rendered, original, mask = run(
        pipe, str(img_p), str(mask_p), str(words_p), steps=1, seed=0)
    # canvas: 96x(64+int(96*0.15625)=15) = 96x79 -> //32 snap -> 96x64
    assert result.size == (96, 64)
    assert cropped.size[0] == 96 and cropped.size[1] < 64
    seq = save_results(str(tmp / "out"), result, cropped, mask, original, rendered, str(words_p))
    assert (tmp / "out" / f"result_{seq}.png").exists()
    assert (tmp / "out" / "crop" / f"crop_{seq}.png").exists()


def test_multiline_flow(example):
    img_p, mask_p, words_p, tmp = example
    words_p.write_text("one\ntwo\n")
    pipe = tiny_pipeline()
    result, cropped, rendered, original, mask = run(
        pipe, str(img_p), str(mask_p), str(words_p), steps=1, seed=0)
    # wide image => vertical concat: 96x128 -> snap 96x128
    assert result.size == (96, 128)
    assert cropped.size == (96, 64)


def test_run_inference_main_flag_plumbing(example, monkeypatch):
    """Drive the REAL main() argv surface and assert the flags reach
    from_pretrained: the '--quantize-mode implies --quantize' trap,
    --staged-text -> defer_transformer, and --max-sequence-length ->
    pipe_cfg. Previously no test invoked main() at all, so a regression in
    any of this plumbing (e.g. quantize=args.quantize alone) shipped green
    while a user passing only --quantize-mode silently served bf16."""
    import sys

    from textflux_tpu.cli import run_inference as M
    from textflux_tpu.pipeline.fill import FillPipeline

    img_p, mask_p, words_p, _ = example
    words_p.write_text("hello\n")

    captured = {}

    class StopLoad(Exception):
        pass

    def fake_from_pretrained(model, **kw):
        captured.clear()
        captured.update(kw, model=model)
        raise StopLoad

    monkeypatch.setattr(FillPipeline, "from_pretrained", fake_from_pretrained)

    base = ["prog", "--model", "m", "--image", str(img_p),
            "--mask", str(mask_p), "--words", str(words_p)]

    # mode alone implies quantization with that mode
    monkeypatch.setattr(sys, "argv", base + ["--quantize-mode", "w8a8",
                                             "--max-sequence-length", "128",
                                             "--staged-text"])
    with pytest.raises(StopLoad):
        M.main()
    assert captured["quantize"] == "w8a8"
    assert captured["defer_transformer"] is True
    assert captured["pipe_cfg"].max_sequence_length == 128

    # --quantize alone defaults the mode
    monkeypatch.setattr(sys, "argv", base + ["--quantize"])
    with pytest.raises(StopLoad):
        M.main()
    assert captured["quantize"] == "weight_only"
    assert captured["defer_transformer"] is False

    # neither flag: no quantization
    monkeypatch.setattr(sys, "argv", list(base))
    with pytest.raises(StopLoad):
        M.main()
    assert captured["quantize"] is False

    # input-path validation fires BEFORE any model load
    monkeypatch.setattr(sys, "argv", base[:-1] + ["/nonexistent/words.txt"])
    with pytest.raises(SystemExit):
        M.main()
    assert captured["quantize"] is False  # unchanged: load never reached


def test_conditioning_dispatch(example):
    img_p, mask_p, words_p, _ = example
    original = Image.open(img_p).convert("RGB")
    mask = Image.open(mask_p).convert("RGB")
    combined, cmask, crop_fn, rendered = render_conditioning(original, mask, ["a", "b"])
    assert combined.size == (96, 128)       # multi-line vertical
    combined, cmask, crop_fn, rendered = render_conditioning(original, mask, ["single line"])
    assert combined.size == (96, 64 + 15)   # strip stacked
