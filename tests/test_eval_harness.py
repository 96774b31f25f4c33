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


def test_prepare_item_dataset_strip_matches_trainer(tmp_path):
    """--strip-renderer dataset must reproduce the TRAINING conditioning
    byte-for-byte: same renderer (mode-'1' binary), same min(w//6, h) height
    clamp — a from-scratch model is evaluated on the distribution it saw
    (image_datasets/dataset.py:62 vs run_inference.py:123)."""
    from textflux_tpu.rendering import draw_glyph_strip

    # snap-exact geometry (the closed-loop protocol's): 64x54 scene,
    # strip_h = min(64//6, 54) = 10, canvas 64x64 — //32 snap is identity,
    # so the prepared canvas contains the raw strip bytes
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    Image.new("RGB", (64, 54), (210, 210, 210)).save(imgs / "a.png")
    item = {"img_name": "a.png",
            "annotations": [{"text": "EEE",
                             "polygon": [[6, 16], [58, 16], [58, 38], [6, 38]]}]}
    font = load_font(size=60)
    prep = prepare_item(item, str(imgs), font, 0.15625, "dataset")
    assert prep["strip_h"] == 10 and prep["size"] == (64, 64)
    expected = np.asarray(draw_glyph_strip(font, "EEE", 64, 54).convert("RGB"))
    got = np.asarray(prep["image"])[:10]
    assert np.array_equal(got, expected)
    # and it is the BINARY renderer (no antialiasing midtones), unlike the
    # default inference strip
    assert set(np.unique(expected).tolist()) <= {0, 255}
    prep_inf = prepare_item(item, str(imgs), font, 0.15625)
    inf_strip = np.unique(np.asarray(prep_inf["image"])[:10])
    assert len(inf_strip) > 2


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


def test_eval_ocr_cli_main(gt_fixture, tmp_path, monkeypatch):
    """Drive the REAL eval_ocr main(): the module:callable recognizer spec
    (incl. the ':recognize' default attr), ppocr_keys charset parsing (a
    charset line holding a space char must survive — strip() instead of
    rstrip('\\n') would drop it and shift every char id), and --report
    writing. Previously only evaluate_directory was tested in-process."""
    import sys

    jp, imgs, _ = gt_fixture
    stub_dir = tmp_path / "stubmod"
    stub_dir.mkdir()
    (stub_dir / "stubrec.py").write_text(
        "def recognize(crop):\n    return 'gt0'\n")
    # ppocr_keys format: one char per line; include a literal space line
    charset = tmp_path / "keys.txt"
    charset.write_text("g\nt\n0\n1\n2\n \n", encoding="utf-8")

    from textflux_tpu.cli import eval_ocr as EO

    assert EO.load_charset(str(charset))[" "] == 5  # space char preserved

    monkeypatch.syspath_prepend(str(stub_dir))
    report = tmp_path / "report.json"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--images-dir", imgs, "--json-path", jp,
        "--recognizer", "stubrec",          # default attr -> :recognize
        "--charset", str(charset), "--report", str(report),
    ])
    EO.main()
    metrics = json.loads(report.read_text())
    assert metrics["count"] == 3
    assert metrics["seq_acc"] == pytest.approx(1 / 3)   # only gt0 matches
    assert 0.0 < metrics["ned"] < 1.0


@pytest.fixture()
def two_bucket_fixture(tmp_path, rng):
    """5 items across two distinct //32 resolution buckets."""
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    data = {"data_list": []}
    sizes = [(128, 160), (128, 160), (128, 160), (96, 128), (96, 128)]
    for i, (h, w) in enumerate(sizes):
        name = f"b_{i}.png"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(imgs / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [{"text": f"t{i}", "polygon": [[10, 20], [w - 10, 20], [w - 10, 50], [10, 50]]}],
        })
    jp = tmp_path / "gt.json"
    jp.write_text(json.dumps(data))
    return str(jp), str(imgs), tmp_path


def _run_eval_cli(monkeypatch, jp, imgs, out_dir, batch_size, extra=()):
    from textflux_tpu.cli import run_eval as RE
    from textflux_tpu.pipeline.fill import FillPipeline
    from tests.helpers import tiny_pipeline

    pipe = tiny_pipeline()
    monkeypatch.setattr(FillPipeline, "from_pretrained",
                        classmethod(lambda cls, *a, **k: pipe))
    RE.main([
        "--model", "unused", "--json-path", jp, "--original-images-dir", imgs,
        "--output-dir", str(out_dir), "--steps", "2",
        "--batch-size", str(batch_size), "--seq-pad-multiple", "64",
        *extra,
    ])


def test_run_eval_cli_batched_matches_per_item(monkeypatch, two_bucket_fixture):
    """--batch-size>1 groups items into (H, W) buckets through generate_batch
    and produces the same images as the per-item path."""
    jp, imgs, tmp = two_bucket_fixture
    _run_eval_cli(monkeypatch, jp, imgs, tmp / "per_item", 1)
    _run_eval_cli(monkeypatch, jp, imgs, tmp / "batched", 2)

    import os
    names = sorted(os.listdir(tmp / "per_item" / "full_images"))
    assert len(names) == 5
    assert sorted(os.listdir(tmp / "batched" / "full_images")) == names
    for sub in ("full_images", "cropped_images"):
        for name in names:
            a = np.asarray(Image.open(tmp / "per_item" / sub / name), np.int16)
            b = np.asarray(Image.open(tmp / "batched" / sub / name), np.int16)
            np.testing.assert_allclose(a, b, atol=1, err_msg=f"{sub}/{name}")
    for d in ("per_item", "batched"):
        report = json.loads((tmp / d / "failures.json").read_text())
        assert report["done"] == 5 and report["failed"] == 0


@pytest.fixture()
def multiline_fixture(tmp_path, rng):
    """4 items with TWO annotated regions each, across two resolution
    buckets (landscape -> horizontal concat, portrait -> vertical)."""
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    data = {"data_list": []}
    sizes = [(128, 160), (128, 160), (160, 96), (160, 96)]
    for i, (h, w) in enumerate(sizes):
        name = f"m_{i}.png"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(imgs / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [
                {"text": f"top{i}", "polygon": [[10, 10], [w - 10, 10], [w - 10, 40], [10, 40]]},
                {"text": f"bot{i}", "polygon": [[10, h - 50], [w - 10, h - 50], [w - 10, h - 15], [10, h - 15]]},
            ],
        })
    jp = tmp_path / "gt.json"
    jp.write_text(json.dumps(data))
    return str(jp), str(imgs), tmp_path


def test_prepare_item_multiline_geometry(multiline_fixture):
    from textflux_tpu.cli.run_eval import prepare_item_multiline

    jp, imgs, _ = multiline_fixture
    items = load_items(jp)

    # landscape 160x128 -> vertical stack (canvas 160x256), both regions masked
    prep = prepare_item_multiline(items[0], imgs, load_font(size=40))
    assert prep["direction"] == "vertical"
    assert prep["size"] == (160, 256)
    assert prep["words"] == ["top0", "bot0"]
    m = np.array(prep["mask"].convert("L"))
    assert m[: m.shape[0] // 2].max() == 0          # glyph half fully kept
    scene = m[m.shape[0] // 2:]
    assert scene[20, 80] > 0 and scene[100, 80] > 0  # both regions masked
    # the glyph half carries both rendered texts (non-black in both regions)
    g = np.array(prep["image"].convert("L"))[: m.shape[0] // 2]
    assert g[10:40].max() > 0 and g[78:113].max() > 0

    # portrait 96x160 -> horizontal concat
    prep2 = prepare_item_multiline(items[2], imgs, load_font(size=40))
    assert prep2["direction"] == "horizontal"
    assert prep2["size"] == (192, 160)


def test_run_eval_cli_multiline_bucketed(monkeypatch, multiline_fixture):
    """--multiline routes full-canvas conditioning through the bucketed batch
    path; all regions are edited and the crop returns the scene half."""
    import os

    jp, imgs, tmp = multiline_fixture
    _run_eval_cli(monkeypatch, jp, imgs, tmp / "ml", 2, extra=("--multiline",))
    report = json.loads((tmp / "ml" / "failures.json").read_text())
    assert report["done"] == 4 and report["failed"] == 0
    names = sorted(os.listdir(tmp / "ml" / "cropped_images"))
    assert names == [f"m_{i}.png" for i in range(4)]
    # cropped scene halves match the original scene size
    a = Image.open(tmp / "ml" / "cropped_images" / "m_0.png")
    assert a.size == (160, 128)
    b = Image.open(tmp / "ml" / "cropped_images" / "m_2.png")
    assert b.size == (96, 160)

    # multi-region scoring through the OCR harness (--all-regions protocol)
    texts = iter(["top0", "bot0", "top1", "wrong", "top2", "bot2", "top3", "bot3"])
    metrics = evaluate_directory(
        str(tmp / "ml" / "cropped_images"), jp, lambda crop: next(texts),
        all_regions=True)
    assert metrics["count"] == 8
    assert metrics["seq_acc"] == pytest.approx(7 / 8)


def test_run_eval_cli_records_failures(monkeypatch, two_bucket_fixture, tmp_path):
    """A broken item lands in failures.json with context; the rest complete."""
    jp, imgs, tmp = two_bucket_fixture
    data = json.loads(open(jp).read())
    data["data_list"].append({
        "img_name": "missing.png",
        "annotations": [{"text": "x", "polygon": [[0, 0], [10, 0], [10, 10], [0, 10]]}],
    })
    jp2 = tmp_path / "gt2.json"
    jp2.write_text(json.dumps(data))
    _run_eval_cli(monkeypatch, str(jp2), imgs, tmp / "out_fail", 2)
    report = json.loads((tmp / "out_fail" / "failures.json").read_text())
    assert report["done"] == 5 and report["failed"] == 1
    assert report["failures"][0]["img_name"] == "missing.png"
    assert "error" in report["failures"][0]


def test_run_eval_cli_mesh_sharded(monkeypatch, two_bucket_fixture):
    """--mesh shards the pipeline (shard_for_serving) and data-shards batches
    over the 8-device CPU mesh; outputs match the unsharded batched run."""
    jp, imgs, tmp = two_bucket_fixture
    import os

    from textflux_tpu.cli import run_eval as RE
    from textflux_tpu.pipeline.fill import FillPipeline
    from tests.helpers import tiny_pipeline

    captured = {}

    def fake_from_pretrained(cls, *a, mesh=None, **k):
        # a FRESH pipe per load: reusing one object would leave the second
        # ("unsharded") run on the first run's tp-permuted weights and
        # tp-bound jits — both runs would then share the tensor-parallel
        # compute path and a tp bug would corrupt them identically,
        # voiding the comparison (tiny_pipeline is seed-deterministic)
        captured["mesh"] = mesh
        p = tiny_pipeline()
        if mesh is not None:
            p.shard_for_serving(mesh)
        return p

    monkeypatch.setattr(FillPipeline, "from_pretrained",
                        classmethod(fake_from_pretrained))
    RE.main([
        "--model", "unused", "--json-path", jp, "--original-images-dir", imgs,
        "--output-dir", str(tmp / "sharded"), "--steps", "2",
        "--batch-size", "4", "--seq-pad-multiple", "64", "--mesh", "2,2,2",
    ])
    assert captured["mesh"] is not None
    report = json.loads((tmp / "sharded" / "failures.json").read_text())
    assert report["done"] == 5 and report["failed"] == 0

    # comparison run gets its own fresh, genuinely unsharded pipe via
    # fake_from_pretrained (mesh=None -> no shard_for_serving call)
    RE.main([
        "--model", "unused", "--json-path", jp, "--original-images-dir", imgs,
        "--output-dir", str(tmp / "unsharded"), "--steps", "2",
        "--batch-size", "4", "--seq-pad-multiple", "64",
    ])
    names = sorted(os.listdir(tmp / "sharded" / "full_images"))
    assert sorted(os.listdir(tmp / "unsharded" / "full_images")) == names
    for name in names:
        a = np.asarray(Image.open(tmp / "sharded" / "full_images" / name), np.int16)
        b = np.asarray(Image.open(tmp / "unsharded" / "full_images" / name), np.int16)
        # sharded vs unsharded reassociates f32 accumulations, and the two
        # runs may mix fresh XLA:CPU compiles with persistent-cache AOT loads
        # whose codegen differs by a ULP (observed: isolated pixels off by
        # 3-5 after a host-generation change invalidated the cache's machine
        # features) — pixel-identical is not the contract. Bound the TAIL:
        # almost all pixels within 4, no pixel beyond 8.
        diff = np.abs(a - b)
        assert (diff > 4).mean() < 1e-3, (name, (diff > 4).mean())
        assert diff.max() <= 8, (name, diff.max())


def test_run_eval_cli_staged_text(monkeypatch, two_bucket_fixture):
    """--staged-text (encode all prompts -> release text encoders -> load the
    deferred DiT) produces the same images as the all-resident run."""
    import os

    jp, imgs, tmp = two_bucket_fixture
    _run_eval_cli(monkeypatch, jp, imgs, tmp / "resident", 2)

    from textflux_tpu.cli import run_eval as RE
    from textflux_tpu.pipeline.fill import FillPipeline
    from tests.helpers import tiny_pipeline

    pipe = tiny_pipeline()
    deferred = pipe.flux_params
    pipe.flux_params = None
    pipe._deferred_flux = lambda mesh: deferred
    monkeypatch.setattr(FillPipeline, "from_pretrained",
                        classmethod(lambda cls, *a, **k: pipe))
    RE.main([
        "--model", "unused", "--json-path", jp, "--original-images-dir", imgs,
        "--output-dir", str(tmp / "staged"), "--steps", "2",
        "--batch-size", "2", "--seq-pad-multiple", "64", "--staged-text",
    ])
    assert pipe.t5_params is None and pipe.clip_params is None
    assert pipe.flux_params is not None

    names = sorted(os.listdir(tmp / "resident" / "full_images"))
    assert sorted(os.listdir(tmp / "staged" / "full_images")) == names
    for name in names:
        a = np.asarray(Image.open(tmp / "resident" / "full_images" / name), np.int16)
        b = np.asarray(Image.open(tmp / "staged" / "full_images" / name), np.int16)
        np.testing.assert_allclose(a, b, atol=1, err_msg=name)
    report = json.loads((tmp / "staged" / "failures.json").read_text())
    assert report["done"] == 5 and report["failed"] == 0


def test_run_eval_cli_skip_existing(monkeypatch, two_bucket_fixture):
    """--skip-existing resumes an interrupted run: items with both outputs
    already on disk are not regenerated (mtime-stable), partially-written
    items rerun, and the report counts the skips."""
    import os
    import time

    jp, imgs, tmp = two_bucket_fixture
    out = tmp / "resume"
    _run_eval_cli(monkeypatch, jp, imgs, out, 1)
    names = sorted(os.listdir(out / "full_images"))
    assert len(names) == 5

    # simulate an interrupted run: one item lost its cropped output
    os.remove(out / "cropped_images" / names[0])
    mtimes = {n: os.path.getmtime(out / "full_images" / n) for n in names[1:]}
    time.sleep(0.05)

    _run_eval_cli(monkeypatch, jp, imgs, out, 1, extra=("--skip-existing",))
    report = json.loads((out / "failures.json").read_text())
    assert report["skipped_existing"] == 4
    assert report["done"] == 1 and report["failed"] == 0
    assert os.path.exists(out / "cropped_images" / names[0])  # regenerated
    for n, m in mtimes.items():  # untouched, not rewritten
        assert os.path.getmtime(out / "full_images" / n) == m


def test_safe_name_no_collisions():
    from textflux_tpu.cli.run_eval import safe_name

    assert safe_name("part1/0001.jpg") == "part1_0001.jpg"
    assert safe_name("part2/0001.jpg") == "part2_0001.jpg"
    assert safe_name(r"a\b\c.png") == "a_b_c.png"
    assert safe_name("plain.png") == "plain.png"
