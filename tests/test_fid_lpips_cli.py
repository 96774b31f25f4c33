"""FID/LPIPS harness helpers + AnyText data utils."""

import json

import numpy as np
import jax
import pytest
from PIL import Image

from textflux_tpu.cli.eval_fid_lpips import compute_fid, compute_lpips, matched_pairs
from textflux_tpu.data.anytext import filter_items, load_anytext_json, save_anytext_json
from textflux_tpu.evaluation.lpips import init_lpips_params


def test_matched_pairs(tmp_path, rng):
    gt, gen = tmp_path / "gt", tmp_path / "gen"
    gt.mkdir(), gen.mkdir()
    for n in ["a.png", "b.png", "only_gt.png"]:
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(gt / n)
    for n in ["a.png", "b.png", "only_gen.png"]:
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(gen / n)
    pairs = matched_pairs(str(gt), str(gen))
    assert len(pairs) == 2


def test_compute_lpips_and_fid(tmp_path, rng):
    gt, gen = tmp_path / "gt", tmp_path / "gen"
    gt.mkdir(), gen.mkdir()
    for i in range(4):
        arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.png")
        Image.fromarray(255 - arr).save(gen / f"{i}.png")
    pairs = matched_pairs(str(gt), str(gen))

    lp = init_lpips_params(jax.random.PRNGKey(0))
    d = compute_lpips(pairs, lp, batch=2, size=64)
    assert d > 0

    def extractor(batch):  # trivial feature extractor for the FID math
        return batch.reshape(batch.shape[0], -1)[:, :16]

    fid = compute_fid(pairs, extractor, size=32)
    assert fid > 0


def test_anytext_utils(tmp_path):
    data = {"data_list": [
        {"img_name": "a.png", "annotations": [
            {"text": "hi", "polygon": [[0, 0], [1, 0], [1, 1]]},
            {"text": "", "polygon": [[0, 0]]},
            {"text": "bad", "polygon": [[0, 0], [1, 0], [1, 1]], "valid": False},
        ]},
        {"img_name": "b.png", "annotations": [{"text": "", "polygon": []}]},
    ]}
    p = tmp_path / "d.json"
    save_anytext_json(data, str(p))
    loaded = load_anytext_json(str(p))
    items = filter_items(loaded)
    assert len(items) == 1
    assert len(items[0]["annotations"]) == 1
    assert items[0]["annotations"][0]["text"] == "hi"


def test_cli_with_inception_weights(tmp_path, rng):
    """--inception-weights drives strict FID through the InceptionV3 port:
    the CLI loads a locally provided torch state dict, folds BN, and reports
    a finite FID over matched pairs."""
    import torch

    from tests.test_inception import _build_torch_fid_inception
    from textflux_tpu.cli.eval_fid_lpips import main

    torch.manual_seed(0)
    net = _build_torch_fid_inception()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
    weights = tmp_path / "inception.pth"
    torch.save(net.state_dict(), weights)

    gt, gen = tmp_path / "gt", tmp_path / "gen"
    gt.mkdir(), gen.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.png")
        Image.fromarray(255 - arr).save(gen / f"{i}.png")

    log_dir = tmp_path / "log"
    main(["--gt-dir", str(gt), "--gen-dir", str(gen),
          "--inception-weights", str(weights), "--log-dir", str(log_dir)])
    logs = list(log_dir.glob("*.log"))
    assert logs
    last = logs[0].read_text().strip().splitlines()[-1]
    results = json.loads(last)
    assert results["pairs"] == 3 and np.isfinite(results["fid"])
