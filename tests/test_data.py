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
    # the mask must actually mark the annotation polygon (an all-zero mask
    # trains on nothing) and must be EMPTY over the glyph strip rows at the
    # top: mask pixels over the strip would condition the model to inpaint
    # its own glyph guidance. (The old `max() <= 1.0` assertion here was
    # vacuous — true for any /255-normalized mask.)
    assert s["mask"].max() == 1.0
    strip_rows = max(1, int(w * 0.15625) // 2)   # safely inside the strip
    assert s["mask"][:strip_rows].max() == 0.0
    assert s["mask"][strip_rows:].max() == 1.0   # polygon lies in the scene


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


def test_snap_bucket_upscale_warns_and_sizes(capsys):
    """The round-4 silent-failure mode, pinned: a short side below (or
    anywhere under) the quant is UPSCALED to it — the canvas the model
    trains on differs from the serving canvas and the model scores at
    chance with no error anywhere. The one-time warning is the only
    user-visible signal; it must fire on ANY rounded-up short side."""
    from textflux_tpu.data.dataset import _snap_bucket

    _snap_bucket._warned = False
    out = _snap_bucket(Image.new("RGB", (64, 64)), 128)
    assert out.size == (64, 128)            # the 2x stretch itself
    assert "upscales" in capsys.readouterr().out

    # the 1.6x case: short side in (quant/2, quant) must ALSO warn
    _snap_bucket._warned = False
    out = _snap_bucket(Image.new("RGB", (100, 80)), 128)
    assert out.size == (96, 128)
    assert "upscales" in capsys.readouterr().out

    # warn-once: the second call stays silent
    _snap_bucket(Image.new("RGB", (64, 64)), 128)
    assert "upscales" not in capsys.readouterr().out

    # no upscale -> no warning; quant 32 is exact for //32 canvases
    _snap_bucket._warned = False
    out = _snap_bucket(Image.new("RGB", (512, 384)), 128)
    assert out.size == (512, 384)
    assert capsys.readouterr().out == ""
    assert _snap_bucket(Image.new("RGB", (64, 64)), 32).size == (64, 64)


def test_bucketed_loader_epoch_reshuffle(anyword_fixture):
    """Successive epochs must see DIFFERENT shuffle orders (a bare seed
    replayed the same permutation every epoch), and set_epoch must reposition
    the stream deterministically (resume: a restarted run at epoch k sees
    epoch k's order, not epoch 0's)."""
    json_path, img_root = anyword_fixture
    ds = AnyWordSingleLineDataset([(json_path, img_root)], resolutions=[128],
                                  seed=1)

    def epoch_order(loader):
        return [tuple(b["prompts"]) for b in loader]

    loader = BucketedLoader(ds, batch_size=1, grad_accum=1, num_workers=1,
                            seed=0)
    e0, e1 = epoch_order(loader), epoch_order(loader)
    assert e0 != e1, "epoch 1 replayed epoch 0's order"

    fresh = BucketedLoader(ds, batch_size=1, grad_accum=1, num_workers=1,
                           seed=0)
    fresh.set_epoch(1)
    assert epoch_order(fresh) == e1, "set_epoch(1) did not reproduce epoch 1"


def test_bucketed_loader_abandoned_epoch_drains_threads(anyword_fixture):
    """Breaking out of an epoch mid-iteration must not leave the batcher or
    worker threads blocked forever in put() on a full queue (they would
    strand a full prefetch queue of decoded samples per abandoned epoch)."""
    import threading
    import time

    json_path, img_root = anyword_fixture
    ds = AnyWordSingleLineDataset([(json_path, img_root)], resolutions=[128],
                                  seed=1)
    before = threading.active_count()
    loader = BucketedLoader(ds, batch_size=1, grad_accum=1, num_workers=2,
                            seed=0, prefetch=1)
    it = iter(loader)
    next(it)      # one batch; prefetch=1 leaves the batcher blocked in put
    it.close()    # abandon the epoch (same as `break` in a for-loop)
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before, (
        f"{threading.active_count() - before} loader thread(s) still alive "
        "after abandoning the epoch")


def test_native_morphology_does_not_mutate_input(rng):
    """dilate/erode must return a fresh array on BOTH backends: the C kernel
    path used to write into the caller's (already-contiguous) mask while the
    cv2 fallback returned a copy — environment-dependent aliasing."""
    from textflux_tpu.data import native

    mask = np.zeros((16, 16), np.uint8)
    mask[6:10, 6:10] = 255
    orig = mask.copy()
    out = native.dilate(mask, 1)
    assert np.array_equal(mask, orig), "dilate mutated its input"
    assert out.sum() > orig.sum()
    out2 = native.erode(mask, 1)
    assert np.array_equal(mask, orig), "erode mutated its input"
    assert out2.sum() < orig.sum()


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


def test_bucket_quant_bounds_cardinality_and_fills_batches(tmp_path, rng):
    """Arbitrary aspect ratios explode the raw (H, W) bucket space, so B>1
    shape-uniform batches never fill on small datasets (drop_last discards
    everything). bucket_quant=128 snaps the short side to a coarse lattice:
    bounded bucket count, B=8 batches actually form; quant=32 stays exact
    reference sizing (one //32 floor)."""
    from textflux_tpu.data.loader import BucketedLoader

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    data = {"data_list": []}
    for i in range(48):
        name = f"img_{i}.png"
        h = int(rng.integers(300, 700))
        w = int(rng.integers(300, 700))
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(img_root / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [{"text": f"word{i}",
                             "polygon": [[10, 10], [80, 10], [80, 40], [10, 40]]}],
        })
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(data))

    ds32 = AnyWordSingleLineDataset([(str(json_path), str(img_root))],
                                    resolutions=[512], seed=3)
    ds128 = AnyWordSingleLineDataset([(str(json_path), str(img_root))],
                                     resolutions=[512], seed=3, bucket_quant=128)
    buckets32 = {ds32[i]["bucket"] for i in range(len(ds32))}
    buckets128 = set()
    for i in range(len(ds128)):
        s = ds128[i]
        h, w = s["bucket"]
        assert h % 32 == 0 and w % 32 == 0
        assert (h % 128 == 0) or (w % 128 == 0)  # short side on the lattice
        buckets128.add((h, w))
    assert len(buckets128) < len(buckets32)
    assert len(buckets128) <= 8

    loader = BucketedLoader(ds128, batch_size=8, num_workers=4, seed=0)
    batches = list(loader)
    assert batches, "quantized buckets must fill B=8 batches"
    for b in batches:
        assert b["pixel_values"].shape[1] == 8


def test_bucketed_loader_process_mode(tmp_path, rng):
    """num_procs>0: persistent spawn pool yields the same batches-per-epoch
    as thread mode, survives multiple epochs + a mid-epoch abandonment, and
    close() releases the workers."""
    import functools

    from textflux_tpu.data.loader import BucketedLoader

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    data = {"data_list": []}
    for i in range(12):
        name = f"img_{i}.png"
        Image.fromarray(rng.integers(0, 255, (200, 200, 3), np.uint8)).save(img_root / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [{"text": f"word{i}",
                             "polygon": [[10, 10], [80, 10], [80, 40], [10, 40]]}],
        })
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(data))

    factory = functools.partial(
        AnyWordSingleLineDataset, [(str(json_path), str(img_root))],
        resolutions=[128], seed=5, bucket_quant=128)
    ds = factory()
    thread_batches = list(BucketedLoader(ds, batch_size=2, num_workers=2, seed=0))

    loader = BucketedLoader(ds, batch_size=2, num_procs=2,
                            dataset_factory=factory, seed=0)
    try:
        for _ in range(2):  # persistent pool across epochs
            proc_batches = list(loader)
            assert len(proc_batches) == len(thread_batches)
            b = proc_batches[0]
            assert b["pixel_values"].shape[1] == 2
            assert np.isfinite(b["pixel_values"]).all()
        it = iter(loader)  # mid-epoch abandonment resets the pool cleanly
        next(it)
        it.close()
        assert len(list(loader)) == len(thread_batches)
    finally:
        loader.close()
    assert loader._pool is None


def test_bucketed_loader_dead_worker_raises(tmp_path, rng):
    """A worker process killed mid-epoch (OOM/segfault) loses its replies;
    the loader must raise in the training thread instead of blocking forever
    in sample_q.get() (torch: 'DataLoader worker exited unexpectedly')."""
    import functools
    import time

    from textflux_tpu.data.loader import BucketedLoader

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    data = {"data_list": []}
    for i in range(8):
        name = f"img_{i}.png"
        Image.fromarray(rng.integers(0, 255, (200, 200, 3), np.uint8)).save(img_root / name)
        data["data_list"].append({
            "img_name": name,
            "annotations": [{"text": f"word{i}",
                             "polygon": [[10, 10], [80, 10], [80, 40], [10, 40]]}],
        })
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(data))
    factory = functools.partial(
        AnyWordSingleLineDataset, [(str(json_path), str(img_root))],
        resolutions=[128], seed=5, bucket_quant=128)
    ds = factory()

    loader = BucketedLoader(ds, batch_size=2, num_procs=2,
                            dataset_factory=factory, seed=0,
                            worker_poll_s=0.5)
    try:
        it = iter(loader)
        first = next(it)  # pool is up and producing
        assert np.isfinite(first["pixel_values"]).all()
        for p in loader._pool[2]:
            p.terminate()   # simulate an OOM-killed worker
        with pytest.raises(RuntimeError, match="worker process"):
            deadline = time.time() + 30
            while time.time() < deadline:
                next(it)
    finally:
        loader.close()


def test_proc_workers_get_distinct_rng_streams(tmp_path, rng):
    """Every worker process rebuilds the dataset from the same factory (same
    seed); _reseed_dataset must derive distinct per-worker streams so
    augmentation/resolution draws don't repeat in lockstep across workers."""
    from textflux_tpu.data.loader import _reseed_dataset

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    data = {"data_list": []}
    name = "img_0.png"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(img_root / name)
    data["data_list"].append({
        "img_name": name,
        "annotations": [{"text": "w", "polygon": [[5, 5], [40, 5], [40, 20], [5, 20]]}],
    })
    jp = tmp_path / "d.json"
    jp.write_text(json.dumps(data))

    def make():
        return AnyWordSingleLineDataset([(str(jp), str(img_root))],
                                        resolutions=[128], seed=7)

    a, b, c = make(), make(), make()
    _reseed_dataset(a, 0)
    _reseed_dataset(b, 1)
    _reseed_dataset(c, 0)
    sa = [a.rng.random() for _ in range(4)]
    sb = [b.rng.random() for _ in range(4)]
    sc = [c.rng.random() for _ in range(4)]
    assert sa != sb          # different workers: different streams
    assert sa == sc          # same worker id: deterministic
