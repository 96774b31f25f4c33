"""Input-pipeline throughput: can the host-side dataset + loader outrun the
training step (QLoRA full-depth = 0.90 steps/s at B=1)?

Builds a synthetic AnyWord-format dataset on disk (PNG scenes + polygon
annotations), then measures items/s through the full per-item path (PIL
decode, glyph strip render, polygon mask rasterize + dilate/erode augment,
vstack, //32 snap, normalize) and batches/s through BucketedLoader's
prefetching worker pool.

Run anywhere (host-side only): python benchmarks/bench_data_pipeline.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from textflux_tpu.data.dataset import AnyWordSingleLineDataset
from textflux_tpu.data.loader import BucketedLoader

N_IMAGES = 64


def build_dataset(root: str) -> str:
    imgs = os.path.join(root, "imgs")
    os.makedirs(imgs, exist_ok=True)
    rng = np.random.default_rng(0)
    items = []
    for i in range(N_IMAGES):
        h, w = int(rng.integers(320, 640)), int(rng.integers(320, 640))
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img_{i:04d}.png"
        Image.fromarray(arr).save(os.path.join(imgs, name))
        x0, y0 = int(rng.integers(10, w // 2)), int(rng.integers(10, h // 2))
        poly = [[x0, y0], [x0 + 80, y0], [x0 + 80, y0 + 28], [x0, y0 + 28]]
        items.append({"img_name": name,
                      "annotations": [{"text": f"WORD{i}", "polygon": poly,
                                       "valid": True}]})
    jp = os.path.join(root, "data.json")
    with open(jp, "w") as f:
        json.dump({"data_list": items}, f)
    return jp, imgs


def main():
    with tempfile.TemporaryDirectory() as root:
        jp, imgs = build_dataset(root)
        ds = AnyWordSingleLineDataset([(jp, imgs)], seed=0)

        # per-item cost (sequential, includes all host-side work)
        for i in range(4):   # warm caches (font load, lib build)
            ds[i % len(ds)]
        t0 = time.perf_counter()
        n = 128
        for i in range(n):
            ds[i % len(ds)]
        dt = time.perf_counter() - t0
        print(f"sequential per-item: {dt/n*1e3:.1f} ms -> {n/dt:.1f} items/s")

        # prefetching loader throughput at the trainer's batch sizes.
        # B>1 pins one resolution + bucket_quant=128: without the quantized
        # aspect lattice, arbitrary-aspect samples scatter across (H, W)
        # buckets and B>1 batches never fill on small datasets (the trainer
        # CLI applies the same bucket_quant default)
        import functools
        factory = functools.partial(AnyWordSingleLineDataset, [(jp, imgs)],
                                    resolutions=[512], seed=0,
                                    bucket_quant=128)
        ds512 = factory()

        def measure(loader, label, epochs=3):
            n = sum(1 for _ in loader)      # warm epoch (pool spin-up)
            t0 = time.perf_counter()
            tot = sum(sum(1 for _ in loader) for _ in range(epochs))
            dt = time.perf_counter() - t0
            bs = loader.batch_size
            print(f"{label}: {tot/dt:.1f} batches/s = {tot*bs/dt:.1f} items/s"
                  f" ({n} batches/epoch of {len(ds512)} items)")

        for bs, workers in [(1, 4), (4, 8)]:
            measure(BucketedLoader(ds512, batch_size=bs, num_workers=workers,
                                   seed=0),
                    f"loader B={bs} threads={workers}")
        loader = BucketedLoader(ds512, batch_size=4, num_procs=8,
                                dataset_factory=factory, seed=0)
        measure(loader, "loader B=4 procs=8 (persistent)")
        loader.close()


if __name__ == "__main__":
    main()
