"""Resolution-bucketed, background-prefetching batch loader.

TPU-first replacement for the reference's torch DataLoader(num_workers=8)
(scripts/train.py:775-780): XLA compiles one program per input shape, so
batches are grouped by (H, W) bucket — a batch never mixes resolutions — and a
thread pool keeps decode/render work off the accelerator-feeding thread.
"""

from __future__ import annotations

import queue
import random
import threading
from collections import defaultdict
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


class BucketedLoader:
    """Iterate dict batches with leading (grad_accum, batch) axes, one
    resolution bucket per batch.

    dataset[i] must return {"pixel_values": (H,W,3), "mask": (H,W),
    "prompt": str, "clip_prompt": str, "bucket": (H, W)}.
    """

    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 1,
        grad_accum: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.grad_accum = grad_accum
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.samples_per_batch = batch_size * grad_accum

    def _collate(self, samples: List[dict]) -> dict:
        a, b = self.grad_accum, self.batch_size
        pixels = np.stack([s["pixel_values"] for s in samples])
        masks = np.stack([s["mask"] for s in samples])
        return {
            "pixel_values": pixels.reshape(a, b, *pixels.shape[1:]),
            "mask": masks.reshape(a, b, *masks.shape[1:]),
            "prompts": [s["prompt"] for s in samples],
            "clip_prompts": [s["clip_prompt"] for s in samples],
            "bucket": samples[0]["bucket"],
        }

    def __iter__(self) -> Iterator[dict]:
        order = list(range(len(self.dataset)))
        rng = random.Random(self.seed)
        if self.shuffle:
            rng.shuffle(order)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        for i in order:
            idx_q.put(i)
        stop = threading.Event()
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.samples_per_batch * 2)

        def worker():
            while not stop.is_set():
                try:
                    i = idx_q.get_nowait()
                except queue.Empty:
                    sample_q.put(None)
                    return
                try:
                    sample_q.put(self.dataset[i])
                except Exception:
                    continue

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        def batcher():
            buckets: Dict[tuple, List[dict]] = defaultdict(list)
            finished_workers = 0
            while finished_workers < self.num_workers:
                s = sample_q.get()
                if s is None:
                    finished_workers += 1
                    continue
                bucket = buckets[s["bucket"]]
                bucket.append(s)
                if len(bucket) == self.samples_per_batch:
                    out_q.put(self._collate(bucket))
                    buckets[s["bucket"]] = []
            if not self.drop_last:
                for leftover in buckets.values():
                    while leftover:
                        take = leftover[: self.samples_per_batch]
                        del leftover[: self.samples_per_batch]
                        if len(take) == self.samples_per_batch:
                            out_q.put(self._collate(take))
            out_q.put(None)

        bt = threading.Thread(target=batcher, daemon=True)
        bt.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
