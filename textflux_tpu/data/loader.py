"""Resolution-bucketed, background-prefetching batch loader.

TPU-first replacement for the reference's torch DataLoader(num_workers=8)
(scripts/train.py:775-780): XLA compiles one program per input shape, so
batches are grouped by (H, W) bucket — a batch never mixes resolutions.

Two prefetch backends (measured on AnyWord samples,
benchmarks/bench_data_pipeline.py — ARCHITECTURE.md "Input pipeline"):
- threads (default): ~50 items/s at B=1 / ~43 at B=4 vs ~31 sequential —
  PIL releases the GIL enough for threads to scale, and this is 10-50x the
  12B step's ~1-4 items/s demand.
- processes (num_procs > 0 + dataset_factory): persistent spawn pool, the
  torch worker-process equivalent. Measured SLOWER than threads at this
  sample size (~30 items/s at B=4; mp.Queue pickling of ~3 MB samples is
  the bound) — kept for CPU-heavier per-item regimes, not the default.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import random
import threading
from collections import defaultdict
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


_SKIP = "__textflux_skip__"


def _reseed_dataset(ds, worker_id: int) -> None:
    """Per-worker RNG derivation: every worker rebuilds the dataset from the
    same factory (same seed), so without this all workers draw IDENTICAL
    augmentation/resolution/annotation sequences in lockstep and samples
    arrive in correlated waves (the torch analogue is per-worker seeding in
    worker_init_fn)."""
    rng = getattr(ds, "rng", None)
    if rng is not None:
        rng.seed((rng.getrandbits(64) << 8) ^ (worker_id + 1))
    for child in getattr(ds, "datasets", ()):
        _reseed_dataset(child, worker_id)


def _proc_worker(factory, idx_q, sample_q, worker_id: int = 0):
    """Worker-process loop: build the dataset ONCE locally, then stream
    samples back forever (persistent across epochs — spawn + font load are
    paid once, not per epoch). Top-level (spawn-picklable); exits on the
    None sentinel or with the parent (daemon). Every index gets exactly one
    reply (sample or skip marker) so the parent can count an epoch out."""
    ds = factory()
    _reseed_dataset(ds, worker_id)
    while True:
        i = idx_q.get()
        if i is None:
            return
        try:
            sample_q.put(ds[i])
        except Exception:
            sample_q.put(_SKIP)


class BucketedLoader:
    """Iterate dict batches with leading (grad_accum, batch) axes, one
    resolution bucket per batch.

    dataset[i] must return {"pixel_values": (H,W,3), "mask": (H,W),
    "prompt": str, "clip_prompt": str, "bucket": (H, W)}.

    With num_procs > 0, `dataset_factory` (a picklable zero-arg callable
    returning the dataset) must be given; sample prep then runs in spawned
    worker processes instead of threads.
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
        num_procs: int = 0,
        dataset_factory: Optional[Callable] = None,
        prefetch: int = 4,
        worker_poll_s: float = 30.0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.grad_accum = grad_accum
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.num_procs = num_procs
        self.dataset_factory = dataset_factory
        if num_procs > 0 and dataset_factory is None:
            raise ValueError("num_procs > 0 requires dataset_factory "
                             "(workers rebuild the dataset in-process)")
        self.prefetch = prefetch
        self.worker_poll_s = worker_poll_s  # dead-worker liveness interval
        self.samples_per_batch = batch_size * grad_accum
        self._pool = None  # persistent process pool (lazy; process mode)
        self._epoch = 0    # folded into the shuffle seed; advanced per epoch

    def set_epoch(self, epoch: int) -> None:
        """Position the shuffle stream (resume support: pass the completed-
        epoch count so a resumed run does not replay epoch 0's order)."""
        self._epoch = int(epoch)

    def _ensure_pool(self):
        if self._pool is None:
            ctx = mp.get_context("spawn")  # fork would clone jax/TPU state
            idx_q = ctx.Queue()
            sample_q = ctx.Queue(
                maxsize=self.prefetch * self.samples_per_batch * 2)
            procs = [ctx.Process(target=_proc_worker,
                                 args=(self.dataset_factory, idx_q, sample_q, wid),
                                 daemon=True)
                     for wid in range(self.num_procs)]
            for p in procs:
                p.start()
            self._pool = (idx_q, sample_q, procs)
        return self._pool

    def close(self):
        """Stop the persistent worker processes (daemons also die with the
        parent; call this to release them early)."""
        if self._pool is not None:
            idx_q, _, procs = self._pool
            for _ in procs:
                idx_q.put(None)
            for p in procs:
                p.join(timeout=2)
                if p.is_alive():
                    p.terminate()
            self._pool = None

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
        # epoch folded into the seed: successive epochs see different orders
        # (a bare seed replayed the SAME permutation every epoch), and
        # set_epoch() lets a resumed run continue the stream instead of
        # restarting at epoch 0
        rng = random.Random(self.seed * 1_000_003 + self._epoch)
        self._epoch += 1
        if self.shuffle:
            rng.shuffle(order)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put_or_stop(q, item):
            """Bounded put that observes `stop`: a consumer that abandons the
            iterator mid-epoch (break out of the loop, exception) must not
            leave the batcher/worker threads blocked forever in put() on a
            full queue — each abandoned epoch would strand daemon threads
            plus a full prefetch queue of decoded samples."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        if self.num_procs > 0:
            idx_q, sample_q, _ = self._ensure_pool()
            for i in order:
                idx_q.put(i)

            procs = self._pool[2]

            def drained(expected=len(order)):
                """Yield exactly one reply per enqueued index (count-based
                epoch end; a persistent pool has no per-epoch sentinels).
                A reply can be lost if its worker dies (OOM kill, segfault):
                poll worker liveness instead of blocking forever — torch's
                DataLoader raises 'worker exited unexpectedly' here too."""
                for _ in range(expected):
                    while True:
                        if stop.is_set():   # consumer abandoned the epoch
                            return
                        try:
                            s = sample_q.get(timeout=self.worker_poll_s)
                            break
                        except queue.Empty:
                            dead = [p for p in procs if not p.is_alive()]
                            if dead:
                                raise RuntimeError(
                                    f"{len(dead)} loader worker process(es) "
                                    f"died (exitcodes "
                                    f"{[p.exitcode for p in dead]}); their "
                                    "replies are lost — fix the worker crash "
                                    "or use thread mode (--loader-procs 0)")
                    if not (isinstance(s, str) and s == _SKIP):
                        yield s
        else:
            idx_q = queue.Queue()
            for i in order:
                idx_q.put(i)
            sample_q = queue.Queue(maxsize=self.prefetch * self.samples_per_batch * 2)

            def worker():
                while not stop.is_set():
                    try:
                        i = idx_q.get_nowait()
                    except queue.Empty:
                        _put_or_stop(sample_q, None)
                        return
                    try:
                        s = self.dataset[i]
                    except Exception:
                        continue
                    if not _put_or_stop(sample_q, s):
                        return

            threads = [threading.Thread(target=worker, daemon=True)
                       for _ in range(self.num_workers)]
            for t in threads:
                t.start()

            def drained(n_workers=self.num_workers):
                finished = 0
                while finished < n_workers and not stop.is_set():
                    try:
                        s = sample_q.get(timeout=0.2)
                    except queue.Empty:
                        continue
                    if s is None:
                        finished += 1
                        continue
                    yield s

        def batcher():
            try:
                buckets: Dict[tuple, List[dict]] = defaultdict(list)
                for s in drained():
                    bucket = buckets[tuple(s["bucket"])]
                    bucket.append(s)
                    if len(bucket) == self.samples_per_batch:
                        if not _put_or_stop(out_q, self._collate(bucket)):
                            return
                        buckets[tuple(s["bucket"])] = []
                # leftovers (per-bucket partials < samples_per_batch) are
                # dropped: batches must be shape-uniform for the jitted step
                # (grad_accum x batch collate), so a smaller tail batch
                # cannot be emitted. The old drop_last=False flag promised
                # otherwise but was a provable no-op (a leftover list never
                # holds a full batch) — removed rather than kept as a lie.
            except BaseException as e:  # forward to the consuming thread
                _put_or_stop(out_q, e)
                return
            _put_or_stop(out_q, None)

        bt = threading.Thread(target=batcher, daemon=True)
        bt.start()
        complete = False
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    complete = True
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            if self.num_procs > 0 and not complete:
                # abandoned mid-epoch: the persistent pool's queues still
                # hold this epoch's replies — reset rather than desync
                self.close()
