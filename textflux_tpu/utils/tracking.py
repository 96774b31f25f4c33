"""Experiment tracking + profiling.

The reference logs {loss, lr} per step to wandb (mirrored to SwanLab,
scripts/train.py:32-33,1089-1091) and has no first-party profiler. Here:
a tracker facade that writes JSONL always and forwards to wandb when it is
installed and requested, plus jax.profiler trace helpers for TPU timelines.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class Tracker:
    """JSONL-first metric tracker with optional wandb forwarding."""

    def __init__(self, log_dir: str, *, project: Optional[str] = None,
                 run_name: Optional[str] = None, use_wandb: bool = False,
                 config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project or "textflux-tpu",
                                         name=run_name, config=config or {})
            except Exception as e:  # wandb genuinely optional
                print(f"wandb unavailable ({e}); logging to JSONL only")

    def log(self, metrics: Dict, step: int) -> None:
        entry = {"step": step, "time": time.time(), **{
            k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: full-width DiT compiles take minutes
    on TPU — cache them across processes (serving restarts, eval re-runs)."""
    import jax

    path = path or os.environ.get(
        "TEXTFLUX_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "textflux_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@contextlib.contextmanager
def profile_trace(log_dir: str, *, enabled: bool = True):
    """Capture a jax.profiler trace (view with tensorboard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
