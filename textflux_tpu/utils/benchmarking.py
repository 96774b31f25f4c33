"""Reliable on-device timing.

The tunneled TPU (axon) resolves ``block_until_ready`` before execution truly
finishes, so naive timing lies. The slope method chains data-dependent
iterations and forces a scalar host read at the end; the per-iteration time is
the slope between two iteration counts, cancelling the tunnel round-trip.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import jax.numpy as jnp


def _run_chained(step: Callable, x0, iters: int) -> float:
    import jax

    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    leaves = jax.tree.leaves(x)
    _ = np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))
    return time.perf_counter() - t0


def time_step(step: Callable, x0, *, iters_hi: int = 12, iters_lo: int = 3,
              repeats: int = 3) -> float:
    """Seconds per iteration of ``x = step(x)`` (x may be a pytree leaf).

    step must be data-dependent on its input (the output feeds the next call)
    so the device cannot elide or overlap iterations.
    """
    _run_chained(step, x0, 1)  # warmup / compile
    slopes = []
    for _ in range(repeats):
        t_hi = _run_chained(step, x0, iters_hi)
        t_lo = _run_chained(step, x0, iters_lo)
        slopes.append((t_hi - t_lo) / (iters_hi - iters_lo))
    # a big service hiccup in an iters_lo run makes its slope NEGATIVE (an
    # early min() over raw slopes locked onto the clamp and reported
    # 1 ns/step, silently winning every A/B). Keep only positive slopes;
    # if every repeat was corrupted, fail loudly rather than return garbage.
    good = [s for s in slopes if s > 0]
    if not good:
        raise RuntimeError(
            f"time_step: all {repeats} repeats measured non-positive slopes "
            f"{slopes} — tunnel interference (see CLAUDE.md); re-run")
    # min, deliberately, not median: at the repeats=2 the benchmarks use, a
    # median cannot reject anything — one hiccup-INFLATED repeat drags it up
    # by half the hiccup (observed on-chip: the 4.4 ms mods-precompute
    # measurement read 43 ms under a median). Hiccup exposure is
    # proportional to wall time, so corruption overwhelmingly lands in the
    # long iters_hi runs and inflates; min() is robust exactly to that
    # side. The residual blind spot — a hiccup small enough to deflate an
    # iters_lo slope while keeping it positive — is narrow
    # (< true_t*(iters_hi-iters_lo) landing inside the short run) and is
    # bounded by the positive filter above.
    return min(good)
