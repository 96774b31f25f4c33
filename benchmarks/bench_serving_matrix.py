"""Serving-config matrix on one TPU chip: full 19+38 DiT step time for
weight-only int8 vs W8A8 at batch 1/4/8 (recorded in ARCHITECTURE.md).

Run on the target chip: python benchmarks/bench_serving_matrix.py
"""
import gc
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

from textflux_tpu.config import FluxConfig

print("backend:", jax.default_backend())

from zeroparams import zero_flux_params as zero_params  # shared, layout-tested

# THE serving-step harness lives in bench.py (_bench_step) — imported, not
# copied: a local copy silently drifted from the measured serving program
# once before (zeroparams.py docstring records the same failure mode for
# the params builder; the mods-precompute change was worth 5.1 ms/step).
from bench import _bench_step

HEIGHT, WIDTH, T_TXT = 592, 512, 512
lat_h, lat_w = HEIGHT // 8, WIDTH // 8
t_img = (lat_h // 2) * (lat_w // 2)
cfg = FluxConfig()

def bench(mode, batch):
    params = zero_params(cfg, mode)
    t = _bench_step(cfg, params, t_img, T_TXT, "fused", batch=batch,
                    height=HEIGHT, width=WIDTH)
    del params
    gc.collect()
    return t

# --spot: B=1 rows only (the recapture harness's quick pass)
SPOT = "--spot" in sys.argv
for mode in ("weight_only", "w8a8", "nf4", "mixed"):
    for batch in ((1,) if (SPOT or mode in ("nf4", "mixed")) else (1, 4, 8)):
        try:
            t = bench(mode, batch)
            print(f"mode={mode:12s} B={batch}: step={t*1000:8.2f} ms  per-img={t*1000/batch:8.2f} ms  30-step s/img={30*t/batch:6.3f}")
        except Exception as e:
            print(f"mode={mode:12s} B={batch}: FAILED {type(e).__name__}: {str(e)[:200]}")
