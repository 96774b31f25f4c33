"""Serving-config matrix on one TPU chip: full 19+38 DiT step time for
weight-only int8 vs W8A8 at batch 1/4/8 (recorded in ARCHITECTURE.md).

Run on the target chip: python benchmarks/bench_serving_matrix.py
"""
import gc
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.models.transformer import flux_apply
from textflux_tpu.ops import packing, samplers
from textflux_tpu.ops.rope import rope_tables_half
from textflux_tpu.utils.benchmarking import time_step

print("backend:", jax.default_backend())

from zeroparams import zero_flux_params as zero_params  # shared, layout-tested

HEIGHT, WIDTH, T_TXT = 592, 512, 512
lat_h, lat_w = HEIGHT // 8, WIDTH // 8
t_img = (lat_h // 2) * (lat_w // 2)
cfg = FluxConfig()
ids = np.concatenate([packing.text_ids(T_TXT), packing.latent_image_ids(lat_h, lat_w)], 0)
cos, sin = rope_tables_half(ids, cfg.axes_dims_rope, cfg.rope_theta)
cos, sin = jnp.asarray(cos), jnp.asarray(sin)

def bench(mode, batch):
    from textflux_tpu.models.transformer import flux_mods, flux_vec

    params = zero_params(cfg, mode)
    cond = jnp.zeros((batch, t_img, cfg.in_channels - 64), jnp.bfloat16)
    txt = jnp.zeros((batch, T_TXT, cfg.joint_dim), jnp.bfloat16)
    pooled = jnp.zeros((batch, cfg.pooled_dim), jnp.bfloat16)
    guidance = jnp.full((batch,), 30.0, jnp.float32)
    # serving path: AdaLN modulations precomputed for the schedule (fill.py)
    vec = flux_vec(params, cfg, jnp.full((batch,), 0.5, jnp.bfloat16), guidance,
                   pooled, jnp.bfloat16)
    mods = flux_mods(params, cfg, vec)
    def step_fn(params, cond, txt, pooled, guidance, cos, sin, mods, lat):
        v = flux_apply(params, cfg, jnp.concatenate([lat, cond], -1), txt, pooled,
                       jnp.full((batch,), 0.5, jnp.bfloat16), guidance, cos, sin,
                       attn_impl="fused", mods=mods)
        return samplers.euler_step(lat, v, 0.5, 0.45)
    jitted = jax.jit(step_fn)
    lat0 = jnp.zeros((batch, t_img, 64), jnp.bfloat16)
    t = time_step(lambda lat: jitted(params, cond, txt, pooled, guidance, cos, sin, mods, lat),
                  lat0, iters_hi=8, iters_lo=2, repeats=2)
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
