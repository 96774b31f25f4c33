"""Step-level A/B of fused-attention scheduling variants at the serving shape
(full width, depth 12, W8A8, S=1696, B=1) — the VERDICT-r2 "attention ~3x off
SOL" lever. Same-process comparisons only (cross-process tunnel variance ~25%).

Run on the target chip: python benchmarks/bench_attn_variants.py
"""
import gc
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.models.transformer import flux_apply, flux_mods, flux_vec, init_flux_params
from textflux_tpu.ops import packing
from textflux_tpu.ops import flash_attention as FA
from textflux_tpu.ops.rope import rope_tables_half
from textflux_tpu.utils.benchmarking import time_step

print("backend:", jax.default_backend())

HEIGHT, WIDTH, T_TXT = 592, 512, 512
lat_h, lat_w = HEIGHT // 8, WIDTH // 8
t_img = (lat_h // 2) * (lat_w // 2)
ND, NS = 4, 8   # depth 12: step-level signal without the full 10+ GiB model
cfg = FluxConfig(num_double_layers=ND, num_single_layers=NS)


from zeroparams import zero_flux_params  # shared, layout-tested builder

ids = np.concatenate([packing.text_ids(T_TXT), packing.latent_image_ids(lat_h, lat_w)], 0)
cos, sin = rope_tables_half(ids, cfg.axes_dims_rope, cfg.rope_theta)
cos, sin = jnp.asarray(cos), jnp.asarray(sin)
params = zero_flux_params(cfg, "w8a8")
cond = jnp.zeros((1, t_img, cfg.in_channels - 64), jnp.bfloat16)
txt = jnp.zeros((1, T_TXT, cfg.joint_dim), jnp.bfloat16)
pooled = jnp.zeros((1, cfg.pooled_dim), jnp.bfloat16)
guidance = jnp.full((1,), 30.0, jnp.float32)
vec = flux_vec(params, cfg, jnp.full((1,), 0.5, jnp.bfloat16), guidance, pooled, jnp.bfloat16)
mods = flux_mods(params, cfg, vec)

ORIG_FN = FA.flash_attention_qk_norm_rope


def bench(label, block_q=None, block_k=None, hoist_k=None, q_rows=None):
    # the model imports the kernel from the module at call time, so patching
    # the module attribute reroutes every block's attention call
    if block_q is None and block_k is None and hoist_k is None and q_rows is None:
        FA.flash_attention_qk_norm_rope = ORIG_FN
    else:
        def patched(q, k, v, cos, sin, qs, ks, **kw):
            if block_q is not None:
                kw["block_q"] = block_q
            if block_k is not None:
                kw["block_k"] = block_k
            if hoist_k is not None:
                kw["hoist_k"] = hoist_k
            if q_rows is not None:
                kw["q_rows"] = q_rows
            return ORIG_FN(q, k, v, cos, sin, qs, ks, **kw)

        FA.flash_attention_qk_norm_rope = patched

    def step_fn(params, cond, txt, mods, lat):
        v = flux_apply(params, cfg, jnp.concatenate([lat, cond], -1), txt, pooled,
                       jnp.full((1,), 0.5, jnp.bfloat16), guidance, cos, sin,
                       attn_impl="fused", mods=mods)
        from textflux_tpu.ops import samplers
        return samplers.euler_step(lat, v, 0.5, 0.45)

    jitted = jax.jit(step_fn)
    lat0 = jnp.zeros((1, t_img, 64), jnp.bfloat16)
    t = time_step(lambda lat: jitted(params, cond, txt, mods, lat), lat0,
                  iters_hi=10, iters_lo=2, repeats=2)
    print(f"{label:48s}: {t*1000:8.3f} ms/step (depth {ND}+{NS})")
    FA.flash_attention_qk_norm_rope = ORIG_FN
    gc.collect()
    return t


if __name__ == "__main__":
    bench("auto (848/848 exact-fit, hoisted K) [baseline]")
    # the round-3 block sweep ((848,1696)...(848,212), hoist off) measured
    # flat-to-worse and is recorded in ARCHITECTURE.md — not re-run here;
    # re-enable rows from git history if the kernel structure changes.
    if os.environ.get("ATTN_AB_FULL_SWEEP"):
        for bq, bk in ((848, 1696), (1696, 1696), (1696, 848), (1696, 424),
                       (848, 424), (424, 424), (1696, 212), (848, 212)):
            try:
                bench(f"block_q={bq} block_k={bk}", block_q=bq, block_k=bk)
            except Exception as e:
                print(f"block_q={bq} block_k={bk}: FAILED {type(e).__name__}: {str(e)[:120]}")
        bench("auto, hoist off", hoist_k=False)
    # round-4 measured non-win (VERDICT item 8): q_rows>1 — multiple
    # independent softmax chains per program sharing the K prep (cross-row
    # MXU/VPU overlap). Measured on-chip 2026-08-18: q_rows=2 at 424-row
    # blocks 20.5-20.7 ms vs 19.9-20.1 baseline (~3% LOSS); 848-row and
    # q_rows>=4 variants fail to compile (Mosaic). The kernel-side
    # implementation lives in git history at this commit's parent.
    bench("auto re-check [baseline]")
