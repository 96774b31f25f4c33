"""Same-process decomposition of the serving step's attention cost: run the
depth-12 W8A8 step with (a) the fused kernel, (b) attention stubbed to
identity (returns v — same shapes, zero attention work), (c) the unfused
pallas kernel, (d) XLA attention. (a)-(b) is the attention's NET step cost
including everything XLA can't overlap; comparing (a)/(c)/(d) ranks the
implementations at the serving shape.

Run on the target chip: python benchmarks/bench_attn_decompose.py
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
from textflux_tpu.ops import attention as ATT
from textflux_tpu.ops.rope import rope_tables_half, rope_tables
from textflux_tpu.utils.benchmarking import time_step

print("backend:", jax.default_backend())

HEIGHT, WIDTH, T_TXT = 592, 512, 512
lat_h, lat_w = HEIGHT // 8, WIDTH // 8
t_img = (lat_h // 2) * (lat_w // 2)
ND, NS = 4, 8
cfg = FluxConfig(num_double_layers=ND, num_single_layers=NS)


from zeroparams import zero_flux_params  # shared, layout-tested builder

params = zero_flux_params(cfg, "w8a8")
cond = jnp.zeros((1, t_img, cfg.in_channels - 64), jnp.bfloat16)
txt = jnp.zeros((1, T_TXT, cfg.joint_dim), jnp.bfloat16)
pooled = jnp.zeros((1, cfg.pooled_dim), jnp.bfloat16)
guidance = jnp.full((1,), 30.0, jnp.float32)
vec = flux_vec(params, cfg, jnp.full((1,), 0.5, jnp.bfloat16), guidance, pooled, jnp.bfloat16)
mods = flux_mods(params, cfg, vec)

ORIG_FUSED = FA.flash_attention_qk_norm_rope
ORIG_DPA = ATT.dot_product_attention


def bench(label, attn_impl="fused", identity=False):
    if identity:
        FA.flash_attention_qk_norm_rope = lambda q, k, v, *a, **kw: v
        ATT.dot_product_attention = lambda q, k, v, **kw: v

    ids = np.concatenate([packing.text_ids(T_TXT), packing.latent_image_ids(lat_h, lat_w)], 0)
    table_fn = rope_tables_half if attn_impl == "fused" else rope_tables
    cos, sin = table_fn(ids, cfg.axes_dims_rope, cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    def step_fn(params, cond, txt, mods, lat):
        v = flux_apply(params, cfg, jnp.concatenate([lat, cond], -1), txt, pooled,
                       jnp.full((1,), 0.5, jnp.bfloat16), guidance, cos, sin,
                       attn_impl=attn_impl, mods=mods)
        from textflux_tpu.ops import samplers
        return samplers.euler_step(lat, v, 0.5, 0.45)

    jitted = jax.jit(step_fn)
    lat0 = jnp.zeros((1, t_img, 64), jnp.bfloat16)
    t = time_step(lambda lat: jitted(params, cond, txt, mods, lat), lat0,
                  iters_hi=10, iters_lo=2, repeats=2)
    print(f"{label:44s}: {t*1000:8.3f} ms/step (depth {ND}+{NS})")
    FA.flash_attention_qk_norm_rope = ORIG_FUSED
    ATT.dot_product_attention = ORIG_DPA
    gc.collect()
    return t


if __name__ == "__main__":
    t_fused = bench("fused norm+rope+flash [serving config]")
    t_id = bench("attention = identity (floor)", identity=True)
    t_pallas = bench("unfused pallas flash", attn_impl="pallas")
    t_xla = bench("xla attention", attn_impl="xla")
    t_fused2 = bench("fused re-check")
    n_attn = ND + NS
    print(f"\nattention net step cost (fused - identity): "
          f"{(t_fused - t_id)*1e3:.2f} ms / {n_attn} calls "
          f"= {(t_fused - t_id)/n_attn*1e3:.3f} ms/call")
    flops_call = 4 * (T_TXT + t_img) ** 2 * cfg.head_dim * cfg.num_heads
    sol = flops_call / 197e12
    print(f"bf16 compute SOL per call: {sol*1e3:.3f} ms -> ratio "
          f"{(t_fused - t_id)/n_attn/sol:.2f}x")
