"""A/B of chunked-path fused-attention block shapes at the XL canvas
(S=8704, depth 12, W8A8) plus a VMEM-envelope compile check of the
raw-mods flux_apply program (the parity harness's shape) at the candidate.

Context (round 4): the r4 recapture's parity spot at S=8704 OOMed the
16 MiB scoped-VMEM stack by 1.13M — same kernel config (1088/544,
kv_chunk 2176) that fits inside fill.py's mods-precomputed scan body
does NOT fit when flux_apply computes AdaLN mods in-body. Round 3
measured chunked block shapes 544..1088 FLAT (+-0.7%) in-model, so
capping block_q at 544 frees a (544,544) f32 score tile (~1.18M) at
expected-zero cost. This script verifies both halves of that claim
on-chip and in one process.

Run on the target chip: python benchmarks/bench_attn_xl_blocks.py
"""
import gc
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.models.transformer import flux_apply, flux_mods, flux_vec
from textflux_tpu.ops import packing
from textflux_tpu.ops import flash_attention as FA
from textflux_tpu.ops.rope import rope_tables_half
from textflux_tpu.utils.benchmarking import time_step

print("backend:", jax.default_backend())

# 2048x1024 multi-line canvas: (256, 128) latents -> 8192 + 512 = 8704 joint
LAT_H, LAT_W, T_TXT = 256, 128, 512
t_img = (LAT_H // 2) * (LAT_W // 2)
ND, NS = 4, 8
cfg = FluxConfig(num_double_layers=ND, num_single_layers=NS)

from zeroparams import zero_flux_params

ids = np.concatenate([packing.text_ids(T_TXT),
                      packing.latent_image_ids(LAT_H, LAT_W)], 0)
cos, sin = rope_tables_half(ids, cfg.axes_dims_rope, cfg.rope_theta)
cos, sin = jnp.asarray(cos), jnp.asarray(sin)
params = zero_flux_params(cfg, "w8a8")
cond = jnp.zeros((1, t_img, cfg.in_channels - 64), jnp.bfloat16)
txt = jnp.zeros((1, T_TXT, cfg.joint_dim), jnp.bfloat16)
pooled = jnp.zeros((1, cfg.pooled_dim), jnp.bfloat16)
guidance = jnp.full((1,), 30.0, jnp.float32)
vec = flux_vec(params, cfg, jnp.full((1,), 0.5, jnp.bfloat16), guidance,
               pooled, jnp.bfloat16)
mods = flux_mods(params, cfg, vec)

ORIG_FN = FA.flash_attention_qk_norm_rope


def bench(label, block_q=None, block_k=None):
    if block_q is None and block_k is None:
        FA.flash_attention_qk_norm_rope = ORIG_FN
    else:
        def patched(q, k, v, c, s, qs, ks, **kw):
            kw["block_q"], kw["block_k"] = block_q, block_k
            return ORIG_FN(q, k, v, c, s, qs, ks, **kw)
        FA.flash_attention_qk_norm_rope = patched

    def step_fn(params, cond, txt, mods, lat):
        v = flux_apply(params, cfg, jnp.concatenate([lat, cond], -1), txt,
                       pooled, jnp.full((1,), 0.5, jnp.bfloat16), guidance,
                       cos, sin, attn_impl="fused", mods=mods)
        from textflux_tpu.ops import samplers
        return samplers.euler_step(lat, v, 0.5, 0.45)

    jitted = jax.jit(step_fn)
    lat0 = jnp.zeros((1, t_img, 64), jnp.bfloat16)
    t = time_step(lambda lat: jitted(params, cond, txt, mods, lat), lat0,
                  iters_hi=6, iters_lo=2, repeats=2)
    print(f"{label:40s}: {t*1000:8.3f} ms/step (depth {ND}+{NS}, S=8704)",
          flush=True)
    FA.flash_attention_qk_norm_rope = ORIG_FN
    gc.collect()
    return t


def parity_envelope_check(block_q, block_k):
    """Compile+run the raw-mods flux_apply program (mods computed in-body,
    the exact program the r4 parity spot OOMed) with the candidate blocks."""
    def patched(q, k, v, c, s, qs, ks, **kw):
        kw["block_q"], kw["block_k"] = block_q, block_k
        return ORIG_FN(q, k, v, c, s, qs, ks, **kw)
    FA.flash_attention_qk_norm_rope = patched
    try:
        cfg2 = FluxConfig(num_double_layers=2, num_single_layers=2)
        p2 = zero_flux_params(cfg2, False)  # bf16
        img = jnp.zeros((1, t_img, cfg2.in_channels), jnp.bfloat16)
        run = jax.jit(lambda p, lat: flux_apply(
            p, cfg2, lat, txt, pooled, jnp.full((1,), 0.5, jnp.bfloat16),
            guidance, cos, sin, attn_impl="fused"))
        out = np.asarray(run(p2, img), np.float32)
        print(f"raw-mods flux_apply @ ({block_q},{block_k}): compiles+runs, "
              f"finite={np.isfinite(out).all()}", flush=True)
        return True
    except Exception as e:
        print(f"raw-mods flux_apply @ ({block_q},{block_k}): FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        return False
    finally:
        FA.flash_attention_qk_norm_rope = ORIG_FN
        gc.collect()


if __name__ == "__main__":
    bench("auto (1088/544, kv_chunk 2176) [baseline]")
    bench("block 544/544 (cap candidate)", block_q=544, block_k=544)
    bench("auto re-check [baseline]")
    parity_envelope_check(544, 544)
