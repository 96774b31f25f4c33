"""Quantization quality table: per-leaf-group NF4 sensitivity, per-evaluation
velocity error per mode, and END-TO-END 8-step Euler latent divergence — the
data behind ARCHITECTURE.md's quality tables and the MIXED_INT8_NAMES policy
(io/quantize.py).

Full FLUX width (hidden 3072, 24 heads x 128), realistic init-scale weights.
Runs on CPU or TPU: python benchmarks/bench_quant_quality.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.io.quantize import quantize_dense, quantize_tree, quantized_bytes
from textflux_tpu.models.transformer import flux_apply, init_flux_params
from textflux_tpu.ops import packing, samplers
from textflux_tpu.ops.rope import rope_tables

T_TXT, LAT_H, LAT_W = 32, 16, 32
T_IMG = (LAT_H // 2) * (LAT_W // 2)


def make_inputs(cfg, rng):
    ids = np.concatenate([packing.text_ids(T_TXT),
                          packing.latent_image_ids(LAT_H, LAT_W)], 0)
    cos, sin = rope_tables(ids, cfg.axes_dims_rope, cfg.rope_theta)
    img = jnp.asarray(rng.standard_normal((1, T_IMG, cfg.in_channels)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, T_TXT, cfg.joint_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.bfloat16)
    return (img, txt, pooled, jnp.array([0.5], jnp.bfloat16),
            jnp.array([30.0], jnp.float32), jnp.asarray(cos), jnp.asarray(sin))


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def quantize_only(params, names, mode):
    """Quantize only dense leaves whose path contains one of `names`."""

    def rec(node, path=()):
        if isinstance(node, dict) and "w" in node and node["w"].ndim >= 2:
            if any(n in path for n in names):
                return quantize_dense(node, mode)
            return node
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    return rec(params)


def sensitivity_table():
    """NF4 applied to ONE leaf group at a time (1 double + 1 single, full
    width): which weights does 4-bit hurt?"""
    cfg = FluxConfig(num_double_layers=1, num_single_layers=1)
    rng = np.random.default_rng(0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_flux_params(jax.random.PRNGKey(0), cfg))
    args = make_inputs(cfg, rng)
    apply = jax.jit(lambda p, *a: flux_apply(p, cfg, *a, attn_impl="xla"))
    ref = apply(params, *args)

    groups = [
        ("double qkv", ("img_qkv", "txt_qkv")),
        ("double proj", ("img_proj", "txt_proj")),
        ("double mlp", ("img_mlp", "txt_mlp")),
        ("double mods", ("img_mod", "txt_mod")),
        ("single linear1", ("linear1",)),
        ("single linear2", ("linear2",)),
        ("single mod", ("mod",)),
        ("final mod+proj", ("final_mod", "final_proj")),
        ("embedders", ("img_in", "txt_in", "time_in", "vector_in", "guidance_in")),
    ]
    print("== NF4 sensitivity (one group at a time, velocity rel err vs bf16) ==")
    rows = []
    for label, names in groups:
        out = apply(quantize_only(params, names, "nf4"), *args)
        e = rel_err(out, ref)
        rows.append((label, e))
        print(f"  {label:18s}: {100*e:6.2f}%")
    return rows


def config_table():
    """Per-evaluation velocity error per serving mode (2 double + 2 single,
    full width) + packed sizes extrapolated to the 12B DiT."""
    cfg = FluxConfig(num_double_layers=2, num_single_layers=2)
    rng = np.random.default_rng(1)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_flux_params(jax.random.PRNGKey(0), cfg))
    args = make_inputs(cfg, rng)
    apply = jax.jit(lambda p, *a: flux_apply(p, cfg, *a, attn_impl="xla"))
    ref = apply(params, *args)
    bf16_bytes = quantized_bytes(params)

    modes = [("int8 weight-only", dict(mode="weight_only")),
             ("w8a8", dict(mode="w8a8")),
             ("nf4", dict(mode="nf4")),
             ("nf4 + double-quant", dict(mode="nf4", double_quant=True)),
             ("mixed (io-boundary int8, rest nf4)", dict(mode="mixed")),
             ("mixed + double-quant", dict(mode="mixed", double_quant=True))]
    print("== per-evaluation velocity error & size (2+2 full width) ==")
    out_rows = []
    for label, kw in modes:
        q = quantize_tree(params, **kw)
        e = rel_err(apply(q, *args), ref)
        frac = quantized_bytes(q) / bf16_bytes
        out_rows.append((label, e, frac))
        print(f"  {label:28s}: {100*e:6.2f}%   size {frac:4.2f}x bf16 "
              f"(~{22.2*frac:4.1f} GiB on 12B)")
    return out_rows


def e2e_latent_divergence(steps=8):
    """END-TO-END: run an 8-step Euler denoise (2+2 full width, fixed noise)
    with the quantized vs the bf16 stack; relative L2 of the final latents.
    Per-step velocity errors partially cancel through the integration — this
    is the number that predicts image quality (the int8 table's E2E row)."""
    cfg = FluxConfig(num_double_layers=2, num_single_layers=2)
    rng = np.random.default_rng(2)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_flux_params(jax.random.PRNGKey(0), cfg))
    ids = np.concatenate([packing.text_ids(T_TXT),
                          packing.latent_image_ids(LAT_H, LAT_W)], 0)
    cos, sin = rope_tables(ids, cfg.axes_dims_rope, cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    cond = jnp.asarray(rng.standard_normal((1, T_IMG, cfg.in_channels - 64)),
                       jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, T_TXT, cfg.joint_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.bfloat16)
    guidance = jnp.full((1,), 30.0, jnp.float32)
    lat0 = jnp.asarray(rng.standard_normal((1, T_IMG, 64)), jnp.bfloat16)
    sigmas = samplers.make_schedule(steps, T_IMG)

    def run(p):
        def step(lat, xs):
            sigma, sigma_next = xs
            v = flux_apply(p, cfg, jnp.concatenate([lat, cond], -1), txt,
                           pooled, jnp.full((1,), sigma, lat.dtype), guidance,
                           cos, sin, attn_impl="xla")
            return samplers.euler_step(lat, v, sigma, sigma_next), None

        lat, _ = jax.lax.scan(step, lat0, (jnp.asarray(sigmas[:-1]),
                                           jnp.asarray(sigmas[1:])))
        return lat

    runj = jax.jit(run)
    ref = runj(params)
    print(f"== E2E {steps}-step Euler latent divergence (2+2 full width) ==")
    for label, kw in [("int8 weight-only", dict(mode="weight_only")),
                      ("w8a8", dict(mode="w8a8")),
                      ("nf4", dict(mode="nf4")),
                      ("nf4 + double-quant", dict(mode="nf4", double_quant=True)),
                      ("mixed", dict(mode="mixed")),
                      ("mixed + double-quant", dict(mode="mixed", double_quant=True))]:
        e = rel_err(runj(quantize_tree(params, **kw)), ref)
        print(f"  {label:28s}: {100*e:6.2f}%")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    sensitivity_table()
    config_table()
    e2e_latent_divergence()
