"""Measure the TP-8 per-shard serving step on ONE real chip (VERDICT r4 item 1).

The v5e-8 latency budget's compute rows were projections: "DiT matmuls
~73 ms / 8 = 9.1 ms" and "attention ~22.6 / 8 = 2.8 ms". This benchmark
retires the divide-by-8: it builds the EXACT per-shard program one of 8
chips executes under the TP fast path (models/transformer.py tp>1 +
parallel/partitioning.py) and slope-times it at FULL depth (19+38 blocks)
on the single v5e:

  - fused projections in device-major column shards: img/txt qkv
    (3072 -> 3*384), single linear1 (3072 -> 2688 = [384|384|384|1536]);
  - attention head-parallel: heads/8 = 3 heads through the SAME fused
    Pallas kernel (flash_attention_qk_norm_rope) shard_map issues per chip;
  - row-parallel projections at local in-dims: proj (384 -> 3072),
    fc2 (1536 -> 3072), linear2 (1920 -> 3072);
  - W8A8 everywhere the single-chip serving config quantizes;
  - AdaLN mods PRECOMPUTED (fill.py serving schedule), embedders + final
    projection replicated (they are replicated on every chip).

What is deliberately omitted: the inter-chip collectives (3 all-reduce per
double body, 1 per single — HLO-audited at 635 MiB/step by
benchmarks/audit_collectives.py, ~6.5 ms at 180 GB/s ICI). The residual
streams therefore carry PARTIAL sums — numerically meaningless, timing-
equivalent (identical matmul shapes and dataflow).

Tunnel-timing rules honored (CLAUDE.md): chained data-dependent iterations
(euler_step feeds the latent back), params as jit arguments, slope between
two chain lengths, plus a chain-length-invariance selfcheck.

Usage: python benchmarks/bench_tp_shard.py [--tp 8] [--selfcheck]
Writes TP_SHARD_r5.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.models.layers import dense, gelu_tanh, layer_norm
from textflux_tpu.ops import packing, samplers
from textflux_tpu.ops.rope import rope_tables_half
from textflux_tpu.utils.benchmarking import time_step

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 512px single-line serving config (the budget's row): 74x64 latent grid
LAT_H, LAT_W = 74, 64
T_TXT = 512
T_IMG = (LAT_H // 2) * (LAT_W // 2)   # 1184
SEQ = T_TXT + T_IMG                   # 1696


def _w8a8(lead, din, dout, *, bias=True):
    q = {"w_q8a8": jnp.zeros((*lead, din, dout), jnp.int8),
         "scale": jnp.full((*lead, dout), 1e-2, jnp.float32)}
    if bias:
        q["b"] = jnp.zeros((*lead, dout), jnp.bfloat16)
    return q


def shard_params(cfg: FluxConfig, tp: int):
    """Per-shard stacked weight tree, device-major column shards (what
    tp_permute_flux_params + GSPMD hand each chip), W8A8 layout."""
    d, m = cfg.hidden_dim, cfg.mlp_dim
    dl, ml = d // tp, m // tp
    n_d, n_s = cfg.num_double_layers, cfg.num_single_layers
    ones = lambda *s: jnp.ones(s, jnp.float32)
    return {
        "img_in": _w8a8((), cfg.in_channels, d),
        "txt_in": _w8a8((), cfg.joint_dim, d),
        "final_proj": _w8a8((), d, cfg.out_channels),
        "double": {
            "img_qkv": _w8a8((n_d,), d, 3 * dl),
            "txt_qkv": _w8a8((n_d,), d, 3 * dl),
            "img_proj": _w8a8((n_d,), dl, d),
            "txt_proj": _w8a8((n_d,), dl, d),
            "img_fc1": _w8a8((n_d,), d, ml),
            "img_fc2": _w8a8((n_d,), ml, d),
            "txt_fc1": _w8a8((n_d,), d, ml),
            "txt_fc2": _w8a8((n_d,), ml, d),
            "img_q_scale": ones(n_d, cfg.head_dim),
            "img_k_scale": ones(n_d, cfg.head_dim),
            "txt_q_scale": ones(n_d, cfg.head_dim),
            "txt_k_scale": ones(n_d, cfg.head_dim),
        },
        "single": {
            "linear1": _w8a8((n_s,), d, 3 * dl + ml),
            "linear2": _w8a8((n_s,), dl + ml, d),
            "q_scale": ones(n_s, cfg.head_dim),
            "k_scale": ones(n_s, cfg.head_dim),
        },
    }


def make_step(cfg: FluxConfig, tp: int):
    """One denoise step of the per-shard program (see module docstring)."""
    from textflux_tpu.ops.flash_attention import flash_attention_qk_norm_rope

    d, m, hd = cfg.hidden_dim, cfg.mlp_dim, cfg.head_dim
    dl, ml = d // tp, m // tp
    h_loc = cfg.num_heads // tp

    def modulate(x, shift, scale):
        return layer_norm(x) * (1.0 + scale[:, None]) + shift[:, None]

    def heads(x):
        b, s, _ = x.shape
        return x.reshape(b, s, h_loc, hd)

    def attn(q, k, v, cos, sin, qs, ks):
        out = flash_attention_qk_norm_rope(q, k, v, cos, sin, qs, ks,
                                           kv_len=SEQ)
        return out.reshape(out.shape[0], out.shape[1], -1)

    def dbl_body(carry, layer):
        txt, img = carry
        p, im_mod, tx_mod = layer
        (i_s1, i_c1, i_g1, i_s2, i_c2, i_g2) = jnp.split(im_mod, 6, -1)
        (t_s1, t_c1, t_g1, t_s2, t_c2, t_g2) = jnp.split(tx_mod, 6, -1)
        img_n = modulate(img, i_s1, i_c1)
        txt_n = modulate(txt, t_s1, t_c1)
        iq, ik, iv = jnp.split(dense(p["img_qkv"], img_n), 3, -1)
        tq, tk, tv = jnp.split(dense(p["txt_qkv"], txt_n), 3, -1)
        q = heads(jnp.concatenate([tq, iq], 1))
        k = heads(jnp.concatenate([tk, ik], 1))
        v = heads(jnp.concatenate([tv, iv], 1))
        qs = jnp.concatenate([
            jnp.broadcast_to(p["txt_q_scale"][None], (T_TXT, hd)),
            jnp.broadcast_to(p["img_q_scale"][None], (T_IMG, hd))])
        ks = jnp.concatenate([
            jnp.broadcast_to(p["txt_k_scale"][None], (T_TXT, hd)),
            jnp.broadcast_to(p["img_k_scale"][None], (T_IMG, hd))])
        out = attn(q, k, v, cos_t, sin_t, qs, ks)
        txt_a, img_a = out[:, :T_TXT], out[:, T_TXT:]
        # row-parallel projections: the cross-chip all-reduce is omitted
        # (bytes audited separately) — residuals carry partial sums
        img = img + i_g1[:, None] * dense(p["img_proj"], img_a)
        img = img + i_g2[:, None] * dense(
            p["img_fc2"], gelu_tanh(dense(p["img_fc1"],
                                          modulate(img, i_s2, i_c2))))
        txt = txt + t_g1[:, None] * dense(p["txt_proj"], txt_a)
        txt = txt + t_g2[:, None] * dense(
            p["txt_fc2"], gelu_tanh(dense(p["txt_fc1"],
                                          modulate(txt, t_s2, t_c2))))
        return (txt, img), None

    def sgl_body(z, layer):
        p, mod = layer
        shift, scale, gate = jnp.split(mod, 3, -1)
        z_n = modulate(z, shift, scale)
        fused = dense(p["linear1"], z_n)
        q, k, v, mlp = jnp.split(fused, [dl, 2 * dl, 3 * dl], -1)
        qs = jnp.broadcast_to(p["q_scale"][None], (SEQ, hd))
        ks = jnp.broadcast_to(p["k_scale"][None], (SEQ, hd))
        a = attn(heads(q), heads(k), heads(v), cos_t, sin_t, qs, ks)
        y = jnp.concatenate([a, gelu_tanh(mlp)], -1)
        return z + gate[:, None] * dense(p["linear2"], y), None

    ids = np.concatenate([packing.text_ids(T_TXT),
                          packing.latent_image_ids(LAT_H, LAT_W)], 0)
    cos_t, sin_t = (jnp.asarray(a) for a in
                    rope_tables_half(ids, cfg.axes_dims_rope, cfg.rope_theta))

    def step(params, cond, txt_emb, mods, lat):
        x = dense(params["img_in"], jnp.concatenate([lat, cond], -1))
        txt = dense(params["txt_in"], txt_emb)
        (txt, img), _ = jax.lax.scan(
            dbl_body, (txt, x),
            (params["double"], mods["dbl_img"], mods["dbl_txt"]))
        z = jnp.concatenate([txt, img], 1)
        z, _ = jax.lax.scan(sgl_body, z, (params["single"], mods["sgl"]))
        img = z[:, T_TXT:]
        out = modulate(img, mods["final"][:, :cfg.hidden_dim],
                       mods["final"][:, cfg.hidden_dim:])
        v = dense(params["final_proj"], out)
        return samplers.euler_step(lat, v, 0.5, 0.45)

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--selfcheck", action="store_true",
                    help="verify per-iteration time is chain-length-invariant")
    args = ap.parse_args()
    tp = args.tp

    print(f"devices: {jax.devices()}", flush=True)
    cfg = FluxConfig()
    d = cfg.hidden_dim
    params = shard_params(cfg, tp)
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"per-shard weight bytes: {n_bytes / 2**30:.2f} GiB "
          f"(tp={tp}, full depth {cfg.num_double_layers}+"
          f"{cfg.num_single_layers})", flush=True)

    mods = {
        "dbl_img": jnp.zeros((cfg.num_double_layers, 1, 6 * d), jnp.bfloat16),
        "dbl_txt": jnp.zeros((cfg.num_double_layers, 1, 6 * d), jnp.bfloat16),
        "sgl": jnp.zeros((cfg.num_single_layers, 1, 3 * d), jnp.bfloat16),
        "final": jnp.zeros((1, 2 * d), jnp.bfloat16),
    }
    cond = jnp.zeros((1, T_IMG, cfg.in_channels - 64), jnp.bfloat16)
    txt_emb = jnp.zeros((1, T_TXT, cfg.joint_dim), jnp.bfloat16)
    lat0 = jnp.zeros((1, T_IMG, 64), jnp.bfloat16)

    step = jax.jit(make_step(cfg, tp))
    run = lambda lat: step(params, cond, txt_emb, mods, lat)

    if args.selfcheck:
        for hi, lo in ((8, 2), (16, 4)):
            t = time_step(run, lat0, iters_hi=hi, iters_lo=lo, repeats=2)
            print(f"selfcheck iters ({hi},{lo}): {t*1e3:.2f} ms/step",
                  flush=True)
        print("selfcheck: the two numbers must agree within ~10%", flush=True)

    t = time_step(run, lat0, iters_hi=16, iters_lo=4, repeats=3)
    print(f"per-shard step (tp={tp}, S={SEQ}, W8A8, mods precomputed): "
          f"{t*1e3:.2f} ms", flush=True)

    # context numbers from the committed budget (ARCHITECTURE.md):
    ici_ms = 6.5       # HLO-audited 635 MiB / 180 GB/s
    single_chip_ms = 95.9
    per_step = t * 1e3 + ici_ms
    fixed_s = 0.072    # VAE + text encode + schedule fixed costs per image
    s_img = 30 * per_step / 1e3 + fixed_s
    print(f"projected v5e-8 step: {t*1e3:.2f} (measured shard compute) + "
          f"{ici_ms} (audited ICI) = {per_step:.1f} ms -> "
          f"{s_img:.3f} s/img @30 steps", flush=True)

    out = {
        "captured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "tp": tp, "seq": SEQ, "quant": "w8a8",
        "shard_step_ms": round(t * 1e3, 2),
        "budget_proj": {"old_matmul_ms": 9.1, "old_attn_ms": 2.8},
        "ici_ms_audited": ici_ms,
        "per_step_ms": round(per_step, 2),
        "s_per_img_30steps": round(s_img, 3),
        "single_chip_step_ms_ref": single_chip_ms,
        "note": "shard compute MEASURED on one real v5e (full-depth scan, "
                "exact per-shard shapes incl. 3-head fused attention); "
                "collectives omitted from the program, added from the "
                "HLO-audited byte count at assumed 180 GB/s ICI",
    }
    with open(os.path.join(ROOT, "TP_SHARD_r5.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote TP_SHARD_r5.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
