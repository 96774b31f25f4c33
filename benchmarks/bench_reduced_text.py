"""Reduced text-sequence serving (VERDICT r4 item 3): measure the speed side
of the --max-sequence-length 512/256/128 trade on the real chip.

Motivation (recapture_logs/int8_roofline.log): the 512 padded T5 tokens are
~30% of the single-line serving sequence and run the step's WORST matmul
shapes (512-row matmuls at 35-45%% of int8 peak vs 64-90%% for the 1696-row
side), while single-line prompts occupy a few dozen T5 slots. The flag is
already plumbed end to end (cli/run_inference.py --max-sequence-length ->
pipeline/fill.py); only the measurement was missing.

What this measures [D]: full-width W8A8 step time + the L-dependent T5
encode + the mods precompute at each text length, and the resulting s/img.
What it cannot measure here: OUTPUT QUALITY with the released weights —
FLUX trains on unmasked 512-token padding, so serving at 128 shifts the
text stream distribution; with zero egress there are no real weights to
quantify that shift on. The closed-loop harness demonstrates the
SeqAcc-vs-text-length measurement mechanism on its synthetic model
(benchmarks/closed_loop.py eval at reduced lengths); re-run that table with
real weights before shipping a reduced default.

Usage: python benchmarks/bench_reduced_text.py
Writes REDUCED_TEXT_r5.json at the repo root.
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import (
    HEIGHT, WIDTH, _bench_mods_precompute, _bench_step, _zero_params,
    bench_vae_roundtrip, step_flops,
)
from textflux_tpu.config import FluxConfig, T5Config
from textflux_tpu.models.t5 import init_t5_params, t5_encode
from textflux_tpu.utils.benchmarking import time_step

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = 30
T_IMG = (HEIGHT // 8 // 2) * (WIDTH // 8 // 2)   # 1184 at 592x512
LENGTHS = (512, 256, 128)
CLIP_S = 0.0013   # measured r4 (L-independent: CLIP is fixed 77 tokens)


def bench_t5(seq_len: int) -> float:
    """T5-XXL encode at the given token length (zero weights, slope-timed)."""
    t5_cfg = T5Config()
    shapes = jax.eval_shape(lambda k: init_t5_params(k, t5_cfg),
                            jax.random.PRNGKey(0))
    shapes = jax.tree.map(
        lambda sd: jax.ShapeDtypeStruct(sd.shape, jnp.bfloat16)
        if sd.ndim >= 2 else sd, shapes)
    params = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)

    def t5_step(params, ids):
        out = t5_encode(params, t5_cfg, ids, dtype=jnp.bfloat16)
        return (ids + jnp.round(out[:, :, 0]).astype(jnp.int32)) % 32128

    jitted = jax.jit(t5_step)
    ids0 = jnp.zeros((1, seq_len), jnp.int32)
    t = time_step(lambda ids: jitted(params, ids), ids0,
                  iters_hi=6, iters_lo=2, repeats=2)
    del params
    gc.collect()
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = FluxConfig()

    t_vae = bench_vae_roundtrip()
    print(f"vae roundtrip: {t_vae*1e3:.1f} ms", flush=True)

    # T5 first, DiT after: bf16 T5-XXL (8.9 GiB) and the W8A8 DiT
    # (11.1 GiB) cannot be co-resident on the 16 GiB chip (the serving
    # path stages them for the same reason).
    t5_times = {}
    for L in LENGTHS:
        t5_times[L] = bench_t5(L)
        print(f"t5 encode L={L}: {t5_times[L]*1e3:.1f} ms", flush=True)

    rows = {}
    params = _zero_params(cfg, quantize="w8a8")
    t_mods = _bench_mods_precompute(cfg, params)
    for L in LENGTHS:
        t_step = _bench_step(cfg, params, T_IMG, L, "fused")
        t_t5 = t5_times[L]
        s_img = STEPS * t_step + t_mods + t_vae + t_t5 + CLIP_S
        mfu = step_flops(cfg, T_IMG, L) / t_step / 394e12
        rows[str(L)] = {
            "joint_seq": T_IMG + L,
            "step_ms": round(t_step * 1e3, 2),
            "t5_encode_ms": round(t_t5 * 1e3, 2),
            "s_per_img_30steps": round(s_img, 3),
            "int8_mfu": round(mfu, 3),
        }
        print(f"L={L:4d} (S={T_IMG+L}): step {t_step*1e3:6.2f} ms, "
              f"t5 {t_t5*1e3:6.1f} ms, {s_img:.3f} s/img, "
              f"{mfu*100:.1f}% int8-MFU", flush=True)
    del params
    gc.collect()

    base = rows["512"]["s_per_img_30steps"]
    for L in LENGTHS:
        rows[str(L)]["speedup_vs_512"] = round(
            base / rows[str(L)]["s_per_img_30steps"], 3)

    out = {"captured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
           "config": f"{WIDTH}x{HEIGHT} single-line canvas, W8A8, fused attn, "
                     f"mods precomputed, {STEPS} steps",
           "mods_precompute_s": round(t_mods, 4),
           "vae_roundtrip_s": round(t_vae, 4),
           "rows": rows,
           "quality_note": "speed only [D]; quality at reduced L requires "
                           "real weights (zero egress) — see module docstring"}
    with open(os.path.join(ROOT, "REDUCED_TEXT_r5.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote REDUCED_TEXT_r5.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
