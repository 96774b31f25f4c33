"""Headline benchmark: seconds/image for TextFlux-beta-style single-line 512px
inference (30 denoise steps, 592x512 concat canvas) on one TPU chip.

Primary path: the FULL 19+38-block DiT in int8 W8A8 (int8 weights AND
per-token int8 activations on the int8 MXU — the fast single-chip serving
configuration, quality table in ARCHITECTURE.md) measured directly, plus the
weight-only int8 step (best-quality int8 config), VAE encode+decode and text
encoders. Fallback (OOM / non-TPU): full-width reduced-depth bf16 models
extrapolated linearly over depth (exact under lax.scan).

All timing uses the slope method (tunnel-safe; see
textflux_tpu.utils.benchmarking — block_until_ready resolves early here).
MFU is computed against the matmul+attention FLOP count of the real step.

Baseline: TextFlux-beta 10.9 s/img (reference README.md:82, hardware unstated).
Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...breakdown}.
"""

import gc
import json
import os
import subprocess
import sys
import time

import numpy as np


BASELINE_S_PER_IMG = 10.9
BASELINE_S_PER_IMG_MULTILINE = 15.6   # reference README.md:80 (TextFlux full)
STEPS = 30
# 512px single-line: 512x512 scene + 80px glyph strip -> 592x512 canvas (//16)
HEIGHT, WIDTH = 592, 512
# multi-line (original TextFlux conditioning, run_inference.py:409-427): the
# glyph canvas is scene-sized and stacked vertically, so a 512px scene makes
# a 1024x512 canvas (2560 joint tokens). This is the config comparable to
# the reference's TextFlux 15.6 s/img row (README.md:80 — same ReCTS
# editing protocol, full-canvas conditioning instead of the beta strip).
ML_HEIGHT, ML_WIDTH = 1024, 512
# large-canvas capability row (1024px scene -> 2048x1024, 8704 joint tokens,
# tiled VAE + chunked flash kernels); opt-in: TEXTFLUX_BENCH_XL=1
XL_HEIGHT, XL_WIDTH = 2048, 1024
T_TXT = 512


def zeros_like_tree(tree_shape):
    import jax.numpy as jnp
    import jax

    return jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), tree_shape)


def _zero_params(cfg, quantize):
    """Timing-equivalent zero weights in the requested layout (shared,
    layout-tested builder — see benchmarks/zeroparams.py)."""
    from benchmarks.zeroparams import zero_flux_params

    return zero_flux_params(cfg, quantize)


def step_flops(cfg, t_img: int, t_txt: int) -> float:
    """Matmul + attention FLOPs of one full DiT step at batch 1 (the MFU
    denominator). Every token passes one stream of each double block and the
    whole single block: 24*D^2 matmul FLOPs per token per block either way."""
    d = cfg.hidden_dim
    s = t_img + t_txt
    blocks = cfg.num_double_layers + cfg.num_single_layers
    matmul = 24.0 * d * d * s * blocks
    attn = 4.0 * s * s * d * blocks
    mods = 24.0 * d * d * cfg.num_double_layers + 6.0 * d * d * cfg.num_single_layers
    return matmul + attn + mods


def _bench_step(cfg, params, t_img, t_txt, attn_impl, precompute_mods=True,
                height=HEIGHT, width=WIDTH, batch=1):
    """Per-denoise-step time, as the pipeline runs it: the AdaLN modulation
    vectors are precomputed for the whole schedule (fill.py denoise), so the
    step consumes per-step mod slices. The once-per-image precompute cost is
    measured separately by _bench_mods_precompute.

    This is THE serving-step harness: benchmarks/bench_serving_matrix.py
    imports it (batch=N rows) rather than carrying a copy that would
    silently drift from the measured serving program (the zeroparams.py
    docstring records exactly that failure mode for the params builder)."""
    import jax
    import jax.numpy as jnp

    from textflux_tpu.models.transformer import flux_apply, flux_mods, flux_vec
    from textflux_tpu.ops import packing, samplers
    from textflux_tpu.ops.rope import rope_tables, rope_tables_half
    from textflux_tpu.utils.benchmarking import time_step

    lat_h, lat_w = height // 8, width // 8
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(lat_h, lat_w)], 0)
    table_fn = rope_tables_half if attn_impl == "fused" else rope_tables
    cos, sin = table_fn(ids, cfg.axes_dims_rope, cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    cond = jnp.zeros((batch, t_img, cfg.in_channels - 64), jnp.bfloat16)
    txt = jnp.zeros((batch, t_txt, cfg.joint_dim), jnp.bfloat16)
    pooled = jnp.zeros((batch, cfg.pooled_dim), jnp.bfloat16)
    guidance = jnp.full((batch,), 30.0, jnp.float32)

    mods = None
    if precompute_mods:
        vec = flux_vec(params, cfg, jnp.full((batch,), 0.5, jnp.bfloat16),
                       guidance, pooled, jnp.bfloat16)
        mods = flux_mods(params, cfg, vec)

    # params/cond/etc. must be jit ARGUMENTS: closed-over arrays lower as
    # captured constants, which the tunneled backend re-ships per compile
    def step_fn(params, cond, txt, pooled, guidance, cos, sin, mods, lat):
        v = flux_apply(params, cfg, jnp.concatenate([lat, cond], -1), txt, pooled,
                       jnp.full((batch,), 0.5, jnp.bfloat16), guidance, cos, sin,
                       attn_impl=attn_impl, mods=mods)
        return samplers.euler_step(lat, v, 0.5, 0.45)

    jitted = jax.jit(step_fn)
    lat0 = jnp.zeros((batch, t_img, 64), jnp.bfloat16)
    return time_step(lambda lat: jitted(params, cond, txt, pooled, guidance, cos, sin, mods, lat),
                     lat0, iters_hi=8, iters_lo=2, repeats=2)


def _bench_mods_precompute(cfg, params, steps=STEPS):
    """Once-per-image cost of the whole-schedule AdaLN modulation precompute
    (reads the ~27%-of-params modulation weights once). Memory-bound and
    small; the measurement is floored at the HBM-bandwidth lower bound in
    case the chain fits the tunnel's run-ahead window."""
    import jax
    import jax.numpy as jnp

    from textflux_tpu.models.transformer import flux_mods, flux_vec
    from textflux_tpu.utils.benchmarking import time_step

    pooled = jnp.zeros((1, cfg.pooled_dim), jnp.bfloat16)
    guidance = jnp.full((steps,), 30.0, jnp.float32)

    def mods_fn(params, pooled, sigma0):
        sig = sigma0 + jnp.arange(steps, dtype=jnp.bfloat16) / (2 * steps)
        vec = flux_vec(params, cfg, sig, guidance, jnp.tile(pooled, (steps, 1)),
                       jnp.bfloat16)
        mods = flux_mods(params, cfg, vec)
        leaves = jax.tree.leaves(mods)
        # data-dependence for chaining: scalar fold of all outputs
        return sigma0 + 0.0 * sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) / 1e9

    jitted = jax.jit(mods_fn)
    t = time_step(lambda s: jitted(params, pooled, s), jnp.bfloat16(0.25),
                  iters_hi=24, iters_lo=6, repeats=2)

    def mod_bytes(tree):
        total = 0
        for key in ("double", "single"):
            for name in ("img_mod", "txt_mod", "mod"):
                node = tree[key].get(name) if isinstance(tree[key], dict) else None
                if node:
                    total += sum(np.prod(v.shape) * v.dtype.itemsize
                                 for v in node.values())
        return total

    floor = mod_bytes(params) / 819e9   # v5e HBM ~819 GB/s
    return max(t, floor)


def bench_transformer_full_int8(t_img, t_txt, attn_impl, mode="weight_only",
                                height=HEIGHT, width=WIDTH,
                                measure_mods=True):
    """measure_mods=False skips the (latent-independent, mode/shape-invariant
    at full depth) mods-precompute re-measurement: the weight-only/multiline/
    XL calls were each re-jitting and re-slope-timing the identical quantity
    through the tunnel only to discard it — extra compile requests, each an
    independent chance to hit the wedge/die-mid-request failure modes."""
    from textflux_tpu.config import FluxConfig

    cfg = FluxConfig()
    params = _zero_params(cfg, quantize=mode)
    t = _bench_step(cfg, params, t_img, t_txt, attn_impl, height=height,
                    width=width)
    t_mods = _bench_mods_precompute(cfg, params) if measure_mods else None
    del params
    gc.collect()
    return t, t_mods


def _solve_depth_plane(depths, vals):
    """Exact solve of t = D*td + S*ts + c from three affinely independent
    (D, S) points. The intercept matters: without it the depth-independent
    per-step cost (input embeddings, final norm+proj, euler update) is
    folded into td/ts and counted ~5.7x instead of 1x at 19+38."""
    A = np.array([[d, s, 1.0] for d, s in depths])
    b = np.array([vals[k] for k in depths])
    td, ts, c = np.linalg.solve(A, b)
    return td, ts, c


def bench_transformer_extrapolated(t_img, t_txt, attn_impl):
    from textflux_tpu.config import FluxConfig

    depths = [(2, 8), (6, 4), (4, 12)]  # affinely independent in (D, S)
    times, mods = {}, {}
    for nd, ns in depths:
        cfg = FluxConfig(num_double_layers=nd, num_single_layers=ns)
        params = _zero_params(cfg, quantize=False)
        times[(nd, ns)] = _bench_step(cfg, params, t_img, t_txt, attn_impl)
        # the fallback headline must include the per-image mods precompute
        # too (the direct path does); extrapolate it the same way
        mods[(nd, ns)] = _bench_mods_precompute(cfg, params)
        del params
        gc.collect()
    td, ts, c = _solve_depth_plane(depths, times)
    mtd, mts, mc = _solve_depth_plane(depths, mods)
    return 19 * td + 38 * ts + c, 19 * mtd + 38 * mts + mc, times


def bench_vae_roundtrip(height=HEIGHT, width=WIDTH, tiled=False):
    import jax
    import jax.numpy as jnp

    from textflux_tpu.config import VAEConfig
    from textflux_tpu.models.vae import (
        init_vae_params,
        vae_decode,
        vae_decode_tiled,
        vae_encode,
        vae_encode_tiled,
    )
    from textflux_tpu.utils.benchmarking import time_step

    cfg = VAEConfig()
    shapes = jax.eval_shape(lambda k: init_vae_params(k, cfg), jax.random.PRNGKey(0))
    shapes = jax.tree.map(lambda sd: jax.ShapeDtypeStruct(sd.shape, jnp.bfloat16), shapes)
    params = zeros_like_tree(shapes)

    def step_fn(params, lat):
        if tiled:  # the pipeline's large-canvas path (multi-line)
            img = vae_decode_tiled(params, cfg, lat, tile=128)
            return vae_encode_tiled(params, cfg, img, tile=128)
        img = vae_decode(params, cfg, lat)
        return vae_encode(params, cfg, img)

    jitted = jax.jit(step_fn)
    lat0 = jnp.zeros((1, height // 8, width // 8, 16), jnp.bfloat16)
    t = time_step(lambda lat: jitted(params, lat), lat0, iters_hi=6, iters_lo=2, repeats=2)
    del params
    gc.collect()
    return t


def bench_text_encoders():
    """T5 is model-sized and slope-times truthfully. CLIP alone is a MICRO
    chain: it fits the tunnel's run-ahead window and reads ~0 (the known
    failure mode — see CLAUDE.md), so it is measured as the *difference*
    between a chained T5+CLIP step and the T5-only step (both model-sized,
    same process), floored at the HBM + FLOP lower bound in case the
    difference is noise-negative."""
    import jax
    import jax.numpy as jnp

    from textflux_tpu.config import CLIPTextConfig, T5Config
    from textflux_tpu.models.clip import clip_encode, init_clip_params
    from textflux_tpu.models.t5 import init_t5_params, t5_encode
    from textflux_tpu.utils.benchmarking import time_step

    t5_cfg = T5Config()
    shapes = jax.eval_shape(lambda k: init_t5_params(k, t5_cfg), jax.random.PRNGKey(0))
    shapes = jax.tree.map(
        lambda sd: jax.ShapeDtypeStruct(sd.shape, jnp.bfloat16) if sd.ndim >= 2 else sd,
        shapes)
    t5_params = zeros_like_tree(shapes)

    clip_cfg = CLIPTextConfig()
    cshapes = jax.eval_shape(lambda k: init_clip_params(k, clip_cfg), jax.random.PRNGKey(0))
    cshapes = jax.tree.map(
        lambda sd: jax.ShapeDtypeStruct(sd.shape, jnp.bfloat16) if sd.ndim >= 2 else sd,
        cshapes)
    clip_params = zeros_like_tree(cshapes)

    def t5_step(params, ids):
        out = t5_encode(params, t5_cfg, ids, dtype=jnp.bfloat16)
        return (ids + jnp.round(out[:, :, 0]).astype(jnp.int32)) % 32128

    def both_step(t5_p, clip_p, ids):
        ids = t5_step(t5_p, ids)
        # CLIP consumes ids derived from the T5 output (data dependence keeps
        # the chain serialized through the tunnel's run-ahead window)
        _, pooled = clip_encode(clip_p, clip_cfg, ids[:, :77] % 49408,
                                dtype=jnp.bfloat16)
        return (ids + jnp.round(pooled[:, :1]).astype(jnp.int32)) % 32128

    ids0 = jnp.zeros((1, T_TXT), jnp.int32)
    jitted_t5 = jax.jit(t5_step)
    t_t5 = time_step(lambda ids: jitted_t5(t5_params, ids), ids0,
                     iters_hi=6, iters_lo=2, repeats=2)
    jitted_both = jax.jit(both_step)
    t_both = time_step(lambda ids: jitted_both(t5_params, clip_params, ids),
                       ids0, iters_hi=6, iters_lo=2, repeats=2)

    # lower bound: every CLIP weight read once from HBM + matmul FLOPs at peak
    clip_bytes = sum(np.prod(sd.shape) * 2 for sd in jax.tree.leaves(cshapes))
    d, m, layers, seq = (clip_cfg.hidden_dim, clip_cfg.mlp_dim,
                         clip_cfg.num_layers, 77)
    clip_flops = 2.0 * seq * layers * (4 * d * d + 2 * d * m)
    floor = clip_bytes / 819e9 + clip_flops / 197e12
    t_clip = max(t_both - t_t5, floor)

    del t5_params, clip_params
    gc.collect()
    return t_t5, t_clip


def main():
    import jax

    backend = jax.default_backend()
    lat_h, lat_w = HEIGHT // 8, WIDTH // 8
    t_img = (lat_h // 2) * (lat_w // 2)
    attn = "fused" if backend == "tpu" else "xla"

    from textflux_tpu.config import FluxConfig

    mode = "full_w8a8_direct"
    extra = {}
    t_mods = 0.0
    try:
        t_step, t_mods = bench_transformer_full_int8(t_img, T_TXT, attn, mode="w8a8")
        extra["mods_precompute_per_image_s"] = round(t_mods, 5)
    except Exception as e:  # OOM or non-TPU: fall back to depth extrapolation
        mode = f"bf16_depth_extrapolated ({type(e).__name__})"
        t_step, t_mods, times = bench_transformer_extrapolated(t_img, T_TXT, attn)
        extra["measured_depths"] = {f"{k}": round(v, 5) for k, v in times.items()}
        extra["mods_precompute_per_image_s"] = round(t_mods, 5)
    if mode == "full_w8a8_direct":
        # secondary row in its OWN try: a transient failure here (the
        # documented die-mid-request compile mode) must not discard the
        # already-successful W8A8 primary and rerun the whole bench in
        # extrapolation mode
        try:
            wo_step, _ = bench_transformer_full_int8(
                t_img, T_TXT, attn, mode="weight_only", measure_mods=False)
            extra["transformer_step_weight_only_s"] = round(wo_step, 5)
        except Exception as e:
            extra["weight_only_error"] = f"{type(e).__name__}: {e}"[:200]

    t_vae = bench_vae_roundtrip()
    t_t5, t_clip = bench_text_encoders()

    # multi-line counterpart of the reference's 15.6 s/img row (README.md:80):
    # original full-canvas conditioning at a 512px scene -> 1024x512 canvas,
    # 2560 joint tokens (same ReCTS editing protocol as the headline row —
    # the 15.6 s model differs from the 10.9 s beta only in conditioning size)
    if mode == "full_w8a8_direct":
        try:
            ml_lat_h, ml_lat_w = ML_HEIGHT // 8, ML_WIDTH // 8
            t_img_ml = (ml_lat_h // 2) * (ml_lat_w // 2)
            t_step_ml, _ = bench_transformer_full_int8(
                t_img_ml, T_TXT, attn, mode="w8a8",
                height=ML_HEIGHT, width=ML_WIDTH, measure_mods=False)
            t_vae_ml = bench_vae_roundtrip(ML_HEIGHT, ML_WIDTH)
            s_ml = STEPS * t_step_ml + t_mods + t_vae_ml + t_t5 + t_clip
            extra["multiline_step_s"] = round(t_step_ml, 5)
            extra["multiline_vae_s"] = round(t_vae_ml, 5)
            extra["multiline_s_per_img"] = round(s_ml, 4)
            extra["multiline_joint_seq_len"] = t_img_ml + T_TXT
            extra["multiline_vs_baseline"] = round(
                BASELINE_S_PER_IMG_MULTILINE / s_ml, 2)
        except Exception as e:
            extra["multiline_error"] = f"{type(e).__name__}: {e}"[:200]

    # opt-in large-canvas capability row: 1024px scene -> 2048x1024 canvas,
    # 8704 joint tokens, tiled VAE + chunked (K/V-streaming) flash kernels.
    # Full-depth measured: this is where quadratic attention dominates the
    # step (~1.2 s at 8704 tokens); kept out of the default run for time.
    if mode == "full_w8a8_direct" and os.environ.get("TEXTFLUX_BENCH_XL") == "1":
        try:
            xl_lat_h, xl_lat_w = XL_HEIGHT // 8, XL_WIDTH // 8
            t_img_xl = (xl_lat_h // 2) * (xl_lat_w // 2)
            t_step_xl, _ = bench_transformer_full_int8(
                t_img_xl, T_TXT, attn, mode="w8a8",
                height=XL_HEIGHT, width=XL_WIDTH, measure_mods=False)
            t_vae_xl = bench_vae_roundtrip(XL_HEIGHT, XL_WIDTH, tiled=True)
            extra["xl_step_s"] = round(t_step_xl, 5)
            extra["xl_vae_tiled_s"] = round(t_vae_xl, 5)
            extra["xl_s_per_img"] = round(
                STEPS * t_step_xl + t_mods + t_vae_xl + t_t5 + t_clip, 4)
            extra["xl_joint_seq_len"] = t_img_xl + T_TXT
        except Exception as e:
            extra["xl_error"] = f"{type(e).__name__}: {e}"[:200]

    print("bench sections done", file=sys.stderr, flush=True)
    flops = step_flops(FluxConfig(), t_img, T_TXT)
    tflops = flops / t_step / 1e12
    # v5e peaks: 197 TFLOP/s bf16, 394 TOPS int8 (attention stays bf16, so
    # the int8-peak fraction understates true utilization slightly)
    peak = 394.0 if mode == "full_w8a8_direct" else 197.0

    s_per_img = STEPS * t_step + t_mods + t_vae + t_t5 + t_clip
    result = {
        "metric": "s_per_img_512px_singleline_30steps",
        "value": round(s_per_img, 4),
        "unit": "s/img",
        "vs_baseline": round(BASELINE_S_PER_IMG / s_per_img, 2),
        "backend": backend,
        "breakdown": {
            "mode": mode,
            "transformer_step_s": round(t_step, 5),
            "step_effective_tflops": round(tflops, 1),
            "step_mfu_pct": round(100.0 * tflops / peak, 1),
            "vae_roundtrip_s": round(t_vae, 5),
            "t5_xxl_512tok_s": round(t_t5, 5),
            "clip_s": round(t_clip, 5),
            "joint_seq_len": t_img + T_TXT,
            **extra,
        },
        "note": "full 19+38 DiT, int8 W8A8 serving config (weights+activations on the int8 MXU; quality table in ARCHITECTURE.md; weight-only int8 step also reported), fused norm+rope+flash attention, whole-schedule AdaLN modulation precompute (mod weights ~27% of params read once per image, not per step; its per-image cost is in the breakdown); weights zeros-initialized (timing-equivalent). Batching does not amortize further: B=1 already compute-bound. Attention blocks auto-fit the sequence (zero padding at 1696 tokens). clip_s = (T5+CLIP chained) - (T5 alone), floored at the HBM+FLOP bound (CLIP alone is a micro chain the tunnel mis-times as ~0). multiline_* rows: the original full-canvas conditioning at a 512px scene (1024x512 canvas, 2560 joint tokens) vs the reference's 15.6 s/img TextFlux row — same ReCTS editing protocol, bigger conditioning than the beta strip. TEXTFLUX_BENCH_XL=1 adds a 2048x1024 / 8704-token large-canvas row (tiled VAE + chunked kernels).",
    }
    print(json.dumps(result))


def supervised():
    """Run main() in a watchdogged subprocess with retries.

    The tunneled backend's remote-compile service occasionally wedges: a
    compile request blocks forever at ~0 CPU inside a C call no Python
    watchdog thread can interrupt (see CLAUDE.md). The documented fix is
    kill-and-rerun — the retry hits the compile caches and the same program
    then compiles normally. Without this wrapper a single wedge mid-bench
    loses the whole benchmark artifact; with it the cost is one attempt's
    timeout. The child's stdout (the one JSON line) passes through verbatim."""
    budget = int(os.environ.get("TEXTFLUX_BENCH_ATTEMPT_S", "1500"))
    attempts = int(os.environ.get("TEXTFLUX_BENCH_ATTEMPTS", "3"))
    env = dict(os.environ, TEXTFLUX_BENCH_INNER="1")

    # pre-flight: the tunnel can go down so hard that jax.devices() itself
    # hangs (observed: multi-hour outage). Burning attempts x budget on that
    # leaves NO artifact; emit an honest sentinel line instead.
    probe = subprocess.Popen(
        [sys.executable, "-c", "import jax; jax.devices()"],
        env=os.environ.copy(), stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    try:
        alive = probe.wait(timeout=180) == 0
    except subprocess.TimeoutExpired:
        probe.kill()
        probe.wait()
        alive = False
    if not alive:
        print("backend unreachable (device enumeration hung/failed); "
              "emitting sentinel result", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "s_per_img_512px_singleline_30steps",
            "value": 0.0, "unit": "s/img", "vs_baseline": 0.0,
            "backend": "unreachable",
            "note": "TPU tunnel down at bench time: jax.devices() hung past "
                    "180 s in a fresh process (the hard-outage mode in "
                    "CLAUDE.md). No measurement possible this run; the last "
                    "measured result is BENCH_r02.json (2.85-2.93 s/img "
                    "single-line W8A8, 4.52 s/img multi-line).",
        }))
        return 0
    for i in range(attempts):
        t0 = time.time()
        proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                env=env)
        try:
            rc = proc.wait(timeout=budget)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print(f"bench attempt {i + 1}/{attempts} hung past {budget}s "
                  f"(wedged remote compile?) -- retrying with warm caches",
                  file=sys.stderr, flush=True)
            continue
        if rc == 0:
            return 0
        print(f"bench attempt {i + 1}/{attempts} exited rc={rc} "
              f"after {time.time() - t0:.0f}s -- retrying",
              file=sys.stderr, flush=True)
    print("bench failed: all attempts timed out or errored", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("TEXTFLUX_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(supervised())
