"""Isolated int8-matmul roofline at the EXACT W8A8 serving shapes
(VERDICT.md round-4 item 2: prove or break the ~96 ms single-chip floor).

The in-model decomposition attributes ~73 ms of the 95.9 ms W8A8 step to
XLA's int8 matmuls at ~76% of the v5e's 394 TOPS int8 peak. This benchmark
times each serving matmul shape IN ISOLATION, two ways:

  pure  — int8 x int8 -> int32 dot only (activations pre-quantized; the next
          iteration's int8 activations are derived from the accumulator by
          cheap integer ops, so the chain is data-dependent but carries no
          quantization work)
  w8a8  — the framework's full `dense` w8a8 path (per-token amax quant +
          int8 dot + f32 rescale), i.e. models/layers.py:_dense_w8a8 itself

Interpretation (the verdict's decision rule): if `pure` sits >85% of peak
where the in-model step sits at ~76%, the gap is scheduling/fusion and is
actionable; if `pure` also sits at ~76%, the floor is proven and the <=2 s
north star is formally an 8-chip target.

Tunnel-timing rules honored (CLAUDE.md):
  - micro chains measure ~0 through the tunnel's run-ahead window, so each
    timed iteration scans >= MIN_ITER_MS worth of matmuls (L is scaled up
    per shape); `--selfcheck` verifies per-matmul time is L-invariant;
  - feedback mixes at O(1) scale (row-RMS normalization), never below bf16
    epsilon;
  - stacked weights are passed as jit ARGUMENTS (a closed-over constant is
    serialized with the executable);
  - per-matmul cost = slope between two chain lengths, forced host read.

Shapes: every dense in the W8A8 serving step at the single-line eval config
(592x512 canvas -> 1696 image tokens, 512 text tokens, 2208 joint), B=1,
hidden 3072 / mlp 12288 (models/transformer.py double_block / single_block).

Usage: python benchmarks/bench_int8_roofline.py [--selfcheck] [--bf16]
Writes INT8_ROOFLINE.json next to the repo root.
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from textflux_tpu.models.layers import dense
from textflux_tpu.utils.benchmarking import time_step

INT8_PEAK_TOPS = 394e12   # v5e int8 MXU peak
BF16_PEAK_FLOPS = 197e12  # v5e bf16 peak
MIN_ITER_MS = 6.0         # per timed iteration, to clear the run-ahead window
MAX_WEIGHT_BYTES = 2.6e9  # stacked int8 weights cap (16 GiB chip, solo)

# (name, M, K, N, count_per_model_step) — the full W8A8 matmul inventory of
# one denoising step at B=1 / 1696+512 tokens (transformer.py:221-405).
SHAPES = [
    ("dbl_img_qkv", 1696, 3072, 9216, 19),
    ("dbl_txt_qkv", 512, 3072, 9216, 19),
    ("dbl_img_proj", 1696, 3072, 3072, 19),
    ("dbl_txt_proj", 512, 3072, 3072, 19),
    ("dbl_img_fc1", 1696, 3072, 12288, 19),
    ("dbl_img_fc2", 1696, 12288, 3072, 19),
    ("dbl_txt_fc1", 512, 3072, 12288, 19),
    ("dbl_txt_fc2", 512, 12288, 3072, 19),
    ("sgl_linear1", 2208, 3072, 21504, 38),
    ("sgl_linear2", 2208, 15360, 3072, 38),
]


def chain_len(m, k, n):
    """Scan length: long enough that one timed iteration >= MIN_ITER_MS even
    at 100% of int8 peak, capped by stacked-weight memory."""
    sol_s = 2.0 * m * k * n / INT8_PEAK_TOPS
    want = max(19, math.ceil(MIN_ITER_MS / 1e3 / sol_s))
    mem_cap = max(8, int(MAX_WEIGHT_BYTES / (k * n)))
    return min(want, mem_cap, 512)


def _fold(y, k):
    """(M, N) -> (M, K) consuming EVERY output column.

    A plain `y[:, :k]` slice lets XLA dead-code-eliminate the unused output
    columns of the matmul itself (observed: "188% of peak" on the N=3*K qkv
    shape — the compiler only computed K of the N columns). Group-summing
    columns keeps the chain data-dependent on the whole product at O(M*N)
    extra adds, negligible vs the 2*M*K*N matmul."""
    n = y.shape[-1]
    if n == k:
        return y
    if n > k:
        pad = (-n) % k
        if pad:
            y = jnp.pad(y, ((0, 0), (0, pad)))
        return y.reshape(y.shape[0], -1, k).sum(axis=1)
    reps = -(-k // n)
    return jnp.tile(y, (1, reps))[:, :k]


def _rms_rows(x):
    r = jax.lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                               keepdims=True) + 1e-6)
    return (x.astype(jnp.float32) * r).astype(jnp.bfloat16)


def make_w8a8_step(k):
    """Full framework w8a8 dense (amax quant + int8 dot + rescale), chained
    over L stacked weights with O(1)-scale row-RMS feedback."""

    @jax.jit
    def step(x, w_stack, s_stack):
        def body(carry, ws):
            w, s = ws
            y = dense({"w_q8a8": w, "scale": s}, carry)
            return _rms_rows(_fold(y, k) + carry), None

        out, _ = jax.lax.scan(body, x, (w_stack, s_stack))
        return out

    return step


def make_pure_step(k):
    """int8 x int8 -> int32 dot only; next activations derived by integer
    ops from the accumulator (data-dependent, no quant work)."""

    @jax.jit
    def step(xq, w_stack):
        def body(carry, w):
            acc = jax.lax.dot_general(carry, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            nxt = (jnp.bitwise_and(_fold(acc, k), 127) - 64).astype(jnp.int8)
            return nxt, None

        out, _ = jax.lax.scan(body, xq, w_stack)
        return out

    return step


def make_bf16_step(k):
    @jax.jit
    def step(x, w_stack):
        def body(carry, w):
            y = carry @ w
            return _rms_rows(_fold(y, k) + carry), None

        out, _ = jax.lax.scan(body, x, w_stack)
        return out

    return step


def measure_shape(name, m, k, n, *, variant, length, rng):
    w8 = jnp.asarray(rng.integers(-127, 128, (length, k, n), np.int8))
    if variant == "w8a8":
        scale = jnp.full((length, n), 0.01, jnp.float32)
        x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        step = make_w8a8_step(k)
        t = time_step(lambda x: step(x, w8, scale), x0)
    elif variant == "pure":
        xq0 = jnp.asarray(rng.integers(-127, 128, (m, k), np.int8))
        step = make_pure_step(k)
        t = time_step(lambda x: step(x, w8), xq0)
    elif variant == "bf16":
        wb = (w8.astype(jnp.bfloat16) * 0.01)
        del w8
        x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        step = make_bf16_step(k)
        t = time_step(lambda x: step(x, wb), x0)
    per_matmul_s = t / length
    flops = 2.0 * m * k * n
    peak = BF16_PEAK_FLOPS if variant == "bf16" else INT8_PEAK_TOPS
    eff = flops / per_matmul_s / peak
    return per_matmul_s, eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--selfcheck", action="store_true",
                    help="verify per-matmul time is chain-length-invariant "
                         "(run-ahead detector) on the smallest shape")
    ap.add_argument("--bf16", action="store_true",
                    help="also time the bf16 matmul at each shape")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    if args.selfcheck:
        name, m, k, n, _ = SHAPES[3]  # dbl_txt_proj, the smallest
        base = chain_len(m, k, n)
        for length in (base, 2 * base):
            t, eff = measure_shape(name, m, k, n, variant="pure",
                                   length=length, rng=rng)
            print(f"selfcheck {name} L={length}: {t*1e6:.1f} us/matmul "
                  f"({eff*100:.1f}% peak)", flush=True)
        print("selfcheck: the two numbers above must agree within ~5%; a "
              "2x gap means the chain still fits the run-ahead window",
              flush=True)

    rows = {}
    total_pure = total_w8a8 = total_sol = 0.0
    for name, m, k, n, count in SHAPES:
        length = chain_len(m, k, n)
        sol_us = 2.0 * m * k * n / INT8_PEAK_TOPS * 1e6
        row = {"m": m, "k": k, "n": n, "chain_len": length,
               "per_step_count": count, "sol_us": round(sol_us, 1)}
        for variant in (("pure", "w8a8", "bf16") if args.bf16
                        else ("pure", "w8a8")):
            # eff slightly above 1.0 is tunnel timing noise (documented
            # ±3% cross-run spread + clock/SOL uncertainty); true DCE of
            # the chain shows 2x+ efficiency. Retry the noisy band, raise
            # only on the impossible one.
            for attempt in range(3):
                t, eff = measure_shape(name, m, k, n, variant=variant,
                                       length=length, rng=rng)
                if eff <= 1.02:
                    break
                print(f"  retry {name}/{variant}: {eff*100:.1f}% of peak "
                      "(timing noise band)", flush=True)
            if eff > 1.10:
                raise RuntimeError(
                    f"{name}/{variant}: {eff*100:.1f}% of peak is "
                    "impossible — the chain is being partially "
                    "dead-code-eliminated or mistimed; result discarded")
            row[f"{variant}_us"] = round(t * 1e6, 1)
            row[f"{variant}_eff"] = round(eff, 3)
            print(f"{name:14s} ({m:5d}x{k:5d}->{n:5d}) {variant:5s}: "
                  f"{t*1e6:8.1f} us/matmul  {eff*100:5.1f}% of peak  "
                  f"(SOL {sol_us:.1f} us, L={length})", flush=True)
        rows[name] = row
        total_pure += row["pure_us"] * count
        total_w8a8 += row["w8a8_us"] * count
        total_sol += sol_us * count

    summary = {
        "model_matmul_sol_ms": round(total_sol / 1e3, 2),
        "model_matmul_pure_ms": round(total_pure / 1e3, 2),
        "model_matmul_w8a8_ms": round(total_w8a8 / 1e3, 2),
        "pure_eff_weighted": round(total_sol / total_pure, 3),
        "w8a8_eff_weighted": round(total_sol / total_w8a8, 3),
    }
    print(f"\nmodel-step matmul totals (sum over inventory): "
          f"SOL {summary['model_matmul_sol_ms']:.1f} ms, "
          f"pure {summary['model_matmul_pure_ms']:.1f} ms "
          f"({summary['pure_eff_weighted']*100:.1f}%), "
          f"w8a8 {summary['model_matmul_w8a8_ms']:.1f} ms "
          f"({summary['w8a8_eff_weighted']*100:.1f}%)", flush=True)
    print("in-model attribution for comparison: ~73 ms at ~76% "
          "(ARCHITECTURE.md round-3 decomposition)", flush=True)

    out = {"captured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
           "int8_peak_tops": INT8_PEAK_TOPS, "rows": rows, "summary": summary}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INT8_ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
