"""Training-step cost on one TPU chip: full-width (3072) reduced-depth
train steps (attention-only unfreeze, AdamW, remat, flash-attn backward),
depth-extrapolated to the 19+38 model with a fixed-cost intercept
(VAE encodes + packing + optimizer). Recorded in ARCHITECTURE.md.

Run on the target chip: python benchmarks/bench_train_step.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from textflux_tpu.config import FluxConfig, VAEConfig
from textflux_tpu.models.transformer import init_flux_params
from textflux_tpu.models.vae import init_vae_params
from textflux_tpu.training import train as TR

print("backend:", jax.default_backend())
H, W = 592, 512            # 512px single-line canvas
if "--canvas" in sys.argv:  # e.g. --canvas 1024x512 = multi-line full-canvas
    H, W = map(int, sys.argv[sys.argv.index("--canvas") + 1].split("x"))
T_TXT = 512
print(f"canvas {H}x{W} -> joint seq {(H//16)*(W//16) + T_TXT}")

vae_cfg = VAEConfig()
rng = np.random.default_rng(0)
vae_params = jax.tree.map(
    lambda sd: jnp.zeros(sd.shape, jnp.bfloat16),
    jax.eval_shape(lambda k: init_vae_params(k, vae_cfg), jax.random.PRNGKey(0)))

batch = {
    "pixel_values": jnp.asarray(rng.standard_normal((1, 1, H, W, 3)), jnp.float32),
    "mask": jnp.asarray((rng.random((1, 1, H, W)) > 0.9), jnp.float32),
    "txt": jnp.asarray(rng.standard_normal((1, 1, T_TXT, 4096)), jnp.float32),
    "pooled": jnp.asarray(rng.standard_normal((1, 1, 768)), jnp.float32),
}

def bench(nd, ns):
    cfg = FluxConfig(num_double_layers=nd, num_single_layers=ns)
    tc = TR.TrainConfig(grad_accum=1, excluded_single_layers=())
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_flux_params(jax.random.PRNGKey(0), cfg))
    mask = TR.attn_only_mask(params, cfg, tc)
    tx = TR.make_optimizer(tc, mask)
    trainable = jax.tree.map(TR.np_any_trainable, mask)
    step = TR.make_train_step(cfg, vae_cfg, tc, tx, attn_impl="pallas",
                              trainable_leaves=trainable)
    opt_state = tx.init(params)
    del params
    jitted = jax.jit(step, donate_argnums=(0,))  # reuse the params buffers

    def chained(p):
        new_params, _, metrics = jitted(p, opt_state, mask, vae_params,
                                        batch, jax.random.PRNGKey(7))
        return new_params

    # local slope timer: donation deletes inputs, so each run chains from a
    # fresh param tree (time_step reuses x0 and would read deleted buffers)
    import time

    def run(iters):
        p = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            init_flux_params(jax.random.PRNGKey(0), cfg))
        p = chained(p)  # absorb dispatch warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            p = chained(p)
        np.asarray(jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(1)  # compile
    t = min((run(12) - run(4)) / 8 for _ in range(2))
    print(f"depth ({nd:2d},{ns:2d}): {t*1000:9.2f} ms/step")
    del jitted, step, mask, opt_state
    import gc
    gc.collect()
    return t

def bench_qlora_full_depth(quantize_base="nf4", rank=128, use_8bit_adam=True,
                           nd=19, ns=38, double_quant=False):
    """MEASURED full-depth 19+38 LoRA train step on one chip: the frozen base
    is serve-quantized (NF4 = 6.24 GiB / int8 = 11.1 GiB vs 22.2 bf16), the
    rank-128 LoRA factors train in fp32 via the parallel-branch formulation
    (training.train.lora_insert) — no depth extrapolation.
    Reference config: scripts/train_lora.py:508-534 (rank 128)."""
    from textflux_tpu.io.quantize import quantized_bytes

    cfg = FluxConfig(num_double_layers=nd, num_single_layers=ns)
    tc = TR.TrainConfig(grad_accum=1, lora_rank=rank, lora_alpha=float(rank),
                        optimizer="adamw8bit" if use_8bit_adam else "adamw",
                        excluded_single_layers=())

    # timing-equivalent zero base straight in the quantized layout (a real
    # checkpoint would be quantized from bf16 on load; values don't affect
    # step time); double_quant = bnb-style absmax codes (io/quantize.py):
    # ~0.5 GiB back on the 12B base — the margin that fits the 8704-token
    # multi-line canvas in 16 GiB
    from zeroparams import zero_flux_params

    shapes = jax.eval_shape(lambda k: init_flux_params(k, cfg), jax.random.PRNGKey(0))
    base = zero_flux_params(cfg, quantize_base, double_quant=double_quant)
    print(f"qlora base ({quantize_base}): {quantized_bytes(base)/2**30:.2f} GiB")
    # lora_init only reads SHAPES from the base tree, so the eval_shape
    # structs suffice — and it builds the grouped per-module factor layout
    # fresh training uses (reference peft family)
    lora = TR.lora_init(jax.random.PRNGKey(1), shapes, cfg, rank)
    n_lora = sum(int(x.size) for x in jax.tree.leaves(lora))
    print(f"lora params: {n_lora/1e6:.0f}M fp32 ({n_lora*4/2**30:.2f} GiB)")

    tx = TR.make_optimizer(tc)
    step = TR.make_lora_train_step(cfg, vae_cfg, tc, tx, attn_impl="pallas")
    opt_state = tx.init(lora)
    jitted = jax.jit(step, donate_argnums=(1, 2))

    import time

    def run(iters, lora, opt_state):
        for _ in range(iters):
            lora, opt_state, metrics = jitted(base, lora, opt_state, vae_params,
                                              batch, jax.random.PRNGKey(7))
        np.asarray(jnp.sum(jax.tree.leaves(lora)[0][0, :1, :1].astype(jnp.float32)))
        return lora, opt_state

    t0 = time.perf_counter()
    lora, opt_state = run(1, lora, opt_state)   # compile
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s")
    ts = []
    for iters in (4, 12):
        t0 = time.perf_counter()
        lora, opt_state = run(iters, lora, opt_state)
        ts.append((iters, time.perf_counter() - t0))
    t = (ts[1][1] - ts[0][1]) / (ts[1][0] - ts[0][0])
    print(f"MEASURED full-depth ({nd}+{ns}) QLoRA train step "
          f"(base={quantize_base}, rank {rank}, B=1, "
          f"{(H//16)*(W//16) + T_TXT} tokens, remat, "
          f"{'8-bit' if use_8bit_adam else 'fp32'} Adam): "
          f"{t*1000:.0f} ms -> {1/t:.2f} steps/s")
    return t


if __name__ == "__main__":
    if "--qlora" in sys.argv:
        mode = "weight_only" if "--int8" in sys.argv else "nf4"
        bench_qlora_full_depth(quantize_base=mode,
                               use_8bit_adam="--fp32-adam" not in sys.argv,
                               double_quant="--dq" in sys.argv)
        sys.exit(0)
    # Least-squares over 5 depths (up to 16 blocks), NOT an exact 3x3 solve:
    # the exact solve pushes per-run tunnel noise straight into the
    # coefficients and amplifies ~10x at 57 blocks (round-3 repeat runs of
    # the 3-point version projected 683 and 1182 ms from the same code).
    # Deeper points shrink the extrapolation factor; residuals are printed so
    # a noisy run is visible instead of silently wrong.
    depths = [(2, 4), (4, 4), (2, 8), (4, 8), (2, 12)]
    times = [bench(nd, ns) for nd, ns in depths]
    A = np.array([[1, nd, ns] for nd, ns in depths], float)
    (c, td, ts), res, _, _ = np.linalg.lstsq(A, np.array(times), rcond=None)
    fit = A @ np.array([c, td, ts])
    full = c + 19 * td + 38 * ts
    print(f"intercept (VAE+packing+opt) = {c*1000:.1f} ms, per-double = {td*1000:.1f} ms, "
          f"per-single = {ts*1000:.1f} ms")
    print("fit residuals (ms):",
          " ".join(f"{(m - f)*1000:+.1f}" for m, f in zip(times, fit)))
    print(f"projected full 19+38 train step (B=1, 1696 tokens, attn-only, remat): "
          f"{full*1000:.0f} ms -> {1/full:.2f} steps/s")
