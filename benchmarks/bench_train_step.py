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
T_TXT = 512

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

depths = [(2, 4), (4, 4), (2, 8)]
times = [bench(nd, ns) for nd, ns in depths]
A = np.array([[1, nd, ns] for nd, ns in depths], float)
c, td, ts = np.linalg.solve(A, np.array(times))
full = c + 19 * td + 38 * ts
print(f"intercept (VAE+packing+opt) = {c*1000:.1f} ms, per-double = {td*1000:.1f} ms, "
      f"per-single = {ts*1000:.1f} ms")
print(f"projected full 19+38 train step (B=1, 1696 tokens, attn-only, remat): "
      f"{full*1000:.0f} ms -> {1/full:.2f} steps/s")
