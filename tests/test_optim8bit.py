"""8-bit Adam moment state: quantization roundtrip, 50-step parity vs fp32
AdamW, state-memory reduction, and integration with the masked train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from textflux_tpu.training.optim8bit import (
    adamw8bit,
    dequantize_blockwise,
    dequantize_dynamic,
    quantize_blockwise,
    quantize_dynamic,
    state_bytes,
)


def test_quantize_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal(1000), jnp.float32) * 3.0
    q = quantize_blockwise(x, block=256)
    y = dequantize_blockwise(q, x.shape)
    # symmetric linear int8: error bounded by scale/2 = absmax/254 per block
    err = np.abs(np.asarray(y - x))
    bounds = np.repeat(np.asarray(q.scale), 256)[: x.size] / 2 + 1e-7
    assert (err <= bounds).all()


def test_dynamic_quant_bounded_relative_error(rng):
    """Log-domain code: sign-exact, ~5% relative magnitude error at every
    scale above the absmax*1e-5 floor (linear int8 has 100% rel error for
    small values — the failure mode that blows up Adam denominators)."""
    x = jnp.asarray(rng.standard_normal(512) * np.exp(rng.uniform(-8, 2, 512)),
                    jnp.float32)
    q = quantize_dynamic(x, block=256)
    y = np.asarray(dequantize_dynamic(q, x.shape))
    xn = np.asarray(x)
    assert (np.sign(y) == np.sign(xn))[np.abs(y) > 0].all()
    above_floor = np.abs(xn) >= np.repeat(np.asarray(q.scale), 256)[:512] * 2e-5
    rel = np.abs(y - xn)[above_floor] / np.abs(xn)[above_floor]
    assert rel.max() < 0.06, rel.max()


def test_dynamic_quant_floor_never_underestimates():
    """floor=True: code-0 magnitudes dequantize to absmax*1e-5, not 0 — the
    second moment can only be over-estimated (smaller, safe steps)."""
    x = jnp.concatenate([jnp.full((1,), 1.0), jnp.full((255,), 1e-9)])
    q = quantize_dynamic(x, block=256)
    y = np.asarray(dequantize_dynamic(q, x.shape, floor=True))
    assert (y[1:] >= 1e-9).all() and y[1:].max() <= 2e-5


def test_quantize_handles_zero_and_padding():
    x = jnp.zeros((130,), jnp.float32)     # forces a padded block
    q = quantize_blockwise(x, block=128)
    y = dequantize_blockwise(q, x.shape)
    np.testing.assert_array_equal(np.asarray(y), 0.0)
    assert q.q.shape == (2, 128)


def test_50_step_parity_with_fp32_adamw(rng):
    """Rosenbrock-ish quadratic trajectory: int8-state AdamW should track
    fp32-state AdamW closely over 50 steps (the verdict's done-criterion)."""
    target = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    params0 = {"w": jnp.asarray(rng.standard_normal((8, 32)), jnp.float32),
               "b": jnp.zeros((32,), jnp.float32)}

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    def run(tx):
        p = params0
        state = tx.init(p)
        step = jax.jit(lambda p, s: _step(tx, p, s))
        for _ in range(50):
            p, state = step(p, state)
        return p

    def _step(tx, p, s):
        g = jax.grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    # realistic fine-tune lr: trajectories track pointwise (max ref movement
    # here is ~0.05, divergence stays below 20% of it)
    ref = run(optax.adamw(1e-3))
    ours = run(adamw8bit(1e-3))
    np.testing.assert_allclose(np.asarray(ours["w"]), np.asarray(ref["w"]),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(ours["b"]), np.asarray(ref["b"]),
                               atol=1e-2)
    # aggressive lr: loss parity within 2% even where pointwise paths wander
    ref_hi = run(optax.adamw(1e-2))
    ours_hi = run(adamw8bit(1e-2))
    l_ref, l_ours = float(loss_fn(ref_hi)), float(loss_fn(ours_hi))
    assert abs(l_ours - l_ref) < 0.02 * l_ref, (l_ours, l_ref)
    assert l_ours < 0.6 * float(loss_fn(params0))


def test_state_memory_reduction(rng):
    params = {"w": jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)}
    fp32_state = optax.adamw(1e-3).init(params)
    int8_state = adamw8bit(1e-3).init(params)
    b32, b8 = state_bytes(fp32_state), state_bytes(int8_state)
    # two fp32 moments (8 B/param) -> int8 + 1/256 fp32 scales (~2.03 B/param)
    assert b8 < b32 / 3.5, (b8, b32)


def test_masked_train_step_with_8bit_adam():
    """adamw8bit slots into make_train_step via TrainConfig(optimizer=...)."""
    from tests.helpers import FLUX_TINY, VAE_TINY
    from textflux_tpu.models.transformer import init_flux_params
    from textflux_tpu.models.vae import init_vae_params
    from textflux_tpu.training import train as TR

    tc = TR.TrainConfig(optimizer="adamw8bit", grad_accum=1,
                        excluded_single_layers=())
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    mask = TR.attn_only_mask(params, FLUX_TINY, tc)
    tx = TR.make_optimizer(tc, mask)
    step = TR.make_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla")
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((1, 2, 32, 32, 3)), jnp.float32),
        "mask": jnp.asarray((rng.random((1, 2, 32, 32)) > 0.8), jnp.float32),
        "txt": jnp.asarray(rng.standard_normal((1, 2, 6, 32)), jnp.float32),
        "pooled": jnp.asarray(rng.standard_normal((1, 2, 16)), jnp.float32),
    }
    new_params, new_state, metrics = jax.jit(step)(
        params, opt_state, mask, vae_params, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    # masked leaves unchanged; trainable attention leaves moved
    assert np.allclose(np.asarray(new_params["img_in"]["w"]),
                       np.asarray(params["img_in"]["w"]))
    moved = np.abs(np.asarray(new_params["double"]["img_qkv"]["w"])
                   - np.asarray(params["double"]["img_qkv"]["w"])).max()
    assert moved > 0
