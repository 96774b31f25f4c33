"""Sampler parity vs the reference schedulers (Euler flow-match + AMO overshoot)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.ops import samplers


def test_calculate_shift_matches_reference_formula():
    # pipeline_flux_fill.py:1248-1260
    mu = samplers.calculate_shift(4608, 256, 4096, 0.5, 1.15)
    m = (1.15 - 0.5) / (4096 - 256)
    assert abs(mu - (4608 * m + (0.5 - m * 256))) < 1e-12


def test_schedule_matches_reference(torch_oracle):
    from diffusers import FlowMatchEulerDiscreteScheduler

    steps, seq_len = 30, 1024
    sched = FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, use_dynamic_shifting=True,
        base_shift=0.5, max_shift=1.15, base_image_seq_len=256, max_image_seq_len=4096,
    )
    mu = samplers.calculate_shift(seq_len)
    ref_sigmas = np.linspace(1.0, 1 / steps, steps)
    sched.set_timesteps(steps, sigmas=ref_sigmas, mu=mu)
    ours = samplers.make_schedule(steps, seq_len)
    np.testing.assert_allclose(ours, sched.sigmas.numpy(), atol=1e-6)


def test_schedule_static_shift(torch_oracle):
    from diffusers import FlowMatchEulerDiscreteScheduler

    # the pipeline always feeds explicit sigmas = linspace(1, 1/n) (pipeline_flux_fill.py:2049)
    sched = FlowMatchEulerDiscreteScheduler(num_train_timesteps=1000, shift=3.0)
    sched.set_timesteps(sigmas=np.linspace(1.0, 1 / 20, 20))
    ours = samplers.make_schedule(20, use_dynamic_shifting=False, shift=3.0)
    np.testing.assert_allclose(ours, sched.sigmas.numpy(), atol=1e-6)


def test_euler_step_matches_reference(torch_oracle, rng):
    import torch
    from diffusers import FlowMatchEulerDiscreteScheduler

    sched = FlowMatchEulerDiscreteScheduler(num_train_timesteps=1000, shift=1.0)
    sched.set_timesteps(10)
    x = rng.standard_normal((1, 16, 8)).astype(np.float32)
    v = rng.standard_normal((1, 16, 8)).astype(np.float32)
    t = sched.timesteps[3]
    sched._step_index = None
    ref = sched.step(torch.from_numpy(v), t, torch.from_numpy(x)).prev_sample.numpy()

    sig = sched.sigmas.numpy()
    ours = np.asarray(samplers.euler_step(jnp.asarray(x), jnp.asarray(v), sig[3], sig[4]))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_overshoot_step_matches_reference(torch_oracle, rng):
    """Match the AMO update exactly by injecting the same Gaussian draw."""
    import torch
    from diffusers import StochasticRFOvershotDiscreteScheduler

    steps = 10
    sched = StochasticRFOvershotDiscreteScheduler(num_train_timesteps=1000, shift=1.0)
    sched.set_timesteps(steps)
    sched.set_c(2.0)
    sched.set_overshot_func(lambda t, dt: t + dt)

    x = rng.standard_normal((1, 16, 8)).astype(np.float32)
    v = rng.standard_normal((1, 16, 8)).astype(np.float32)
    sig = sched.sigmas.numpy()

    for idx in [0, 4, steps - 1]:
        sched._step_index = idx
        t = sched.timesteps[idx]
        torch.manual_seed(1234)
        ref = sched.step(torch.from_numpy(v), t, torch.from_numpy(x)).prev_sample.numpy()
        torch.manual_seed(1234)
        noise = torch.randn((1, 16, 8)).numpy()

        # recompute our step with the oracle's noise: replicate via direct formula
        tt = 1.0 - sig[idx]
        step = sig[idx] - sig[idx + 1]
        t_next = min(tt + step, 1.0)
        t_over = min(t_next + 2.0 * step, 1.0)
        x_over = x + (t_over - tt) * (-v)
        a = t_next / t_over
        b = np.sqrt(max((1 - t_next) ** 2 - (a - t_next) ** 2, 0.0))
        ours = a * x_over + b * noise
        np.testing.assert_allclose(ours, ref, atol=1e-5)

        # and check our jax implementation agrees in distribution parameters:
        # with zero noise the deterministic parts must agree
        key = jax.random.PRNGKey(0)
        det_ref = a * x_over
        got = np.asarray(
            samplers.overshoot_step(jnp.asarray(x), jnp.asarray(v), sig[idx], sig[idx + 1], key, c=2.0)
        )
        # subtract our own noise contribution to isolate the deterministic part
        noise_ours = np.asarray(jax.random.normal(key, x.shape, dtype=jnp.float32))
        np.testing.assert_allclose(got - b * noise_ours, det_ref, atol=1e-5)


def test_overshoot_final_step_is_deterministic():
    """At the last step sigma_next=0 => t_next=1 => b=0: no noise is injected."""
    sig = samplers.make_schedule(5, 1024)
    x = jnp.ones((1, 4, 4))
    v = jnp.ones((1, 4, 4)) * 0.5
    out1 = samplers.overshoot_step(x, v, sig[-2], sig[-1], jax.random.PRNGKey(0))
    out2 = samplers.overshoot_step(x, v, sig[-2], sig[-1], jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-7)


def test_scale_noise():
    x = jnp.ones((2, 3))
    n = jnp.zeros((2, 3))
    out = samplers.scale_noise(x, 0.25, n)
    np.testing.assert_allclose(np.asarray(out), 0.75)


def test_train_sigmas_match_reference(torch_oracle):
    import torch
    from diffusers import FlowMatchEulerDiscreteScheduler

    sched = FlowMatchEulerDiscreteScheduler(num_train_timesteps=1000, shift=3.0)
    u = np.array([0.0, 0.1, 0.5, 0.9, 0.999])
    indices = (u * 1000).astype(np.int64)
    ref_t = sched.timesteps[torch.from_numpy(indices)]
    ref_sigmas = np.array([sched.sigmas[(sched.timesteps == t).nonzero()[0].item()] for t in ref_t])
    ours = np.asarray(samplers.train_sigmas(jnp.asarray(u), 1000, shift=3.0))
    np.testing.assert_allclose(ours, ref_sigmas, atol=1e-6)


@pytest.mark.parametrize("scheme", ["none", "sigma_sqrt", "cosmap"])
def test_loss_weighting(torch_oracle, scheme):
    from diffusers.training_utils import compute_loss_weighting_for_sd3
    import torch

    sig = np.array([0.1, 0.5, 0.9], dtype=np.float32)
    ref = compute_loss_weighting_for_sd3(scheme, torch.from_numpy(sig)).numpy()
    ours = np.asarray(samplers.loss_weighting(scheme, jnp.asarray(sig)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_overshoot_spatial_reduces_to_scalar():
    """A constant c_map must equal the scalar overshoot step."""
    rng_l = np.random.default_rng(3)
    x = jnp.asarray(rng_l.standard_normal((2, 8, 4)), jnp.float32)
    v = jnp.asarray(rng_l.standard_normal((2, 8, 4)), jnp.float32)
    key = jax.random.PRNGKey(1)
    a = samplers.overshoot_step(x, v, 0.6, 0.5, key, c=2.0)
    b = samplers.overshoot_step_spatial(x, v, 0.6, 0.5, key, jnp.full((2, 8), 2.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_overshoot_spatial_zero_map_is_plain_noise_step():
    """c_map = 0 -> overshoot to t_next exactly (a=1 path with re-noising)."""
    rng_l = np.random.default_rng(4)
    x = jnp.asarray(rng_l.standard_normal((1, 4, 4)), jnp.float32)
    v = jnp.asarray(rng_l.standard_normal((1, 4, 4)), jnp.float32)
    key = jax.random.PRNGKey(0)
    out = samplers.overshoot_step_spatial(x, v, 0.6, 0.5, key, jnp.zeros((1, 4)))
    # with c=0: t_over = t_next, a=1, b=0 => plain euler step
    ref = samplers.euler_step(x, v, 0.6, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
