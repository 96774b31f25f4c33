"""Flow-matching samplers: Euler and AMO stochastic overshoot.

Stateless, jit-friendly step functions over a precomputed sigma schedule:
the whole denoise loop runs as a ``lax.scan`` with the per-step RNG key
threaded explicitly (the overshoot sampler consumes fresh Gaussian noise at
every step).

Behavioral parity references:
  Euler update:      /root/reference/diffusers/.../scheduling_flow_match_euler_discrete.py:327
  dynamic shift:     /root/reference/diffusers/.../pipeline_flux_fill.py:1248-1260
  AMO overshoot:     /root/reference/diffusers/.../scheduling_stochastic_rf_discrete_overshot.py:246-357
  timestep sampling: /root/reference/diffusers/src/diffusers/training_utils.py:250-286
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Resolution-dependent schedule shift (mu) for the exponential time shift."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def make_schedule(
    num_steps: int,
    image_seq_len: Optional[int] = None,
    *,
    shift: float = 1.0,
    use_dynamic_shifting: bool = True,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> np.ndarray:
    """Sigma schedule of length num_steps+1 (terminal 0 appended), host-side.

    With dynamic shifting (the FLUX fill default), sigmas are warped by
    sigma' = e^mu / (e^mu + (1/sigma - 1)); otherwise by the static shift
    sigma' = shift*s / (1 + (shift-1)*s).
    """
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if use_dynamic_shifting:
        if image_seq_len is None:
            raise ValueError("image_seq_len is required for dynamic shifting")
        mu = calculate_shift(image_seq_len, base_seq_len, max_seq_len, base_shift, max_shift)
        sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0) ** 1.0)
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return np.append(sigmas, 0.0).astype(np.float32)


def euler_step(x: jnp.ndarray, v: jnp.ndarray, sigma: jnp.ndarray, sigma_next: jnp.ndarray) -> jnp.ndarray:
    """Rectified-flow Euler: x <- x + (sigma_next - sigma) * v, fp32 internally."""
    xf = x.astype(jnp.float32)
    out = xf + (sigma_next - sigma) * v.astype(jnp.float32)
    return out.astype(x.dtype)


def overshoot_step(
    x: jnp.ndarray,
    v: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
    key: jax.Array,
    c: float = 2.0,
) -> jnp.ndarray:
    """AMO stochastic overshoot step (overshoot function t, dt -> t + dt).

    Advance the ODE past the target time to t_over = min(t_next + c*dt, 1), then
    re-noise back so the marginal lands at t_next:
        x' = (t_next / t_over) * x_over + sqrt((1-t_next)^2 - (a - t_next)^2) * eps
    where a = t_next/t_over. Velocity convention: dx/dsigma = v, i.e. time t = 1 - sigma
    moves against sigma, hence x_over = x + (t_over - t) * (-v).
    """
    xf = x.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    t = 1.0 - sigma
    step = sigma - sigma_next
    t_next = jnp.minimum(t + step, 1.0)
    t_over = jnp.minimum(t_next + c * step, 1.0)
    x_over = xf + (t_over - t) * (-vf)
    a = t_next / t_over
    b = jnp.sqrt(jnp.maximum((1.0 - t_next) ** 2 - (a - t_next) ** 2, 0.0))
    noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
    out = a * x_over + b * noise
    return out.astype(x.dtype)


def overshoot_step_spatial(
    x: jnp.ndarray,
    v: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
    key: jax.Array,
    c_map: jnp.ndarray,
) -> jnp.ndarray:
    """Spatially-varying AMO overshoot: per-token overshoot strength.

    Implements the reference scheduler's dormant attention-map branch
    (scheduling_stochastic_rf_discrete_overshot.py:316-338) in packed token
    space: c_map (B, T) weights the overshoot per token (e.g. stronger inside
    the text-edit region). c_map == c everywhere reduces to overshoot_step.
    """
    xf = x.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    t = 1.0 - sigma
    step = sigma - sigma_next
    t_next = jnp.minimum(t + step, 1.0)
    dt_over = step * c_map.astype(jnp.float32)[..., None]
    t_over = jnp.minimum(t_next + dt_over, 1.0)
    x_over = xf + (t_over - t) * (-vf)
    a = t_next / t_over
    b = jnp.sqrt(jnp.maximum((1.0 - t_next) ** 2 - (a - t_next) ** 2, 0.0))
    noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
    return (a * x_over + b * noise).astype(x.dtype)


def scale_noise(x: jnp.ndarray, sigma: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Flow-matching forward process: x_sigma = (1 - sigma) * x + sigma * noise."""
    return (1.0 - sigma) * x + sigma * noise


# ---------------------------------------------------------------------------
# Training-time timestep sampling / loss weighting
# ---------------------------------------------------------------------------

def sample_timestep_density(
    key: jax.Array,
    batch_size: int,
    scheme: str = "none",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> jnp.ndarray:
    """Sample u in (0,1) controlling the noise level (SD3 density schemes)."""
    if scheme == "logit_normal":
        u = jax.random.normal(key, (batch_size,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        return 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2.0) ** 2 - 1.0 + u)
    return jax.random.uniform(key, (batch_size,))


def train_sigmas(u: jnp.ndarray, num_train_timesteps: int = 1000, shift: float = 3.0) -> jnp.ndarray:
    """Map density samples u to schedule sigmas, matching the trainer's
    index-into-shifted-schedule lookup (scripts/train.py:975-981).

    The discrete schedule is sigmas[i] = shifted((1000 - i)/1000) for i in [0, 1000);
    indices = floor(u * 1000).
    """
    indices = jnp.clip((u * num_train_timesteps).astype(jnp.int32), 0, num_train_timesteps - 1)
    base = (num_train_timesteps - indices).astype(jnp.float32) / num_train_timesteps
    return shift * base / (1.0 + (shift - 1.0) * base)


def loss_weighting(scheme: str, sigmas: jnp.ndarray) -> jnp.ndarray:
    """Per-sample loss weights for flow-matching training."""
    if scheme == "sigma_sqrt":
        return sigmas ** -2.0
    if scheme == "cosmap":
        return 2.0 / (jnp.pi * (1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2))
    return jnp.ones_like(sigmas)
