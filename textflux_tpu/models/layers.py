"""Shared functional building blocks (param-pytree style).

All linears store weights as (in, out) so application is ``x @ w + b`` — the
natural MXU layout. Norms compute in float32 and cast back to the activation
dtype (matching the reference's mixed-precision behavior).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def dense_init(key: jax.Array, d_in: int, d_out: int, *, bias: bool = True, scale: Optional[float] = None):
    if scale is None:
        scale = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def dense(p, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q8a8" in p:
        y = _dense_w8a8(p, x)
    elif "w_q" in p:
        # weight-only int8: per-output-column scales, dequant fused into the
        # matmul producer (halves weight HBM footprint/traffic)
        w = p["w_q"].astype(x.dtype) * p["scale"][..., None, :].astype(x.dtype)
        y = x @ w
    elif "w_nf4" in p:
        # NF4 memory mode: codebook lookup + per-64-row absmax (quarter
        # weight footprint). Half-split packing -> two clean matmuls, no
        # row interleave (io/quantize.py)
        from textflux_tpu.io.quantize import nf4_halves

        w_top, w_bot = nf4_halves(p, x.dtype)
        half = w_top.shape[-2]
        y = x[..., :half] @ w_top + x[..., half:] @ w_bot
    else:
        y = x @ p["w"].astype(x.dtype)
    if "lora_a" in p:
        # parallel low-rank branch (QLoRA-style): y += (x@A)@B with the
        # alpha/rank scale folded into A by training.train.lora_insert —
        # the frozen base (bf16 OR int8/NF4 dequant-on-read) is never
        # materialized as base + A@B
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    if "lora_ga" in p:
        # GROUPED per-module branches on a fused projection (the reference's
        # independent peft adapters for to_q/to_k/to_v): a (M, in, r),
        # b (M, r, d); deltas land on the leading M*d output columns, the
        # fused mlp tail (single-block linear1) gets none
        ga = p["lora_ga"].astype(x.dtype)
        gb = p["lora_gb"].astype(x.dtype)
        t = jnp.einsum("...i,mir->...mr", x, ga)
        delta = jnp.einsum("...mr,mrd->...md", t, gb)
        delta = delta.reshape(*delta.shape[:-2], -1)
        pad = y.shape[-1] - delta.shape[-1]
        if pad:
            delta = jnp.concatenate(
                [delta, jnp.zeros((*delta.shape[:-1], pad), delta.dtype)], -1)
        y = y + delta
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _dense_w8a8(p, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-token int8 activations x per-output-channel int8 weights,
    accumulated in int32 on the MXU (2x bf16 peak on v5e), rescaled by
    (act_scale * weight_scale). Weight layout: w_q8a8 (..., in, out) int8,
    scale (..., out) fp32.

    (The activation-quant chain's HBM cost was probed two ways — a one-pass
    Pallas row-quant kernel, and a full Pallas W8A8 matmul with fused
    calibration; both measured at-or-worse than this plain XLA chain at the
    model level. See ARCHITECTURE.md "measured non-wins".)"""
    w_q = p["w_q8a8"]
    if w_q.ndim == 2:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        xf = x2.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * s * p["scale"][None, :]
        y = y.reshape(*lead, w_q.shape[-1])
    else:
        # stacked weights (L, in, out) against (L, ..., in) activations
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("l...i,lio->l...o", xq, w_q,
                         preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * s * p["scale"][..., None, :]
    return y.astype(x.dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-free LayerNorm in float32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with learned scale, variance in float32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * scale.astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding, [cos | sin] order (flip_sin_to_cos=True, shift=0).

    Mirrors get_timestep_embedding (/root/reference/diffusers/.../embeddings.py:27-79)
    but computes in float32 regardless of activation dtype.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_init(key: jax.Array, d_in: int, d_hidden: int, d_out: int):
    k1, k2 = jax.random.split(key)
    return {"fc1": dense_init(k1, d_in, d_hidden), "fc2": dense_init(k2, d_hidden, d_out)}
