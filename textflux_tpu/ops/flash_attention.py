"""Pallas TPU flash attention for the MM-DiT joint sequence.

Replaces the reference's torch SDPA call (attention_processor.py:2039) with an
online-softmax kernel: per (batch, head, q-block) grid cell, K/V stream through
VMEM in blocks with running max/sum, so the (S x S) score matrix is never
materialized in HBM. QK^T and PV run on the MXU with float32 accumulation;
the softmax runs in float32 on the VPU.

Sequence padding: inputs pad up to the block size and padded keys mask away via
`kv_len` (queries beyond the true length produce garbage rows that callers
slice off — the pipeline always slices to the true token count).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (Bq, D)
    seq_padded = k_ref.shape[2]
    nk = seq_padded // block_k
    bq, d = q.shape

    m0 = jnp.full((bq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, 0, pl.ds(i * block_k, block_k), :]   # (Bk, D)
        vb = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (Bq, Bk)
        col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(col < kv_len, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("kv_len", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_len: Optional[int] = None,
    block_q: int = 1024,   # tuned on v5e @ S~1700-5000: ~85% MXU, 3.7x XLA SDPA
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Non-causal multi-head attention over BSHD tensors.

    Args:
      q, k, v: (B, S, H, D).
      kv_len: true key length; keys at index >= kv_len are masked out.
    """
    b, s, h, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv_len = int(kv_len) if kv_len is not None else s
    scale = 1.0 / math.sqrt(d)
    # don't let tiny sequences pay for a full oversized q block
    block_q = min(block_q, max(128, -(-s // 128) * 128))
    block_k = min(block_k, max(128, -(-s // 128) * 128))

    # (B, H, S, D) blocked layout
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, block_k)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, block_k)
    sq, sk = qt.shape[2], kt.shape[2]

    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=kv_len, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda ib, ih, iq: (ib, ih, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk, d), lambda ib, ih, iq: (ib, ih, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qt.size + kt.size + vt.size + b * h * sq * d) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qt, kt, vt)

    return out[:, :, :s].transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Fused RMSNorm + RoPE + attention kernel
# ---------------------------------------------------------------------------

def _norm_rope(x, scale_row, cos, sin, eps: float):
    """fp32 per-head RMSNorm + rotate-half RoPE on a (rows, D) tile."""
    rows, d = x.shape
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps) * scale_row
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1)
    sign = jnp.where(col < d // 2, -1.0, 1.0)
    rot = pltpu.roll(x, d // 2, axis=1) * sign
    return x * cos + rot * sin


def _fused_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                  qs_ref, ks_ref, o_ref, *, block_k: int, kv_len: int,
                  scale: float, eps: float):
    # refs view the (B, S, H*D) layout with a 128-wide head column slice
    bq, d = q_ref.shape[1], q_ref.shape[2]
    q = _norm_rope(q_ref[0].astype(jnp.float32), qs_ref[:],
                   cq_ref[:], sq_ref[:], eps) * scale
    q = q.astype(v_ref.dtype)

    seq_padded = k_ref.shape[1]
    nk = seq_padded // block_k

    m0 = jnp.full((bq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = _norm_rope(
            k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32),
            ks_ref[pl.ds(i * block_k, block_k), :],
            ck_ref[pl.ds(i * block_k, block_k), :],
            sk_ref[pl.ds(i * block_k, block_k), :],
            eps,
        ).astype(v_ref.dtype)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(col < kv_len, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "block_q", "block_k",
                                             "eps", "interpret"))
def flash_attention_qk_norm_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    q_scale: jnp.ndarray,
    k_scale: jnp.ndarray,
    *,
    kv_len: Optional[int] = None,
    block_q: int = 1024,
    block_k: int = 512,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fully fused attention: per-head RMSNorm + rotate-half RoPE + online
    softmax, reading/writing the model's native BSHD layout directly (no
    transposes or separate norm/rope HBM passes).

    Requires features in the rotate-half permutation (see
    textflux_tpu.ops.rope.half_permutation — folded into qkv weight columns at
    load time) with rope_tables_half tables.

    Args:
      q, k, v: (B, S, H, D) — q, k raw (pre-norm, pre-rope).
      cos, sin: (S, D) float32 rotate-half tables.
      q_scale, k_scale: RMSNorm scales (already permuted): (D,) shared, or
        (S, D) row tables when the scale differs by sequence segment (the
        double-stream blocks use different txt/img norms).
    """
    b, s, h, d = q.shape
    if q_scale.ndim == 1:
        q_scale = jnp.broadcast_to(q_scale[None, :], (s, d))
    if k_scale.ndim == 1:
        k_scale = jnp.broadcast_to(k_scale[None, :], (s, d))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv_len = int(kv_len) if kv_len is not None else s
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(128, -(-s // 128) * 128))
    block_k = min(block_k, max(128, -(-s // 128) * 128))

    blk = max(block_q, block_k)
    # (B, S, H, D) -> (B, Sp, H*D): free reshape; heads become 128-col slices
    qp = _pad_to(q.reshape(b, s, h * d), 1, blk)
    kp = _pad_to(k.reshape(b, s, h * d), 1, blk)
    vp = _pad_to(v.reshape(b, s, h * d), 1, blk)
    cosp = _pad_to(cos.astype(jnp.float32), 0, blk)
    sinp = _pad_to(sin.astype(jnp.float32), 0, blk)
    qsp = _pad_to(q_scale.astype(jnp.float32), 0, blk)
    ksp = _pad_to(k_scale.astype(jnp.float32), 0, blk)
    sp = qp.shape[1]

    kernel = functools.partial(_fused_kernel, block_k=block_k, kv_len=kv_len,
                               scale=scale, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, ih, iq: (ib, iq, ih),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda ib, ih, iq: (ib, 0, ih),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda ib, ih, iq: (ib, 0, ih),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda ib, ih, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda ib, ih, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, d), lambda ib, ih, iq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, d), lambda ib, ih, iq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), lambda ib, ih, iq: (iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, d), lambda ib, ih, iq: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, ih, iq: (ib, iq, ih),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=interpret,
    )(qp, kp, vp, cosp, sinp, cosp, sinp, qsp, ksp)

    return out[:, :s].reshape(b, s, h, d)
