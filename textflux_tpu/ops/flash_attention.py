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

# exp2-based online softmax: the 1/sqrt(d) scale additionally folds log2(e)
# into the QK product, so the per-tile softmax runs exp2 directly instead of
# exp (= exp2(x*log2e) with an extra N^2 VPU multiply). exp2(s2-m2) ==
# exp(s-m) exactly in the normalized ratio, so outputs are unchanged up to
# fp32 rounding.
LOG2_E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  block_k: int, kv_len: int, scale: float, n_chunks: int):
    """Hybrid flash: the innermost ('arbitrary') grid dim streams LARGE K/V
    chunks through VMEM; inside one invocation a fori_loop walks block_k
    sub-blocks with the running max/sum/acc in REGISTERS, touching the VMEM
    scratch only once per chunk. At n_chunks == 1 this is the classic
    single-pass kernel; VMEM use is O(block_q*D + kv_chunk*D), independent of
    total sequence length."""
    # n_chunks == 1 compiles a 3-dim grid (no chunk dim, no scratch traffic —
    # the classic single-pass kernel); > 1 adds the innermost 'arbitrary' dim
    ic = pl.program_id(3) if n_chunks > 1 else 0
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (Bq, D)
    bq, d = q.shape
    kv_chunk = k_ref.shape[2]
    base = ic * kv_chunk

    if n_chunks > 1:                                     # static branch
        @pl.when(ic == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, 0, pl.ds(i * block_k, block_k), :]   # (Bk, D)
        vb = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (Bq, Bk)
        if kv_len < n_chunks * kv_chunk:  # static: exact-fit seqs skip masking
            col = base + i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(col < kv_len, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)      # logits pre-scaled by log2(e): == exp
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    if n_chunks == 1:
        # single-pass: carries live purely in registers, scratch untouched
        carry0 = (jnp.full((bq, 1), -1e30, jnp.float32),
                  jnp.zeros((bq, 1), jnp.float32),
                  jnp.zeros((bq, d), jnp.float32))
        m, l, acc = jax.lax.fori_loop(0, kv_chunk // block_k, body, carry0)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    carry0 = (m_scr[:, :1], l_scr[:, :1], acc_scr[...])
    m, l, acc = jax.lax.fori_loop(0, kv_chunk // block_k, body, carry0)

    @pl.when(ic == n_chunks - 1)
    def _finish():
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    @pl.when(ic < n_chunks - 1)
    def _carry():
        m_scr[...] = jnp.broadcast_to(m, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l, l_scr.shape)
        acc_scr[...] = acc


def _auto_block(s: int, lo: int = 256, hi: int = 1024) -> int:
    """Block size (multiple of 8 in [lo, hi]) minimizing the padded sequence
    — exact-fit blocks measured ~25% faster than power-of-2 defaults at the
    serving sequence (S=1696: 848/424 at 447-483 us vs 1024/512 at 627 us);
    ties break toward the largest block (fewest grid cells)."""
    best_key, best_b = None, hi
    for b8 in range(lo, hi + 1, 8):
        padded = -(-s // b8) * b8
        key = (padded, -b8)
        if best_key is None or key < best_key:
            best_key, best_b = key, b8
    return best_b


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# Measured single-pass ceiling of the PLAIN forward kernel (bf16 K/V only,
# no fp32 rope/scale tables, hence higher than the fused kernel's).
# vmem_budget.py imports this — the literal is defined once, here.
SINGLE_PASS_MAX_PLAIN = 12288


@functools.partial(jax.jit, static_argnames=("kv_len", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_len: Optional[int] = None,
    block_q: Optional[int] = None,   # None: exact-fit auto-selection
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Non-causal multi-head attention over BSHD tensors.

    Args:
      q, k, v: (B, S, H, D).
      kv_len: true key length; keys at index >= kv_len are masked out.
    """
    b, s, h, d = q.shape
    if block_q is None:
        # single-pass: minimize padding; chunked (s > limit): power-of-2
        # blocks that divide the fixed chunk
        block_q = _auto_block(s) if s <= SINGLE_PASS_MAX_PLAIN else 1024
    if block_k is None:
        block_k = block_q if s <= SINGLE_PASS_MAX_PLAIN else 512
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv_len = int(kv_len) if kv_len is not None else s
    scale = LOG2_E / math.sqrt(d)   # exp2 softmax: log2(e) folded in
    # don't let tiny sequences pay for a full oversized q block
    block_q = min(block_q, max(128, -(-s // 128) * 128))
    block_k = min(block_k, max(128, -(-s // 128) * 128))

    # (B, H, S, D) blocked layout
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, block_k)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, block_k)
    sq, sk = qt.shape[2], kt.shape[2]

    # chunk of keys resident in VMEM per grid step: the whole (padded)
    # sequence while K/V fit VMEM comfortably (single-pass kernel — chunking
    # measured 1.9x slower when unnecessary), streamed in 4096-token chunks
    # beyond that (the old whole-KV layout stopped compiling ~16k)
    kv_chunk = sk if sk <= SINGLE_PASS_MAX_PLAIN else 4096
    sk_pad = -(-sk // kv_chunk) * kv_chunk
    if sk_pad != sk:
        kt = _pad_to(kt, 2, kv_chunk)
        vt = _pad_to(vt, 2, kv_chunk)
        sk = sk_pad
    n_chunks = sk // kv_chunk
    if kv_chunk % block_k or sq % block_q:
        raise ValueError(
            f"blocks (q={block_q}, k={block_k}) must divide the padded "
            f"sequence/chunk ({sq}/{kv_chunk}): floored trip counts would "
            "silently drop tail tokens")
    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=kv_len,
                               scale=scale, n_chunks=n_chunks)
    if n_chunks == 1:
        grid = (b, h, sq // block_q)
        q_map = lambda ib, ih, iq: (ib, ih, iq, 0)
        kv_map = lambda ib, ih, iq: (ib, ih, 0, 0)
        semantics = ("parallel", "parallel", "parallel")
    else:
        grid = (b, h, sq // block_q, n_chunks)
        q_map = lambda ib, ih, iq, ic: (ib, ih, iq, 0)
        kv_map = lambda ib, ih, iq, ic: (ib, ih, ic, 0)
        semantics = ("parallel", "parallel", "parallel", "arbitrary")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_chunk, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_chunk, d), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),     # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
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
# Backward kernels (training): dQ / dK / dV without materializing S^2 scores
# ---------------------------------------------------------------------------

def _lse_kernel(q_ref, k_ref, l_ref, m_scr, l_scr, *, block_k: int,
                kv_len: int, scale: float, n_chunks: int,
                need_mask: bool = True):
    """Row log-sum-exp of the score matrix: L_i = m_i + log sum_j e^{s_ij - m_i}.
    Output is lane-replicated (bq, 128) so the block layout stays tile-legal.
    K streams in chunks (innermost 'arbitrary' grid dim) when n_chunks > 1."""
    ic = pl.program_id(3) if n_chunks > 1 else 0
    q = q_ref[0].astype(jnp.float32) * scale
    bq = q.shape[0]
    kv_chunk = k_ref.shape[1]
    base = ic * kv_chunk

    def body(i, carry):
        m, l = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if need_mask:  # static: exact-fit sequences skip masking entirely
            col = base + i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(col < kv_len, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new), axis=-1, keepdims=True)
        return m_new, l

    if n_chunks == 1:
        m0 = jnp.full((bq, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        m, l = jax.lax.fori_loop(0, kv_chunk // block_k, body, (m0, l0))
        l_ref[0] = jnp.broadcast_to(m + jnp.log(jnp.maximum(l, 1e-30)), (bq, 128))
        return

    @pl.when(ic == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)

    m, l = jax.lax.fori_loop(0, kv_chunk // block_k, body,
                             (m_scr[:, :1], l_scr[:, :1]))
    m_scr[...] = jnp.broadcast_to(m, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l, l_scr.shape)

    @pl.when(ic == n_chunks - 1)
    def _finish():
        l_ref[0] = jnp.broadcast_to(m + jnp.log(jnp.maximum(l, 1e-30)), (bq, 128))


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dq_ref, acc_scr,
               *, block_k: int, kv_len: int, scale: float, n_chunks: int,
               need_mask: bool = True):
    ic = pl.program_id(3) if n_chunks > 1 else 0
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    dvec = dvec_ref[0][:, :1]
    bq, d = q.shape
    kv_chunk = k_ref.shape[1]
    base = ic * kv_chunk

    def body(i, acc):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if need_mask:  # static: exact-fit sequences skip masking entirely
            col = base + i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            p = jnp.where(col < kv_len, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dvec)
        return acc + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, kv_chunk // block_k, body,
                            jnp.zeros((bq, d), jnp.float32))
    if n_chunks == 1:
        dq_ref[0] = (acc * scale).astype(dq_ref.dtype)
        return

    @pl.when(ic == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += acc

    @pl.when(ic == n_chunks - 1)
    def _finish():
        dq_ref[0] = (acc_scr[...] * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, block_q: int, kv_len: int, scale: float,
                n_chunks: int, need_mask: bool = True):
    ic = pl.program_id(3) if n_chunks > 1 else 0
    kb = k_ref[0].astype(jnp.float32)
    vb = v_ref[0].astype(jnp.float32)
    bk, d = kb.shape
    nq = q_ref.shape[1] // block_q
    j0 = pl.program_id(2) * bk
    if need_mask:  # static: exact-fit sequences skip masking entirely
        col_valid = (j0 + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)) < kv_len

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        dob = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :][:, :1]
        dvec = dvec_ref[0, pl.ds(i * block_q, block_q), :][:, :1]
        s = jax.lax.dot_general(qb * scale, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if need_mask:
            p = jnp.where(col_valid, jnp.exp(s - lse), 0.0)   # (bq, bk)
        else:
            p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(p, dob, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dvec)
        dk = dk + jax.lax.dot_general(ds, qb, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, nq, body, (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)))
    if n_chunks == 1:
        dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)
        return

    @pl.when(ic == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    dk_scr[...] += dk
    dv_scr[...] += dv

    @pl.when(ic == n_chunks - 1)
    def _finish():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# single-pass while the streamed-side arrays fit VMEM (dkv holds q+do bf16
# plus fp32 lse/dvec lanes: ~8k is the measured ceiling), fixed-size chunks
# beyond — enables 16k+ training sequences
BWD_SINGLE_PASS_MAX_SEQ = 8192
BWD_CHUNK = 2048


def flash_attention_bwd(q, k, v, do, *, kv_len=None, block_q=None,
                        block_k=None, interpret=None):
    """Pallas backward pass: (dq, dk, dv) for non-causal softmax attention.

    Recomputes row log-sum-exp (one extra QK pass) instead of saving softmax
    stats; never materializes the (S x S) score matrix in HBM.
    """
    b, s, h, d = q.shape
    if block_q is None:
        block_q = _auto_block(s, hi=512) if s <= BWD_SINGLE_PASS_MAX_SEQ else 512
    if block_k is None:
        block_k = block_q if s <= BWD_SINGLE_PASS_MAX_SEQ else 512
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv_len = int(kv_len) if kv_len is not None else s
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(128, -(-s // 128) * 128))
    block_k = min(block_k, max(128, -(-s // 128) * 128))
    blk = max(block_q, block_k)

    chunk = None if s <= BWD_SINGLE_PASS_MAX_SEQ else BWD_CHUNK
    pad_to = blk if chunk is None else max(blk, chunk)

    qp = _pad_to(q.reshape(b, s, h * d), 1, pad_to)
    kp = _pad_to(k.reshape(b, s, h * d), 1, pad_to)
    vp = _pad_to(v.reshape(b, s, h * d), 1, pad_to)
    dop = _pad_to(do.reshape(b, s, h * d), 1, pad_to)
    sp = qp.shape[1]
    kv_chunk = sp if chunk is None else chunk
    n_chunks = sp // kv_chunk

    if kv_chunk % block_k or kv_chunk % block_q or sp % block_q or sp % block_k:
        raise ValueError(
            f"blocks (q={block_q}, k={block_k}) must divide the padded "
            f"sequence ({sp}) and chunk ({kv_chunk}): floored trip counts "
            "would silently drop tail tokens")
    if n_chunks == 1:
        g3 = lambda fn: (lambda ib, ih, i: fn(ib, ih, i))
        grid_tail = ()
        semantics_tail = ()
    else:
        g3 = lambda fn: (lambda ib, ih, i, ic: fn(ib, ih, i))
        grid_tail = (n_chunks,)
        semantics_tail = ("arbitrary",)
    # chunk-indexed variants (follow the innermost grid dim)
    if n_chunks == 1:
        c3 = lambda fn: (lambda ib, ih, i: fn(ib, ih, 0))
    else:
        c3 = lambda fn: (lambda ib, ih, i, ic: fn(ib, ih, ic))

    full_c = lambda: pl.BlockSpec((1, kv_chunk, d), c3(lambda ib, ih, ic: (ib, ic, ih)),
                                  memory_space=pltpu.VMEM)
    qblk = lambda: pl.BlockSpec((1, block_q, d), g3(lambda ib, ih, i: (ib, i, ih)),
                                memory_space=pltpu.VMEM)
    kblk = lambda: pl.BlockSpec((1, block_k, d), g3(lambda ib, ih, i: (ib, i, ih)),
                                memory_space=pltpu.VMEM)
    lane_scr = lambda: pltpu.VMEM((block_q, 128), jnp.float32)
    semantics = ("parallel", "parallel", "parallel") + semantics_tail

    # pass 1: row log-sum-exp (lane-replicated), per (b, h)
    need_mask = kv_len < sp
    lse = pl.pallas_call(
        functools.partial(_lse_kernel, block_k=block_k, kv_len=kv_len,
                          scale=scale, n_chunks=n_chunks, need_mask=need_mask),
        grid=(b, h, sp // block_q) + grid_tail,
        in_specs=[qblk(), full_c()],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               g3(lambda ib, ih, i: (ib * h + ih, i, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, 128), jnp.float32),
        scratch_shapes=[lane_scr(), lane_scr()],
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
        interpret=interpret,
    )(qp, kp)

    # D_i = rowsum(dO * O): O recomputed via the forward kernel (cheap vs bwd)
    o = flash_attention(q, k, v, kv_len=kv_len, block_q=block_q, block_k=block_k,
                        interpret=interpret)
    dvec = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (B,S,H)
    dvec = _pad_to(dvec.transpose(0, 2, 1).reshape(b * h, s), 1, pad_to)     # (B*H, Sp)
    dvec = jnp.broadcast_to(dvec[..., None], (b * h, sp, 128)).astype(jnp.float32)
    dvec = jnp.ascontiguousarray(dvec) if hasattr(jnp, "ascontiguousarray") else dvec

    lse_spec_q = pl.BlockSpec((1, block_q, 128),
                              g3(lambda ib, ih, i: (ib * h + ih, i, 0)),
                              memory_space=pltpu.VMEM)
    lse_spec_c = pl.BlockSpec((1, kv_chunk, 128),
                              c3(lambda ib, ih, ic: (ib * h + ih, ic, 0)),
                              memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, kv_len=kv_len,
                          scale=scale, n_chunks=n_chunks, need_mask=need_mask),
        grid=(b, h, sp // block_q) + grid_tail,
        in_specs=[qblk(), full_c(), full_c(), qblk(), lse_spec_q, lse_spec_q],
        out_specs=qblk(),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, dvec)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, kv_len=kv_len,
                          scale=scale, n_chunks=n_chunks, need_mask=need_mask),
        grid=(b, h, sp // block_k) + grid_tail,
        in_specs=[full_c(), kblk(), kblk(), full_c(), lse_spec_c, lse_spec_c],
        out_specs=(kblk(), kblk()),
        out_shape=(jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, dvec)

    unpack = lambda x: x[:, :s].reshape(b, s, h, d)
    return unpack(dq), unpack(dk), unpack(dv)


# ---------------------------------------------------------------------------
# Fused RMSNorm + RoPE + attention kernel
# ---------------------------------------------------------------------------

# Chunked-path (S > 6144) auto-selection envelope, set by IN-MODEL slope
# measurement at the 2048x1024 multi-line serving shape (S=8704, full width,
# W8A8): exact-fit 1088/544, 544/544, and 1088/1088 (chunk 1088 or 2176) all
# time within ~0.7% of each other at depth 12 — the block shape is not a
# lever here (an earlier standalone probe suggesting 26% used
# block_until_ready, which the tunnel mis-reports). The cap that matters is
# compile headroom: 1088/1088+chunk2176 compiles standalone and at depth 12
# but blows the 16 MiB scoped-VMEM stack by 1.34M inside the FULL-depth
# scan (the f32 score tile coexists with the scan body's weight-slice
# prefetch buffers), so block_k caps at 544 — zero measured cost.
CHUNKED_BLOCK_Q_HI = 1088
CHUNKED_BLOCK_K_HI = 544
CHUNK_TARGET = 2048
# Measured single-pass ceiling of the fused whole-KV layout (compile limit;
# chunking below it measured 3.5 -> 6.6 ms at S=4608). vmem_budget.py
# imports this — keep the literal defined ONCE, here, next to the kernel.
SINGLE_PASS_MAX_FUSED = 6144


def fused_auto_blocks(s: int):
    """Auto (block_q, block_k) for flash_attention_qk_norm_rope at seq s:
    single-pass exact-fit below the ceiling, capped exact-fit beyond."""
    if s <= SINGLE_PASS_MAX_FUSED:
        bq = _auto_block(s)
        return bq, bq
    bq = _auto_block(s, lo=512, hi=CHUNKED_BLOCK_Q_HI)
    return bq, min(bq, _auto_block(s, lo=256, hi=CHUNKED_BLOCK_K_HI))


def pick_kv_chunk(sp: int, block_k: int) -> int:
    """Resident K/V chunk for the streaming path: a block_k multiple <= 4096
    (VMEM residency cap), preferring zero kv padding, then closeness to the
    measured-good CHUNK_TARGET."""
    if sp <= SINGLE_PASS_MAX_FUSED:
        return sp
    if block_k > 4096:
        # the m=1 fallback would return kv_chunk=block_k and silently break
        # the residency cap (same failure mode the hoist_k guard rejects)
        raise ValueError(
            f"streaming path (seq {sp} > 6144) requires block_k <= 4096 so a "
            f"whole K/V chunk stays VMEM-resident; got block_k={block_k} — "
            "drop block_k or leave blocks unset for the measured auto-fit")
    best = None
    for m in range(1, max(1, 4096 // block_k) + 1):
        c = m * block_k
        key = (-(-sp // c) * c, abs(c - CHUNK_TARGET))
        if best is None or key < best[0]:
            best = (key, c)
    return best[1]

def _norm_rope(x, cos2, sin2, eps: float):
    """fp32 per-head RMSNorm + rotate-half RoPE on a (rows, D) tile.

    cos2/sin2 are the FOLDED tables built in flash_attention_qk_norm_rope
    (cos2 = scale*cos, sin2 = sign*roll(scale)*sin): the learned RMSNorm
    scale and the rotate-half sign live inside them, so the kernel does only
    var -> rsqrt -> roll -> 2 mul + add (the per-tile iota/sign build and the
    separate scale multiply measured ~0.9 ms/depth-12 step on the VPU).
    out_j = xn_j*cos2_j + roll(xn)_j*sin2_j,  xn = x * rsqrt(mean(x^2)+eps).
    """
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    xn = x * jax.lax.rsqrt(var + eps)
    return xn * cos2 + pltpu.roll(xn, x.shape[1] // 2, axis=1) * sin2


def _fused_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                  o_ref, m_scr, l_scr, acc_scr, *,
                  block_k: int, kv_len: int, scale: float, eps: float,
                  n_chunks: int, hoist_k: bool = False):
    # refs view the (B, S, H*D) layout with a 128-wide head column slice;
    # K/V (+ their folded rope tables) stream in chunks when n_chunks > 1,
    # with running stats carried in scratch (see _flash_kernel)
    ic = pl.program_id(3) if n_chunks > 1 else 0
    bq, d = q_ref.shape[1], q_ref.shape[2]
    kv_chunk = k_ref.shape[1]
    base = ic * kv_chunk
    q = _norm_rope(q_ref[0].astype(jnp.float32),
                   cq_ref[:], sq_ref[:], eps) * scale
    q = q.astype(v_ref.dtype)
    if hoist_k:
        # one whole-chunk VPU pass up front, decoupled from the softmax loop
        kb_all = _norm_rope(k_ref[0].astype(jnp.float32),
                            ck_ref[:], sk_ref[:], eps).astype(v_ref.dtype)

    if n_chunks > 1:
        @pl.when(ic == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    def body(i, carry):
        m, l, acc = carry
        if hoist_k:
            # i is a Python int here (unrolled loop) -> static slices only;
            # Pallas TPU cannot dynamic-slice a kernel *value*
            kb = kb_all[i * block_k:(i + 1) * block_k]
        else:
            kb = _norm_rope(
                k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32),
                ck_ref[pl.ds(i * block_k, block_k), :],
                sk_ref[pl.ds(i * block_k, block_k), :],
                eps,
            ).astype(v_ref.dtype)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if kv_len < n_chunks * kv_chunk:  # static: exact-fit seqs skip masking
            col = base + i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(col < kv_len, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)      # logits pre-scaled by log2(e): == exp
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return m_new, l, acc

    def run(carry0):
        if hoist_k:  # Python-unrolled: body requires static slice indices
            carry = carry0
            for i in range(kv_chunk // block_k):
                carry = body(i, carry)
            return carry
        return jax.lax.fori_loop(0, kv_chunk // block_k, body, carry0)

    if n_chunks == 1:
        carry0 = (jnp.full((bq, 1), -1e30, jnp.float32),
                  jnp.zeros((bq, 1), jnp.float32),
                  jnp.zeros((bq, d), jnp.float32))
        m, l, acc = run(carry0)
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    carry0 = (m_scr[:, :1], l_scr[:, :1], acc_scr[...])
    m, l, acc = run(carry0)

    @pl.when(ic == n_chunks - 1)
    def _finish():
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    @pl.when(ic < n_chunks - 1)
    def _carry():
        m_scr[...] = jnp.broadcast_to(m, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l, l_scr.shape)
        acc_scr[...] = acc


@functools.partial(jax.jit, static_argnames=("kv_len", "block_q", "block_k",
                                             "eps", "interpret", "hoist_k",
                                             "vmem_context"))
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
    block_q: Optional[int] = None,   # None: exact-fit auto-selection
    block_k: Optional[int] = None,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
    hoist_k: Optional[bool] = None,
    vmem_context: Optional[str] = None,
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
      vmem_context: optional name of the co-resident scan body this kernel
        compiles inside (see ops.vmem_budget.CONTEXT_BYTES). When set, block
        auto-selection respects the scoped-VMEM envelope of that program and
        explicit blocks are validated at trace time (a clear ValueError with
        a working suggestion instead of a Mosaic OOM).
    """
    b, s, h, d = q.shape
    if vmem_context is not None and block_q is None and block_k is None:
        # trace-time scoped-VMEM envelope guard (vmem_budget.py): with blocks
        # unset, pick the fastest measured shape that fits the declared
        # co-resident context
        from textflux_tpu.ops.vmem_budget import pick_fused_blocks

        block_q, block_k = pick_fused_blocks(s, context=vmem_context, d=d)
    auto_q, auto_k = fused_auto_blocks(s)
    if block_q is None:
        block_q = auto_q
    if block_k is None:
        block_k = auto_k if block_q == auto_q else block_q
    if q_scale.ndim == 1:
        q_scale = jnp.broadcast_to(q_scale[None, :], (s, d))
    if k_scale.ndim == 1:
        k_scale = jnp.broadcast_to(k_scale[None, :], (s, d))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv_len = int(kv_len) if kv_len is not None else s
    scale = LOG2_E / math.sqrt(d)   # exp2 softmax: log2(e) folded in
    block_q = min(block_q, max(128, -(-s // 128) * 128))
    block_k = min(block_k, max(128, -(-s // 128) * 128))
    if vmem_context is not None:
        # validate the EFFECTIVE blocks — defaults resolved via the kernel's
        # own rule and clamped to the padded sequence, exactly what the grid
        # will use — so a partial explicit spec (block_q only) or an
        # oversized-then-clamped block is judged on what actually runs.
        # hoist_k passes through unresolved: None lets the estimator mirror
        # the kernel's auto-hoist decision below.
        from textflux_tpu.ops.vmem_budget import check_fused_attention

        check_fused_attention(s, block_q, block_k, context=vmem_context,
                              hoist_k=hoist_k, d=d)

    blk = max(block_q, block_k)
    # (B, S, H, D) -> (B, Sp, H*D): free reshape; heads become 128-col slices
    qp = _pad_to(q.reshape(b, s, h * d), 1, blk)
    kp = _pad_to(k.reshape(b, s, h * d), 1, blk)
    vp = _pad_to(v.reshape(b, s, h * d), 1, blk)
    # fold the learned RMSNorm scale and the rotate-half sign into the rope
    # tables (one cheap XLA pass here, saves ~1/3 of the per-tile VPU prep in
    # the kernel): out_j = xn_j*cos2_j + roll(xn)_j*sin2_j with
    # cos2 = scale*cos, sin2 = sign * roll(scale) * sin
    cosf = cos.astype(jnp.float32)
    sinf = sin.astype(jnp.float32)
    sign = jnp.where(jnp.arange(d) < d // 2, -1.0, 1.0).astype(jnp.float32)
    qsf = q_scale.astype(jnp.float32)
    ksf = k_scale.astype(jnp.float32)
    cos_q = _pad_to(cosf * qsf, 0, blk)
    sin_q = _pad_to(sign[None, :] * jnp.roll(qsf, d // 2, axis=-1) * sinf, 0, blk)
    cos_k = cosf * ksf
    sin_k = sign[None, :] * jnp.roll(ksf, d // 2, axis=-1) * sinf
    sp = qp.shape[1]

    # single-pass while K/V + their fp32 rope/scale tables fit VMEM (6144 was
    # the measured compile ceiling of the whole-KV layout; chunking when
    # unnecessary measured 3.5 -> 6.6 ms at S=4608); beyond, stream K/V in
    # block_k-multiple chunks (pick_kv_chunk)
    kv_chunk = pick_kv_chunk(sp, block_k)
    kp = _pad_to(kp, 1, kv_chunk)
    vp = _pad_to(vp, 1, kv_chunk)
    # two-stage pad (blk, then kv_chunk) so the K tables ALWAYS match kp's
    # row count — a single pad to max(blk, kv_chunk) under-pads when blk
    # does not divide kv_chunk (e.g. custom 1792-blocks at s=5400)
    cos_k = _pad_to(_pad_to(cos_k, 0, blk), 0, kv_chunk)
    sin_k = _pad_to(_pad_to(sin_k, 0, blk), 0, kv_chunk)
    n_chunks = kp.shape[1] // kv_chunk
    # hoist_k: one whole-chunk K norm+rope pass before the softmax loop, which
    # then Python-unrolls (static slices of a kernel value). Measured -0.7 ms
    # on the depth-12 serving step; capped at small unroll counts / moderate
    # chunk sizes so the whole-chunk fp32 temporaries can't blow the VMEM
    # stack on long sequences. The cap applies to an explicit hoist_k=True
    # too (it errors instead of silently unrolling outside the envelope).
    # n_chunks == 1 is load-bearing: with streamed K/V the chunk-carried
    # accumulators coexist with the whole-chunk fp32 K temporaries and the
    # kernel exceeds the 16 MiB scoped-VMEM stack (measured at S=8704:
    # 19.2 MiB requested; hoist-off compiles and runs 18.6 ms).
    hoist_ok = n_chunks == 1 and kv_chunk // block_k <= 8 and kv_chunk <= 4096
    if hoist_k is None:
        hoist_k = hoist_ok
    elif hoist_k and not hoist_ok:
        raise ValueError(
            f"hoist_k=True outside the measured envelope (kv_chunk={kv_chunk},"
            f" block_k={block_k}): the Python-unrolled softmax loop would hold"
            f" {kv_chunk // block_k} whole-chunk fp32 temporaries and risk a"
            " Mosaic stack/VMEM blow-up; use hoist_k=None (auto) or shrink the"
            " chunk")

    if kv_chunk % block_k:
        raise ValueError(
            f"block_k={block_k} must divide the resident K chunk "
            f"({kv_chunk}): the softmax loop floors the trip count and "
            "would silently drop tail keys")
    if sp % block_q:
        raise ValueError(f"block_q={block_q} must divide the padded "
                         f"sequence ({sp})")
    # A per-(batch, head) variant sharing the normed K across q-tiles was
    # measured neutral at S=1696 (round 2) and removed (round 3): the hoisted
    # whole-chunk K pass above already deduplicates the K prep per program.
    kernel = functools.partial(_fused_kernel, block_k=block_k, kv_len=kv_len,
                               scale=scale, eps=eps, n_chunks=n_chunks,
                               hoist_k=hoist_k)
    if n_chunks == 1:
        grid = (b, h, sp // block_q)
        q3 = lambda ib, ih, iq: (ib, iq, ih)
        qt2 = lambda ib, ih, iq: (iq, 0)
        k3 = lambda ib, ih, iq: (ib, 0, ih)
        kt2 = lambda ib, ih, iq: (0, 0)
        semantics = ("parallel", "parallel", "parallel")
    else:
        grid = (b, h, sp // block_q, n_chunks)
        q3 = lambda ib, ih, iq, ic: (ib, iq, ih)
        qt2 = lambda ib, ih, iq, ic: (iq, 0)
        k3 = lambda ib, ih, iq, ic: (ib, ic, ih)
        kt2 = lambda ib, ih, iq, ic: (ic, 0)
        semantics = ("parallel", "parallel", "parallel", "arbitrary")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), q3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_chunk, d), k3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_chunk, d), k3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), qt2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, d), qt2, memory_space=pltpu.VMEM),
            pl.BlockSpec((kv_chunk, d), kt2, memory_space=pltpu.VMEM),
            pl.BlockSpec((kv_chunk, d), kt2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), q3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * sp * sp,
        ),
        interpret=interpret,
    )(qp, kp, vp, cos_q, sin_q, cos_k, sin_k)

    return out[:, :s].reshape(b, s, h, d)
