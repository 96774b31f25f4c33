"""Trace-time scoped-VMEM envelope guard for the Pallas flash kernels.

Why this exists (round-4 verdict item 6): kernel VMEM envelopes are
PROGRAM-dependent — a block shape that compiles standalone can blow the
16 MiB scoped-VMEM stack inside a full-depth `lax.scan` whose body holds
weight-prefetch buffers. Round 4 hit this twice with the chunked fused
kernel at S=8704: auto 1088/544 blocks fit fill.py's mods-precomputed scan
but OOM by ~1.13 MiB in a raw-mods flux_apply program, and 1088/1088
(chunk 2176) OOMs fill.py itself by ~1.34 MiB. The knowledge lived in
pinned constants and comments; this module turns it into a static check
that raises at trace time with a working suggestion instead of a Mosaic
compile error.

The model is an ADDITIVE BYTE ESTIMATE — block/chunk refs, scratch, and
fp32 kernel temporaries from the kernel source, plus a per-path calibration
constant — NOT a reimplementation of Mosaic's allocator. Its constants are
calibrated so every measured envelope point classifies correctly (the
regression fixtures in tests/test_vmem_budget.py):

  chunked fused path (S > 6144), S=8704 / kv_chunk=2176 [all measured r3/r4]:
    - 1088/544  + fill-scan context      -> FITS   (the shipped serving config)
    - 1088/1088 + fill-scan context      -> OOM by ~1.34 MiB
    - 1088/544  + raw-mods-scan context  -> OOM by ~1.13 MiB
    - 544/544   + raw-mods-scan context  -> FITS   (parity_spot's former pin)
  single-pass envelopes:
    - fused single-pass ceiling ~6144 (whole-KV layout compile limit)
    - plain forward single-pass <= 12288, backward <= 8192 (r2 streaming work)

Contexts name the co-resident scan body the kernel compiles inside:
  "none"          standalone kernel / no surrounding scan
  "fill_scan"     fill.py's serving scan (AdaLN mods precomputed outside)
  "raw_mods_scan" a flux_apply-style scan computing mods in-body (the mod
                  projection weights add prefetch buffers)
Context bytes only charge the CHUNKED path: its chunk-carried scratch
accumulators stay live across 'arbitrary'-dim grid steps and collide with
the scan body's prefetch buffers; single-pass grids are fully parallel and
every measured single-pass serving shape fits regardless of program.
"""

from __future__ import annotations

from typing import Optional, Tuple

MIB = 1 << 20
MOSAIC_SCOPED_VMEM = 16 * MIB          # the stack the measured OOMs hit
HEADROOM = int(1.5 * MIB)              # CLAUDE.md: keep ~1.5M under the limit

# calibration constants (see module docstring for the fixture points)
_FIXED = int(0.5 * MIB)                # grid bookkeeping / small scratch
_ROW_BYTES_FUSED = 1536                # per seq row: bf16 in/out + fp32 tables
                                       # (128-lane head column, pipelined)
_ROW_BYTES_PLAIN = 512                 # per K/V row: bf16 k+v, no fp32 tables
_SCORE_BYTES = 4                       # fp32 score tile; exp2 reuses it
CONTEXT_BYTES = {
    "none": 0,
    "fill_scan": int(6.5 * MIB),
    "raw_mods_scan": int(8.75 * MIB),
}

def _pad_up(s: int, m: int) -> int:
    return -(-s // m) * m


def _lanes(d: int) -> int:
    """128-lane head columns occupied by a head of dim d, rounded UP — a
    d<128 head still occupies a full lane group (flooring to 0 would zero
    the dominant row-bytes term and silently disable the guard)."""
    return -(-d // 128)


def fused_attention_vmem(
    s: int,
    block_q: int,
    block_k: int,
    *,
    context: str = "none",
    hoist_k: Optional[bool] = None,
    d: int = 128,
) -> int:
    """Estimated scoped-VMEM bytes for flash_attention_qk_norm_rope at
    sequence s with the given blocks (after the kernel's own padding and
    kv-chunk selection). `context` charges the co-resident scan body on the
    chunked path. hoist_k=None mirrors the kernel's auto-hoist rule so the
    estimate covers what the kernel will actually do with these blocks."""
    from textflux_tpu.ops.flash_attention import pick_kv_chunk

    if context not in CONTEXT_BYTES:
        raise ValueError(f"unknown vmem context {context!r}; "
                         f"expected one of {sorted(CONTEXT_BYTES)}")
    blk = max(block_q, block_k)
    sp = _pad_up(s, blk)
    kv_chunk = pick_kv_chunk(sp, block_k)
    chunked = kv_chunk < _pad_up(sp, kv_chunk)
    if hoist_k is None:  # the kernel's own hoist_ok rule
        hoist_k = (not chunked and kv_chunk // block_k <= 8
                   and kv_chunk <= 4096)

    est = _FIXED
    est += _ROW_BYTES_FUSED * _lanes(d) * (block_q + kv_chunk)  # refs + tables
    est += _SCORE_BYTES * block_q * block_k                 # score/p tile
    if hoist_k:
        est += kv_chunk * d * 6                             # normed K + fp32 temp
    if chunked:
        est += CONTEXT_BYTES[context]                       # scan coexistence
    return est


def check_fused_attention(
    s: int,
    block_q: int,
    block_k: int,
    *,
    context: str = "none",
    hoist_k: Optional[bool] = None,
    d: int = 128,
) -> int:
    """Raise ValueError (with a known-good suggestion) when the estimated
    scoped-VMEM use exceeds the 16 MiB stack; returns the estimate."""
    est = fused_attention_vmem(s, block_q, block_k, context=context,
                               hoist_k=hoist_k, d=d)
    if est > MOSAIC_SCOPED_VMEM:
        sq, sk = pick_fused_blocks(s, context=context, d=d)
        raise ValueError(
            f"flash_attention_qk_norm_rope blocks ({block_q}, {block_k}) at "
            f"S={s} estimate {est / MIB:.2f} MiB of scoped VMEM under the "
            f"{context!r} context — over the {MOSAIC_SCOPED_VMEM // MIB} MiB "
            f"Mosaic stack (this is the round-4 in-scan OOM mode, not a "
            f"standalone-compile limit). Suggested blocks: ({sq}, {sk}), "
            f"estimated {fused_attention_vmem(s, sq, sk, context=context, d=d) / MIB:.2f} MiB.")
    return est


def pick_fused_blocks(s: int, *, context: str = "none",
                      d: int = 128) -> Tuple[int, int]:
    """The measured-best auto blocks (fused_auto_blocks), degraded until the
    estimate fits the stack with headroom under the declared context.

    Reproduces the round-4 measurements exactly: S=8704 under "fill_scan"
    keeps the auto (1088, 544); under "raw_mods_scan" it degrades to
    (544, 544) — the pin parity_spot carried by hand until this guard."""
    from textflux_tpu.ops.flash_attention import _auto_block, fused_auto_blocks

    bq, bk = fused_auto_blocks(s)
    budget = MOSAIC_SCOPED_VMEM - HEADROOM
    candidates = [(bq, bk)]
    hi = min(bq, bk)
    while hi >= 256:
        c = _auto_block(s, lo=min(256, hi), hi=hi)
        if (c, c) not in candidates:
            candidates.append((c, c))
        hi = hi // 2
    for cq, ck in candidates:
        if fused_attention_vmem(s, cq, ck, context=context, d=d) <= budget:
            return cq, ck
    # nothing fits with headroom: return the smallest candidate if it at
    # least fits the hard limit, else raise
    cq, ck = candidates[-1]
    if fused_attention_vmem(s, cq, ck, context=context, d=d) <= MOSAIC_SCOPED_VMEM:
        return cq, ck
    raise ValueError(
        f"no exact-fit block shape fits the scoped-VMEM stack at S={s} under "
        f"the {context!r} context (smallest candidate {candidates[-1]} "
        "estimates over 16 MiB); reduce the co-resident context or the "
        "sequence bucket")


def plain_attention_vmem(s: int, block_q: int, block_k: int, *,
                         d: int = 128) -> int:
    """Estimate for the plain (non-fused) forward kernel: bf16 K/V refs, no
    fp32 rope/scale tables. Single-pass ceiling calibrates to the measured
    12288 (15.6 MiB estimated — borderline by design, it WAS the ceiling)."""
    from textflux_tpu.ops.flash_attention import SINGLE_PASS_MAX_PLAIN

    blk = max(block_q, block_k)
    sp = _pad_up(s, blk)
    kv_chunk = sp if sp <= SINGLE_PASS_MAX_PLAIN else 4096
    est = _FIXED
    # constant-index whole-KV blocks are not double-buffered across the grid
    est += _ROW_BYTES_PLAIN * _lanes(d) * kv_chunk           # k+v (bf16)
    est += block_q * d * 12                                  # q/out + scratch
    est += _SCORE_BYTES * block_q * block_k
    est += int(2.0 * MIB)                                    # calibration
    return est


def bwd_attention_vmem(s: int, block_q: int, block_k: int, *,
                       d: int = 128) -> int:
    """Estimate for the backward dkv kernel (the widest of the three bwd
    passes: whole q/do chunks + 128-lane fp32 lse/dvec). Single-pass ceiling
    calibrates to the measured 8192 (BWD_SINGLE_PASS_MAX_SEQ)."""
    from textflux_tpu.ops.flash_attention import BWD_SINGLE_PASS_MAX_SEQ

    blk = max(block_q, block_k)
    sp = _pad_up(s, blk)
    chunk = sp if sp <= BWD_SINGLE_PASS_MAX_SEQ else 2048
    est = _FIXED
    est += chunk * d * 4                                     # q + do (bf16)
    est += chunk * 128 * 8                                   # lse + dvec fp32
    est += block_k * d * 12                                  # k/v refs + scratch
    est += _SCORE_BYTES * block_q * block_k
    return est
