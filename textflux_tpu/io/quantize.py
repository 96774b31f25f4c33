"""Weight-only int8 / NF4 quantization for serving.

Why: the 12B FLUX DiT is 23.8GB in bf16 — it does not fit a single 16GB v5e
chip. Per-output-channel symmetric int8 (w = w_q * scale) halves that to
~12GB, fitting single-chip serving; matmul activations stay bf16 and the
dequant fuses into the matmul operand. Quality: weight-only int8 with
per-channel scales is the standard low-loss serving quantization.

NF4 (mode "nf4") packs two 4-bit normal-float codes per byte with an f32
absmax per 64 input rows — the bitsandbytes NF4 recipe the community runs
FLUX with on small CUDA cards (block 64, normal-float codebook). It cuts
the DiT to 6.24 GiB so the FULL stack (DiT + int8 T5-XXL + CLIP + VAE) is
co-resident on one 16GB chip with no staged residency. Quality is measurably
below int8 (divergence table in ARCHITECTURE.md) — it is the memory mode,
int8 W8A8 is the speed mode.

The reference's analogous native dependency is bitsandbytes (8-bit optimizer,
training-side); this is the inference-side counterpart, TPU-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# bitsandbytes NF4 codebook: the 16 quantiles of N(0, 1) scaled to [-1, 1]
# (functional.py in bitsandbytes; values are fixed constants of the format)
NF4_CODEBOOK = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
NF4_BLOCK = 64

# Every dense-leaf key whose LAST axis is the output dim, across all base
# layouts this module can produce (bf16 / int8 / w8a8 / nf4 / double-quant /
# parallel LoRA branch). The load-time permutation transforms
# (models.transformer.half_permute_flux_params / tp_permute_flux_params)
# gather along this axis and MUST cover every layout — they import this
# constant so a new aux key added here cannot silently bypass them.
OUT_AXIS_KEYS = ("w", "w_q", "w_q8a8", "w_nf4", "scale", "absmax4",
                 "absmax8", "amax_lo", "amax_hi", "b", "lora_b")


def quantize_dense(p: dict, mode: str = "weight_only",
                   double_quant: bool = False) -> dict:
    """{'w': (..., in, out), 'b'?} -> quantized leaf dict.

    mode "weight_only": {'w_q', 'scale', 'b'?} — dequant-on-read into bf16
    matmuls (halves weight HBM traffic; quality table in ARCHITECTURE.md).
    mode "w8a8": {'w_q8a8', 'scale', 'b'?} — layers.dense additionally
    quantizes activations per token and runs the matmul on the int8 MXU
    (2x bf16 peak on v5e).
    mode "nf4": {'w_nf4', 'absmax4', 'b'?} — 4-bit normal-float codes packed
    two per byte, f32 absmax per 64 input rows (falls back to weight_only
    when the in-dim is not a multiple of 128). double_quant additionally
    stores the absmax as per-column linear uint8 codes ({'absmax8',
    'amax_lo', 'amax_hi'}) — the bnb double-quantization analogue, ~0.6 GiB
    back on the 12B DiT for a measured ~0.1% extra velocity error.

    Non-'w' keys (bias, lora_a/lora_b parallel branches from
    training.train.lora_insert) pass through untouched — layers.dense
    applies them over any quantized base (the QLoRA serving layout)."""
    if mode == "nf4":
        return _quantize_dense_nf4(p, double_quant=double_quant)
    if mode not in ("weight_only", "w8a8"):
        raise ValueError(
            f"unknown quantize mode {mode!r}: expected weight_only | w8a8 | "
            "nf4 (or 'mixed' via quantize_tree)")
    w = jnp.asarray(p["w"], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)                      # (..., out)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    key = "w_q8a8" if mode == "w8a8" else "w_q"
    out = {k: v for k, v in p.items() if k != "w"}
    out[key] = w_q
    out["scale"] = scale.astype(jnp.float32)
    return out


def _quantize_dense_nf4(p: dict, double_quant: bool = False) -> dict:
    w = jnp.asarray(p["w"], jnp.float32)
    *lead, din, dout = w.shape
    if din % (2 * NF4_BLOCK) != 0:
        return quantize_dense(p, "weight_only")
    g = din // NF4_BLOCK
    code = jnp.asarray(NF4_CODEBOOK, jnp.float32)
    wg = w.reshape(*lead, g, NF4_BLOCK, dout)
    absmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2), 1e-8)  # (..., g, out)
    x = wg / absmax[..., None, :]
    # nearest code via digitize over the 15 midpoints (codebook is sorted);
    # an argmin over a broadcast (..., 16) temp would need 16x the weight
    # memory at full width
    mids = (code[1:] + code[:-1]) / 2.0
    idx = jnp.digitize(x, mids)
    idx = idx.reshape(*lead, din, dout).astype(jnp.uint8)
    # HALF-SPLIT packing: low nibble holds row r, high nibble row r + din/2.
    # Dequant then never interleaves (a 2-stride row interleave forced a
    # strided bf16 materialization before every matmul: measured 303 ms vs
    # 141 ms int8 at full depth); layers.dense splits the matmul into
    # x_top @ w_top + x_bottom @ w_bottom instead.
    half = din // 2
    lo, hi = idx[..., :half, :], idx[..., half:, :]
    packed = ((hi & 0xF) << 4) | (lo & 0xF)
    # f32 absmax: the codes were chosen against the f32 scale, and a bf16
    # absmax would rescale every block by up to 2^-8 relative (bnb also
    # stores fp32); costs ~0.7 GiB on the 12B DiT
    if double_quant:
        # bnb-style double quantization: per-column linear uint8 codes over
        # the g axis with f32 lo/hi endpoints — absmax storage /4
        lo = jnp.min(absmax, axis=-2)                       # (..., out)
        hi = jnp.max(absmax, axis=-2)
        span = jnp.maximum(hi - lo, 1e-12)
        code8 = jnp.clip(jnp.round(
            (absmax - lo[..., None, :]) / span[..., None, :] * 255.0),
            0, 255).astype(jnp.uint8)
    out = {k: v for k, v in p.items() if k != "w"}  # bias / lora_a / lora_b
    out["w_nf4"] = packed
    if double_quant:
        out.update(absmax8=code8, amax_lo=lo, amax_hi=hi)
    else:
        out["absmax4"] = absmax
    return out


def nf4_halves(p: dict, dtype=jnp.bfloat16):
    """Dequantize a {'w_nf4', 'absmax4' | double-quantized absmax} leaf into
    its two row-halves ((..., in/2, out) each — see the half-split note in
    _quantize_dense_nf4)."""
    packed = p["w_nf4"]
    *lead, half, dout = packed.shape
    g2 = half // NF4_BLOCK
    code = jnp.asarray(NF4_CODEBOOK, jnp.float32)
    if "absmax8" in p:
        lo, hi = p["amax_lo"], p["amax_hi"]
        am = lo[..., None, :] + p["absmax8"].astype(jnp.float32) * (
            (hi - lo)[..., None, :] / 255.0)
    else:
        am = p["absmax4"].astype(jnp.float32)
    am_top, am_bot = am[..., :g2, :], am[..., g2:, :]
    halves = []
    for nib, am_h in (((packed & 0xF), am_top), ((packed >> 4) & 0xF, am_bot)):
        vals = code[nib.astype(jnp.int32)].reshape(*lead, g2, NF4_BLOCK, dout)
        vals = vals * am_h[..., None, :]
        halves.append(vals.reshape(*lead, half, dout).astype(dtype))
    return halves[0], halves[1]


def nf4_weight(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize a {'w_nf4', 'absmax4'} leaf back to (..., in, out)."""
    top, bot = nf4_halves(p, dtype)
    return jnp.concatenate([top, bot], axis=-2)


def _is_dense(p) -> bool:
    return isinstance(p, dict) and "w" in p and getattr(p["w"], "ndim", 0) >= 2


# Mixed int8/NF4 policy: leaves whose path contains one of these names stay
# int8 weight-only, the rest go NF4. Chosen from the measured per-leaf-group
# NF4 sensitivity (benchmarks/bench_quant_quality.py; ARCHITECTURE.md table):
# the IO boundary dominates — embedders ~9.2% and final_mod/final_proj ~9.3%
# velocity error under NF4, while every in-block group (qkv, proj, MLPs,
# AdaLN mods) sits at 0.25-0.47%. The bnb/QLoRA "skip embeddings and head"
# convention, rediscovered empirically. These leaves are ~65M params, so the
# mixed tree costs only ~30 MiB over all-NF4.
MIXED_INT8_NAMES = ("img_in", "txt_in", "time_in", "vector_in",
                    "guidance_in", "final_mod", "final_proj")


def quantize_tree(params, *, min_size: int = 1 << 16, mode: str = "weight_only",
                  double_quant: bool = False):
    """Quantize every dense leaf-dict with w.size >= min_size (small embedders
    stay bf16 — negligible memory, avoids quality risk on the conditioning
    path). Non-dense leaves pass through. mode: see quantize_dense, plus
    "mixed" = int8 weight-only on the NF4-sensitive IO-boundary leaves
    (MIXED_INT8_NAMES: embedders + final mod/proj), NF4 on all block
    interiors — ~6.3 GiB on the 12B DiT (vs 6.24 NF4 / 11.1 int8) at
    measurably better quality than all-NF4."""

    def rec(node, path=()):
        if _is_dense(node) and node["w"].size >= min_size:
            leaf_mode = mode
            if mode == "mixed":
                leaf_mode = ("weight_only"
                             if any(n in path for n in MIXED_INT8_NAMES)
                             else "nf4")
            return quantize_dense(node, leaf_mode, double_quant=double_quant)
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v, path) for v in node]
        return node

    return rec(params)


def dequantize_dense(p: dict, dtype=jnp.bfloat16) -> dict:
    if "w_nf4" in p:
        out = {"w": nf4_weight(p, dtype)}
    else:
        w_q = p["w_q"] if "w_q" in p else p["w_q8a8"]
        w = w_q.astype(jnp.float32) * p["scale"][..., None, :]
        out = {"w": w.astype(dtype)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantized_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
