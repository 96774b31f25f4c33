"""Weight-only int8 quantization for serving.

Why: the 12B FLUX DiT is 23.8GB in bf16 — it does not fit a single 16GB v5e
chip. Per-output-channel symmetric int8 (w = w_q * scale) halves that to
~12GB, fitting single-chip serving; matmul activations stay bf16 and the
dequant fuses into the matmul operand. Quality: weight-only int8 with
per-channel scales is the standard low-loss serving quantization.

The reference's analogous native dependency is bitsandbytes (8-bit optimizer,
training-side); this is the inference-side counterpart, TPU-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_dense(p: dict, mode: str = "weight_only") -> dict:
    """{'w': (..., in, out), 'b'?} -> int8 leaf dict.

    mode "weight_only": {'w_q', 'scale', 'b'?} — dequant-on-read into bf16
    matmuls (halves weight HBM traffic; quality table in ARCHITECTURE.md).
    mode "w8a8": {'w_q8a8', 'scale', 'b'?} — layers.dense additionally
    quantizes activations per token and runs the matmul on the int8 MXU
    (2x bf16 peak on v5e)."""
    w = jnp.asarray(p["w"], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)                      # (..., out)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    key = "w_q8a8" if mode == "w8a8" else "w_q"
    out = {key: w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _is_dense(p) -> bool:
    return isinstance(p, dict) and "w" in p and getattr(p["w"], "ndim", 0) >= 2


def quantize_tree(params, *, min_size: int = 1 << 16, mode: str = "weight_only"):
    """Quantize every dense leaf-dict with w.size >= min_size (small embedders
    stay bf16 — negligible memory, avoids quality risk on the conditioning
    path). Non-dense leaves pass through. mode: see quantize_dense."""

    def rec(node):
        if _is_dense(node) and node["w"].size >= min_size:
            return quantize_dense(node, mode)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v) for v in node]
        return node

    return rec(params)


def dequantize_dense(p: dict, dtype=jnp.bfloat16) -> dict:
    w_q = p["w_q"] if "w_q" in p else p["w_q8a8"]
    w = w_q.astype(jnp.float32) * p["scale"][..., None, :]
    out = {"w": w.astype(dtype)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantized_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
