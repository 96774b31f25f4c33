"""Multi-head attention dispatch: XLA einsum reference path and the Pallas
flash-attention kernel (``textflux_tpu.ops.flash_attention``).

Layout convention everywhere: (batch, seq, heads, head_dim) — BSHD, the
TPU-friendly layout that keeps head_dim on the 128-lane axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kv_len: Optional[int] = None) -> jnp.ndarray:
    """Unfused reference attention: fp32 logits + softmax, output in q.dtype."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if kv_len is not None:
        mask = jnp.arange(k.shape[1]) < kv_len
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over BSHD tensors.

    Args:
      q, k, v: (B, S, H, D).
      impl: "auto" (pallas on TPU, xla elsewhere), "xla", or "pallas".
      kv_len: if set, keys/values beyond this index are masked out (sequence
        padding support — padded queries still produce outputs; callers slice
        them away).
    """
    if impl == "auto":
        impl = "pallas" if q.shape[1] >= 512 and jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _flash_differentiable(q, k, v, kv_len)
    return _xla_attention(q, k, v, kv_len=kv_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_differentiable(q, k, v, kv_len):
    """Pallas flash forward + pallas backward kernels (dq/dk/dv) — neither
    direction ever materializes the (S x S) score matrix in HBM."""
    from textflux_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, kv_len=kv_len)


def _flash_fwd(q, k, v, kv_len):
    return _flash_differentiable(q, k, v, kv_len), (q, k, v)


# Backward-path crossover, set from v5e measurements (B=1, H=24, D=128,
# bf16; fwd+bwd per call — full table in ARCHITECTURE.md):
#   S=1024: xla-recompute 0.48 ms vs pallas 1.14 ms  (XLA wins)
#   S=1536:               2.47 ms vs        0.72 ms
#   S=1696:               3.10 ms vs        1.12 ms  (the training seq)
#   S=2048:               4.12 ms vs        1.25 ms
#   S=4096:              16.88 ms vs        5.12 ms
#   S=8192:             697.33 ms vs       19.85 ms  (XLA spills the SxS scores)
#   S=16384:     fails to compile vs      119.36 ms
# (re-measured after the static kv_len mask elision.) The pallas backward
# kernels win from ~1.5k tokens and keep memory O(S); below the threshold
# XLA-recompute avoids the kernels' block-padding waste on tiny shapes.
PALLAS_BWD_MIN_SEQ = 1280


def _flash_bwd(kv_len, res, g):
    q, k, v = res
    if q.shape[1] <= PALLAS_BWD_MIN_SEQ:
        _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, kv_len=kv_len), q, k, v)
        return vjp(g)
    from textflux_tpu.ops.flash_attention import flash_attention_bwd

    return flash_attention_bwd(q, k, v, g, kv_len=kv_len)


_flash_differentiable.defvjp(_flash_fwd, _flash_bwd)
