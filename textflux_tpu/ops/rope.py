"""3-axis rotary position embeddings for the MM-DiT joint sequence.

Tables are precomputed on the host in float64 (matching the reference's
fp64 frequency computation, /root/reference/diffusers/.../embeddings.py:946-973)
and shipped to the device as float32 constants — they are static per shape
bucket, so nothing is recomputed inside the jitted step.

Convention: interleaved ("GPT-NeoX pairwise") rotation. cos/sin tables have
each frequency repeated twice along the feature axis; apply_rope rotates
(x[2i], x[2i+1]) pairs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def rope_tables(
    ids: np.ndarray,
    axes_dims: Sequence[int],
    theta: int = 10000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute cos/sin tables for 3-axis RoPE.

    Args:
      ids: (S, n_axes) float position ids.
      axes_dims: per-axis rotary dims, summing to head_dim (e.g. (16, 56, 56)).
      theta: frequency base.

    Returns:
      (cos, sin): float32 arrays of shape (S, sum(axes_dims)).
    """
    ids = np.asarray(ids, dtype=np.float64)
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        angles = np.outer(ids[:, axis], freqs)                    # (S, dim/2)
        cos = np.repeat(np.cos(angles), 2, axis=1)                # (S, dim)
        sin = np.repeat(np.sin(angles), 2, axis=1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    cos = np.concatenate(cos_parts, axis=-1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=-1).astype(np.float32)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved feature pairs of q/k.

    Args:
      x: (..., S, D) query or key.
      cos, sin: (S, D) tables (broadcast over leading dims).

    Computation runs in float32 and casts back to x.dtype.
    """
    xf, rotated = _interleaved_rotation(x)
    return (xf * cos + rotated * sin).astype(x.dtype)


def _interleaved_rotation(x: jnp.ndarray):
    """(x_f32, rotate-pairs(x)_f32): the shared interleaved-pair rotation body
    of apply_rope / apply_rope_bshd (each applies its own table broadcast)."""
    xf = x.astype(jnp.float32)
    pairs = xf.reshape(*x.shape[:-1], -1, 2)
    rotated = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(xf.shape)
    return xf, rotated


def rope_tables_half(
    ids: np.ndarray,
    axes_dims: Sequence[int],
    theta: int = 10000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate-half-layout RoPE tables for the fused attention kernel.

    With head features permuted evens-first (see ``half_permutation``), the
    interleaved rotation becomes a rotate-half rotation whose tables are the
    per-axis unique frequencies concatenated (D/2 columns) and tiled twice.
    """
    ids = np.asarray(ids, dtype=np.float64)
    parts = []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        parts.append(np.outer(ids[:, axis], freqs))          # (S, dim/2)
    angles = np.concatenate(parts, axis=-1)                  # (S, D/2)
    cos = np.tile(np.cos(angles), (1, 2)).astype(np.float32)  # (S, D)
    sin = np.tile(np.sin(angles), (1, 2)).astype(np.float32)
    return cos, sin


def half_permutation(head_dim: int) -> np.ndarray:
    """Feature permutation mapping interleaved rope pairs (2j, 2j+1) to
    rotate-half positions (j, j + D/2): evens first, then odds."""
    return np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def apply_rope_bshd(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """apply_rope for (B, S, H, D) tensors without layout transposes —
    tables broadcast over the heads axis directly (saves two HBM round trips
    per q/k per block vs transposing to BHSD and back)."""
    xf, rotated = _interleaved_rotation(x)
    out = xf * cos[None, :, None, :] + rotated * sin[None, :, None, :]
    return out.astype(x.dtype)
