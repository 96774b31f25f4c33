"""Flash-attention kernel parity vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from textflux_tpu.ops.attention import _xla_attention
from textflux_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("shape", [(1, 256, 2, 128), (2, 300, 3, 64)])
def test_matches_xla(shape, rng):
    b, s, h, d = shape
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kv_len_masking(rng):
    b, s, h, d = 1, 200, 2, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    real = 150
    ref = _xla_attention(q[:, :real], k[:, :real], v[:, :real])
    out = flash_attention(q, k, v, kv_len=real, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out[:, :real]), np.asarray(ref), atol=2e-5)


def test_bf16(rng):
    b, s, h, d = 1, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < 0.05
