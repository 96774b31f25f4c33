"""Packing/unpacking parity vs the reference's rearrangement semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from textflux_tpu.ops import packing


def test_pack_unpack_roundtrip(rng):
    x = rng.standard_normal((2, 8, 12, 16)).astype(np.float32)
    packed = packing.pack_latents(jnp.asarray(x))
    assert packed.shape == (2, 4 * 6, 64)
    back = packing.unpack_latents(packed, 8, 12)
    np.testing.assert_allclose(np.asarray(back), x)


def test_pack_feature_order_matches_reference(rng):
    """Feature order must be (c, ph, pw): feature = c*4 + ph*2 + pw
    (train_utils.py:102-107 packs NCHW with that layout)."""
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    packed = np.asarray(packing.pack_latents(jnp.asarray(x)))
    # token 0 covers rows 0:2, cols 0:2
    for c in range(3):
        for ph in range(2):
            for pw in range(2):
                assert packed[0, 0, c * 4 + ph * 2 + pw] == x[0, ph, pw, c]
    # token 1 covers rows 0:2, cols 2:4
    assert packed[0, 1, 0] == x[0, 0, 2, 0]


def test_pack_matches_torch_einops(torch_oracle, rng):
    import torch
    from einops import rearrange

    x = rng.standard_normal((2, 16, 8, 12)).astype(np.float32)  # NCHW for the oracle
    ref = rearrange(torch.from_numpy(x), "b c (h ph) (w pw) -> b (h w) (c ph pw)", ph=2, pw=2).numpy()
    ours = np.asarray(packing.pack_latents(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_pack_mask_matches_reference(torch_oracle, rng):
    import torch
    from einops import rearrange

    mask = (rng.random((2, 32, 48)) > 0.5).astype(np.float32)
    m = rearrange(torch.from_numpy(mask), "b (h ph) (w pw) -> b (ph pw) h w", ph=8, pw=8)
    ref = rearrange(m, "b c (h ph) (w pw) -> b (h w) (c ph pw)", ph=2, pw=2).numpy()
    ours = np.asarray(packing.pack_mask(jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref)


def test_latent_image_ids():
    ids = packing.latent_image_ids(8, 6)
    assert ids.shape == (4 * 3, 3)
    np.testing.assert_array_equal(ids[:, 0], 0)
    assert ids[0, 1] == 0 and ids[0, 2] == 0
    assert ids[3, 1] == 1 and ids[3, 2] == 0  # row-major over (row, col)
    assert ids[1, 2] == 1


@pytest.mark.parametrize("h,w", [(64, 64), (128, 96)])
def test_pack_shapes(h, w, rng):
    x = rng.standard_normal((1, h, w, 16)).astype(np.float32)
    packed = packing.pack_latents(jnp.asarray(x))
    assert packed.shape == (1, h * w // 4, 64)
