"""RoPE table + application parity vs the reference FluxPosEmbed / apply_rotary_emb."""

import numpy as np
import jax.numpy as jnp

from textflux_tpu.ops import packing
from textflux_tpu.ops.rope import rope_tables, apply_rope


def test_tables_shape():
    ids = np.concatenate([packing.text_ids(5), packing.latent_image_ids(8, 8)], axis=0)
    cos, sin = rope_tables(ids, (16, 56, 56))
    assert cos.shape == (5 + 16, 128)
    assert sin.shape == (5 + 16, 128)
    # zero positions rotate by identity
    np.testing.assert_allclose(cos[0], 1.0)
    np.testing.assert_allclose(sin[0], 0.0)


def test_tables_match_reference(torch_oracle):
    import torch
    from diffusers.models.embeddings import FluxPosEmbed

    ids = np.concatenate([packing.text_ids(4), packing.latent_image_ids(6, 8)], axis=0)
    ref = FluxPosEmbed(theta=10000, axes_dim=[16, 56, 56])
    ref_cos, ref_sin = ref(torch.from_numpy(ids.astype(np.float32)))
    cos, sin = rope_tables(ids, (16, 56, 56))
    np.testing.assert_allclose(cos, ref_cos.numpy(), atol=1e-6)
    np.testing.assert_allclose(sin, ref_sin.numpy(), atol=1e-6)


def test_apply_matches_reference(torch_oracle, rng):
    import torch
    from diffusers.models.embeddings import FluxPosEmbed, apply_rotary_emb

    ids = packing.latent_image_ids(8, 8)
    ref = FluxPosEmbed(theta=10000, axes_dim=[4, 2, 2])
    ref_cos, ref_sin = ref(torch.from_numpy(ids.astype(np.float32)))

    x = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)  # B,H,S,D
    ref_out = apply_rotary_emb(torch.from_numpy(x), (ref_cos, ref_sin)).numpy()

    cos, sin = rope_tables(ids, (4, 2, 2))
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(out, ref_out, atol=1e-5)


def test_rotation_preserves_norm(rng):
    ids = packing.latent_image_ids(8, 8)
    cos, sin = rope_tables(ids, (4, 2, 2))
    x = rng.standard_normal((1, 2, 16, 8)).astype(np.float32)
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
