"""VAE encode/decode parity vs the reference AutoencoderKL (torch CPU oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.config import VAEConfig
from textflux_tpu.io.params import convert_vae_state_dict
from textflux_tpu.models import vae as V

TINY = VAEConfig(
    block_out_channels=(8, 16),
    layers_per_block=1,
    latent_channels=4,
    norm_num_groups=4,
    scaling_factor=0.5,
    shift_factor=0.1,
)


@pytest.fixture(scope="module")
def oracle_vae(request):
    request.getfixturevalue("torch_oracle")
    import torch
    from diffusers import AutoencoderKL

    torch.manual_seed(11)
    model = AutoencoderKL(
        in_channels=3,
        out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * len(TINY.block_out_channels),
        up_block_types=("UpDecoderBlock2D",) * len(TINY.block_out_channels),
        block_out_channels=TINY.block_out_channels,
        layers_per_block=TINY.layers_per_block,
        latent_channels=TINY.latent_channels,
        norm_num_groups=TINY.norm_num_groups,
        scaling_factor=TINY.scaling_factor,
        shift_factor=TINY.shift_factor,
        use_quant_conv=False,
        use_post_quant_conv=False,
        mid_block_add_attention=True,
    ).eval()
    return model


def _params(oracle_vae):
    sd = {k: v.detach().numpy() for k, v in oracle_vae.state_dict().items()}
    p = convert_vae_state_dict(sd, TINY)
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), p)


def test_param_count(oracle_vae):
    p = _params(oracle_vae)
    n_ref = sum(v.numel() for v in oracle_vae.parameters())
    n_ours = sum(int(x.size) for x in jax.tree.leaves(p))
    assert n_ours == n_ref


def test_encode_parity(oracle_vae, rng):
    import torch

    params = _params(oracle_vae)
    img = rng.standard_normal((2, 16, 16, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        post = oracle_vae.encode(torch.from_numpy(img.transpose(0, 3, 1, 2))).latent_dist
        ref_mean = post.mean.numpy().transpose(0, 2, 3, 1)
        ref_logvar = post.logvar.numpy().transpose(0, 2, 3, 1)
    mean, logvar = V.vae_encode_moments(params, TINY, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar, atol=2e-5)


def test_decode_parity(oracle_vae, rng):
    import torch

    params = _params(oracle_vae)
    lat = rng.standard_normal((1, 8, 8, TINY.latent_channels)).astype(np.float32)
    with torch.no_grad():
        scaled = torch.from_numpy(lat.transpose(0, 3, 1, 2)) / TINY.scaling_factor + TINY.shift_factor
        ref = oracle_vae.decode(scaled).sample.numpy().transpose(0, 2, 3, 1)
    out = V.vae_decode(params, TINY, jnp.asarray(lat))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


def test_encode_mode_vs_sample(oracle_vae, rng):
    params = _params(oracle_vae)
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    z_mode = V.vae_encode(params, TINY, img)
    z_sample = V.vae_encode(params, TINY, img, key=jax.random.PRNGKey(0))
    assert z_mode.shape == (1, 16 // TINY.spatial_factor, 16 // TINY.spatial_factor, TINY.latent_channels)
    assert not np.allclose(np.asarray(z_mode), np.asarray(z_sample))


def test_roundtrip_shapes():
    cfg = TINY
    params = V.init_vae_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 32, 32, 3))
    z = V.vae_encode(params, cfg, img)
    assert z.shape == (1, 16, 16, cfg.latent_channels)
    out = V.vae_decode(params, cfg, z)
    assert out.shape == (1, 32, 32, 3)


def test_tiled_decode_matches_full(oracle_vae, rng):
    params = _params(oracle_vae)
    lat = jnp.asarray(rng.standard_normal((1, 24, 20, TINY.latent_channels)), jnp.float32)
    full = V.vae_decode(params, TINY, lat)
    tiled = V.vae_decode_tiled(params, TINY, lat, tile=12, overlap=4)
    assert tiled.shape == full.shape
    # interior matches well; seams blend (GroupNorm stats differ per tile)
    err = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(err) < 0.15
    assert np.isfinite(np.asarray(tiled)).all()
    # border rows/cols must be real content, not the zero-weight artifact
    # (the blend window used to be exactly 0 at the canvas edges)
    t = np.asarray(tiled)
    for sl in (t[:, 0], t[:, -1], t[:, :, 0], t[:, :, -1]):
        assert np.abs(sl).max() > 0.05, "zeroed border"
    assert np.median(err[:, 0]) < 0.3 and np.median(err[:, -1]) < 0.3


def test_tiled_decode_small_passthrough(oracle_vae, rng):
    params = _params(oracle_vae)
    lat = jnp.asarray(rng.standard_normal((1, 8, 8, TINY.latent_channels)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(V.vae_decode_tiled(params, TINY, lat, tile=16)),
        np.asarray(V.vae_decode(params, TINY, lat)))


def test_tiled_encode_matches_full(oracle_vae, rng):
    params = _params(oracle_vae)
    img = jnp.asarray(rng.standard_normal((1, 48, 40, 3)), jnp.float32) * 0.3
    full = V.vae_encode(params, TINY, img)       # mode (no key)
    tiled = V.vae_encode_tiled(params, TINY, img, tile=12, overlap=4)
    assert tiled.shape == full.shape
    err = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(err) < 0.2
    assert np.isfinite(np.asarray(tiled)).all()
    t = np.asarray(tiled)
    for sl in (t[:, 0], t[:, -1], t[:, :, 0], t[:, :, -1]):
        assert np.abs(sl).max() > 0.05, "zeroed border"
    assert np.median(err[:, 0]) < 0.4 and np.median(err[:, -1]) < 0.4
    # sampled posterior: per-tile keys must not repeat the noise field
    s = np.asarray(V.vae_encode_tiled(params, TINY, img, tile=12, overlap=4,
                                      key=jax.random.PRNGKey(0)))
    m = np.asarray(tiled)
    noise = s - m
    # compare two single-cover tile interiors: identical noise would make
    # their difference ~0
    assert np.abs(noise[:, 1:5, 1:5] - noise[:, 1:5, -5:-1]).max() > 1e-4


def test_tiled_encode_small_passthrough(oracle_vae, rng):
    params = _params(oracle_vae)
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(V.vae_encode_tiled(params, TINY, img, tile=16)),
        np.asarray(V.vae_encode(params, TINY, img)))
