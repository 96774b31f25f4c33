"""MM-DiT forward parity vs the reference FluxTransformer2DModel (torch CPU oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.config import FluxConfig
from textflux_tpu.io.params import convert_flux_state_dict
from textflux_tpu.models.transformer import flux_apply, init_flux_params, flux_param_count
from textflux_tpu.ops import packing
from textflux_tpu.ops.rope import rope_tables

TINY = FluxConfig(
    in_channels=12,
    out_channels=4,
    num_double_layers=2,
    num_single_layers=2,
    num_heads=2,
    head_dim=8,
    joint_dim=32,
    pooled_dim=16,
    guidance_embeds=True,
    axes_dims_rope=(4, 2, 2),
    time_embed_channels=256,
)


@pytest.fixture(scope="module")
def oracle_model(request):
    torch_oracle = request.getfixturevalue("torch_oracle")
    import torch
    from diffusers import FluxTransformer2DModel

    torch.manual_seed(7)
    model = FluxTransformer2DModel(
        patch_size=1,
        in_channels=TINY.in_channels,
        out_channels=TINY.out_channels,
        num_layers=TINY.num_double_layers,
        num_single_layers=TINY.num_single_layers,
        num_attention_heads=TINY.num_heads,
        attention_head_dim=TINY.head_dim,
        joint_attention_dim=TINY.joint_dim,
        pooled_projection_dim=TINY.pooled_dim,
        guidance_embeds=True,
        axes_dims_rope=list(TINY.axes_dims_rope),
    ).eval()
    return model


def _convert(oracle_model):
    sd = {k: v.detach().numpy() for k, v in oracle_model.state_dict().items()}
    return convert_flux_state_dict(sd, TINY)


def test_param_count_matches(oracle_model):
    ours = _convert(oracle_model)
    n_ref = sum(p.numel() for p in oracle_model.parameters())
    n_ours = sum(int(np.asarray(p).size) for p in jax.tree.leaves(ours))
    assert n_ours == n_ref


def test_forward_parity(oracle_model, rng):
    import torch

    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), _convert(oracle_model))

    B, lat_h, lat_w, t_txt = 2, 8, 8, 6
    t_img = (lat_h // 2) * (lat_w // 2)
    img = rng.standard_normal((B, t_img, TINY.in_channels)).astype(np.float32)
    txt = rng.standard_normal((B, t_txt, TINY.joint_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, TINY.pooled_dim)).astype(np.float32)
    sigma = np.array([0.7, 0.3], np.float32)
    guidance = np.array([30.0, 30.0], np.float32)

    img_ids = packing.latent_image_ids(lat_h, lat_w)
    txt_ids = packing.text_ids(t_txt)
    ids = np.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = rope_tables(ids, TINY.axes_dims_rope)

    with torch.no_grad():
        ref = oracle_model(
            hidden_states=torch.from_numpy(img),
            encoder_hidden_states=torch.from_numpy(txt),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(sigma),
            img_ids=torch.from_numpy(img_ids.astype(np.float32)),
            txt_ids=torch.from_numpy(txt_ids.astype(np.float32)),
            guidance=torch.from_numpy(guidance),
        ).sample.numpy()

    out = flux_apply(
        params, TINY,
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(pooled),
        jnp.asarray(sigma), jnp.asarray(guidance),
        jnp.asarray(cos), jnp.asarray(sin),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_forward_parity_remat(oracle_model, rng):
    """remat=True must be numerically identical to remat=False."""
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), _convert(oracle_model))
    B, t_img, t_txt = 1, 16, 4
    img = jnp.asarray(rng.standard_normal((B, t_img, TINY.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, t_txt, TINY.joint_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((B, TINY.pooled_dim)), jnp.float32)
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(8, 8)], axis=0)
    cos, sin = rope_tables(ids, TINY.axes_dims_rope)
    args = (params, TINY, img, txt, pooled, jnp.array([0.5]), jnp.array([4.0]),
            jnp.asarray(cos), jnp.asarray(sin))
    a = flux_apply(*args, attn_impl="xla", remat=False)
    b = flux_apply(*args, attn_impl="xla", remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_init_and_apply_shapes():
    params = init_flux_params(jax.random.PRNGKey(0), TINY)
    assert flux_param_count(params) > 0
    B, t_img, t_txt = 1, 16, 4
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(8, 8)], axis=0)
    cos, sin = rope_tables(ids, TINY.axes_dims_rope)
    out = flux_apply(
        params, TINY,
        jnp.zeros((B, t_img, TINY.in_channels)),
        jnp.zeros((B, t_txt, TINY.joint_dim)),
        jnp.zeros((B, TINY.pooled_dim)),
        jnp.array([0.5]), jnp.array([4.0]),
        jnp.asarray(cos), jnp.asarray(sin),
        attn_impl="xla",
    )
    assert out.shape == (B, t_img, TINY.out_channels)


def test_kv_len_masking(rng):
    """Padding keys beyond kv_len must not change outputs for real tokens."""
    params = init_flux_params(jax.random.PRNGKey(0), TINY)
    t_txt, t_img = 4, 16
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(8, 8)], axis=0)
    cos, sin = rope_tables(ids, TINY.axes_dims_rope)
    img = jnp.asarray(rng.standard_normal((1, t_img, TINY.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, t_txt, TINY.joint_dim)), jnp.float32)
    pooled = jnp.zeros((1, TINY.pooled_dim))

    base = flux_apply(params, TINY, img, txt, pooled, jnp.array([0.5]), jnp.array([4.0]),
                      jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")

    # pad 4 garbage image tokens, extend rope tables, mask them out
    pad = 4
    img_p = jnp.concatenate([img, 7.0 + jnp.zeros((1, pad, TINY.in_channels))], axis=1)
    ids_p = np.concatenate([ids, np.tile(ids[-1:], (pad, 1))], axis=0)
    cos_p, sin_p = rope_tables(ids_p, TINY.axes_dims_rope)
    out_p = flux_apply(params, TINY, img_p, txt, pooled, jnp.array([0.5]), jnp.array([4.0]),
                       jnp.asarray(cos_p), jnp.asarray(sin_p), attn_impl="xla",
                       kv_len=t_txt + t_img)
    np.testing.assert_allclose(np.asarray(out_p[:, :t_img]), np.asarray(base), atol=1e-5)


def test_fused_attn_impl_matches_xla(rng):
    """attn_impl='fused' (permuted weights + rotate-half tables + fused kernel)
    must match the standard path."""
    from textflux_tpu.models.transformer import half_permute_flux_params
    from textflux_tpu.ops.rope import rope_tables_half

    cfg = FluxConfig(
        in_channels=12, out_channels=4, num_double_layers=2, num_single_layers=2,
        num_heads=2, head_dim=128, joint_dim=32, pooled_dim=16, guidance_embeds=True,
        axes_dims_rope=(16, 56, 56), time_embed_channels=256,
    )
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    t_txt, lat = 8, 16
    t_img = (lat // 2) ** 2
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(lat, lat)], axis=0)
    img = jnp.asarray(rng.standard_normal((1, t_img, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, t_txt, cfg.joint_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)
    args = (txt, pooled, jnp.array([0.5]), jnp.array([4.0]))

    cos, sin = rope_tables(ids, cfg.axes_dims_rope)
    ref = flux_apply(params, cfg, img, *args[:1], *args[1:],
                     jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")

    cos_h, sin_h = rope_tables_half(ids, cfg.axes_dims_rope)
    fused_params = half_permute_flux_params(params, cfg)
    out = flux_apply(fused_params, cfg, img, *args[:1], *args[1:],
                     jnp.asarray(cos_h), jnp.asarray(sin_h), attn_impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_long_seq_fallback_matches(rng, monkeypatch):
    """Above FUSED_MAX_SEQ the fused path falls back to outside-kernel
    rms+rotate-half-rope + flash; must still match the standard path."""
    import textflux_tpu.models.transformer as T
    from textflux_tpu.models.transformer import half_permute_flux_params
    from textflux_tpu.ops.rope import rope_tables_half

    monkeypatch.setattr(T, "FUSED_MAX_SEQ", 8)  # force the fallback

    cfg = FluxConfig(
        in_channels=12, out_channels=4, num_double_layers=1, num_single_layers=1,
        num_heads=2, head_dim=128, joint_dim=32, pooled_dim=16, guidance_embeds=True,
        axes_dims_rope=(16, 56, 56), time_embed_channels=256,
    )
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    t_txt, lat = 8, 8
    t_img = (lat // 2) ** 2
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(lat, lat)], axis=0)
    img = jnp.asarray(rng.standard_normal((1, t_img, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, t_txt, cfg.joint_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)

    cos, sin = rope_tables(ids, cfg.axes_dims_rope)
    ref = flux_apply(params, cfg, img, txt, pooled, jnp.array([0.5]), jnp.array([4.0]),
                     jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")

    cos_h, sin_h = rope_tables_half(ids, cfg.axes_dims_rope)
    fused_params = half_permute_flux_params(params, cfg)
    out = flux_apply(fused_params, cfg, img, txt, pooled, jnp.array([0.5]), jnp.array([4.0]),
                     jnp.asarray(cos_h), jnp.asarray(sin_h), attn_impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_precomputed_mods_parity(rng):
    """flux_apply(mods=flux_mods(...)) must match the per-step path: the
    denoise loop precomputes all steps' AdaLN modulations in one batched
    matmul (fill.py) and the result may not drift from computing them
    per block inside the scan. Covers bf16-style fp32 weights and the
    stacked int8 W8A8 modulation path."""
    from textflux_tpu.io.quantize import quantize_tree
    from textflux_tpu.models.transformer import flux_mods, flux_vec

    params = init_flux_params(jax.random.PRNGKey(3), TINY)
    B, t_img, t_txt = 2, 16, 4
    img = jnp.asarray(rng.standard_normal((B, t_img, TINY.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, t_txt, TINY.joint_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((B, TINY.pooled_dim)), jnp.float32)
    sigma = jnp.array([0.7, 0.3])
    guidance = jnp.array([4.0, 4.0])
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(8, 8)], axis=0)
    cos, sin = rope_tables(ids, TINY.axes_dims_rope)
    args = (img, txt, pooled, sigma, guidance, jnp.asarray(cos), jnp.asarray(sin))

    for p in (params, quantize_tree(params, min_size=0, mode="w8a8")):
        ref = flux_apply(p, TINY, *args, attn_impl="xla")
        vec = flux_vec(p, TINY, sigma, guidance, pooled, jnp.float32)
        out = flux_apply(p, TINY, *args, attn_impl="xla",
                         mods=flux_mods(p, TINY, vec))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
