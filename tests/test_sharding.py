"""Multi-device GSPMD tests on the 8-device CPU mesh: sharded forward and
training step must match single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from textflux_tpu.config import FluxConfig, VAEConfig
from textflux_tpu.models import vae as V
from textflux_tpu.models.transformer import flux_apply, init_flux_params
from textflux_tpu.ops import packing
from textflux_tpu.ops.rope import rope_tables
from textflux_tpu.parallel import partitioning as PT
from textflux_tpu.training import train as TR

FLUX_TINY = FluxConfig(
    in_channels=48, out_channels=16, num_double_layers=2, num_single_layers=2,
    num_heads=4, head_dim=8, joint_dim=32, pooled_dim=16, guidance_embeds=True,
    axes_dims_rope=(4, 2, 2), time_embed_channels=256,
)
VAE_TINY = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
                     norm_num_groups=4, scaling_factor=0.5, shift_factor=0.1)


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_forward_matches_single_device(rng):
    mesh = PT.make_mesh((1, 2, 4))
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    specs = PT.flux_param_specs(FLUX_TINY)
    sharded = PT.shard_tree(params, specs, mesh)

    b, t_img, t_txt = 2, 16, 4
    img = jnp.asarray(rng.standard_normal((b, t_img, 48)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((b, t_txt, 32)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((b, 16)), jnp.float32)
    ids = np.concatenate([packing.text_ids(t_txt), packing.latent_image_ids(8, 8)], axis=0)
    cos, sin = rope_tables(ids, FLUX_TINY.axes_dims_rope)
    sigma = jnp.array([0.5, 0.9])
    guidance = jnp.array([1.0, 1.0])

    ref = flux_apply(params, FLUX_TINY, img, txt, pooled, sigma, guidance,
                     jnp.asarray(cos), jnp.asarray(sin), attn_impl="xla")

    fn = jax.jit(lambda p, *a: flux_apply(p, FLUX_TINY, *a, attn_impl="xla"))
    with mesh:
        out = fn(sharded, img, txt, pooled, sigma, guidance, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sharded_train_step_matches_single_device(rng):
    # f32 compute: asserts sharded==unsharded MATH; bf16 (the training
    # default) makes cross-device reduction order visible at its rounding
    tc = TR.TrainConfig(grad_accum=2, excluded_single_layers=(), learning_rate=1e-3,
                        weighting_scheme="none", compute_dtype="float32")
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    mask = TR.attn_only_mask(params, FLUX_TINY, tc)
    tx = TR.make_optimizer(tc, mask)
    step = TR.make_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla")
    opt_state = tx.init(params)

    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32) * 0.3,
        "mask": jnp.asarray((rng.random((2, 4, 32, 32)) > 0.8), jnp.float32),
        "txt": jnp.asarray(rng.standard_normal((2, 4, 6, 32)), jnp.float32),
        "pooled": jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32),
    }
    key = jax.random.PRNGKey(5)

    ref_params, _, ref_metrics = jax.jit(step)(params, opt_state, mask, vae_params, batch, key)

    mesh = PT.make_mesh((2, 2, 2))
    specs = PT.flux_param_specs(FLUX_TINY)
    with mesh:
        sharded_params = PT.shard_tree(params, specs, mesh)
        sharded_vae = PT.replicate_tree(vae_params, mesh)
        bspec = NamedSharding(mesh, P(None, ("data", "fsdp")))
        sharded_batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
        out_params, _, metrics = jax.jit(step)(
            sharded_params, opt_state, mask, sharded_vae, sharded_batch, key)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_params["double"]["img_qkv"]["w"]),
        np.asarray(ref_params["double"]["img_qkv"]["w"]), atol=1e-5)


def test_sharded_qlora_train_step_matches_single_device(rng):
    """`cli/train.py --mode lora --quantize-base --mesh`: the grouped-LoRA
    train step over an int8 frozen base on a (2,2,2) mesh (fsdp>=2, tp>=2)
    must match the single-device step. Factors replicate per
    ``PT.lora_param_specs``; the base shards per flux_param_specs adapted to
    the quantized leaf layout."""
    from textflux_tpu.io.quantize import quantize_tree

    tc = TR.TrainConfig(grad_accum=2, excluded_single_layers=(), learning_rate=1e-3,
                        weighting_scheme="none", compute_dtype="float32",
                        mode="lora", lora_rank=2, lora_alpha=2.0)
    base = quantize_tree(init_flux_params(jax.random.PRNGKey(0), FLUX_TINY),
                         min_size=0, mode="weight_only")
    vae_params = V.init_vae_params(jax.random.PRNGKey(1), VAE_TINY)
    lora = TR.lora_init(jax.random.PRNGKey(2), base, FLUX_TINY, tc.lora_rank)
    tx = TR.make_optimizer(tc)
    step = TR.make_lora_train_step(FLUX_TINY, VAE_TINY, tc, tx, attn_impl="xla")
    opt_state = tx.init(lora)

    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal((2, 4, 32, 32, 3)), jnp.float32) * 0.3,
        "mask": jnp.asarray((rng.random((2, 4, 32, 32)) > 0.8), jnp.float32),
        "txt": jnp.asarray(rng.standard_normal((2, 4, 6, 32)), jnp.float32),
        "pooled": jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32),
    }
    key = jax.random.PRNGKey(5)

    ref_lora, _, ref_metrics = jax.jit(step)(base, lora, opt_state, vae_params, batch, key)

    mesh = PT.make_mesh((2, 2, 2))
    specs = PT.adapt_specs_to_params(PT.flux_param_specs(FLUX_TINY), base)
    with mesh:
        sharded_base = PT.shard_tree(base, specs, mesh)
        sharded_lora = PT.shard_tree(lora, PT.lora_param_specs(lora), mesh)
        sharded_vae = PT.replicate_tree(vae_params, mesh)
        bspec = NamedSharding(mesh, P(None, ("data", "fsdp")))
        sharded_batch = jax.tree.map(lambda x: jax.device_put(x, bspec), batch)
        out_lora, _, metrics = jax.jit(step)(
            sharded_base, sharded_lora, tx.init(sharded_lora), sharded_vae,
            sharded_batch, key)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4)
    for group in ("double", "single"):
        for name, f in ref_lora[group].items():
            for k in ("a", "b"):
                np.testing.assert_allclose(
                    np.asarray(out_lora[group][name][k]), np.asarray(f[k]),
                    atol=2e-5, err_msg=f"{group}/{name}/{k}")


def test_adapt_specs_handles_lora_carrying_leaves():
    """A QLoRA serving tree (parallel lora_a/lora_b branches, quantized or
    not, plus the _tp_layout marker) must shard without pytree-structure
    errors; the rank-r factors replicate."""
    from jax.sharding import PartitionSpec as P

    from textflux_tpu.io.quantize import quantize_tree
    from textflux_tpu.training.train import lora_init, lora_insert

    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    lora = lora_init(jax.random.PRNGKey(1), params, FLUX_TINY, 2)

    # unquantized base + lora branches
    merged = lora_insert(params, lora, 1.0)
    merged["_tp_layout"] = jnp.asarray(1, jnp.int32)
    specs = PT.adapt_specs_to_params(PT.flux_param_specs(FLUX_TINY), merged)
    assert jax.tree.structure(specs) == jax.tree.structure(
        jax.tree.map(lambda _: P(), merged))
    assert specs["double"]["img_qkv"]["lora_ga"] == P()   # grouped q/k/v
    assert specs["double"]["img_proj"]["lora_a"] == P()   # single-module
    assert specs["_tp_layout"] == P()

    # quantized base + lora branches
    qmerged = quantize_tree(lora_insert(params, lora, 1.0), min_size=0)
    qspecs = PT.adapt_specs_to_params(PT.flux_param_specs(FLUX_TINY), qmerged)
    assert qspecs["double"]["img_qkv"]["lora_gb"] == P()
    mesh = PT.make_mesh((1, 2, 2), jax.devices()[:4])
    PT.shard_tree(qmerged, qspecs, mesh)  # must not raise


def test_tp_requires_permuted_weights():
    """flux_apply(tp>1) on naturally-ordered weights would silently scramble
    q/k/v; the _tp_layout marker turns that into a trace-time error."""
    from textflux_tpu.models.transformer import flux_apply, tp_permute_flux_params
    from textflux_tpu.ops.rope import rope_tables
    from textflux_tpu.ops import packing

    cfg = FLUX_TINY
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    mesh = PT.make_mesh((1, 1, 2), jax.devices()[:2])
    ids = np.concatenate([packing.text_ids(4), packing.latent_image_ids(4, 4)], 0)
    cos, sin = rope_tables(ids, cfg.axes_dims_rope)
    args = (jnp.zeros((1, 4, cfg.in_channels)), jnp.zeros((1, 4, cfg.joint_dim)),
            jnp.zeros((1, cfg.pooled_dim)), jnp.array([0.5]), jnp.array([4.0]),
            jnp.asarray(cos), jnp.asarray(sin))
    with pytest.raises(ValueError, match="tp_permute_flux_params"):
        with mesh:
            flux_apply(params, cfg, *args, tp=2, mesh=mesh)
    assert "_tp_layout" in tp_permute_flux_params(params, cfg, 2)
