"""Export roundtrips: our pytree -> diffusers state dict -> our pytree, plus
LoRA export folding equivalence."""

import numpy as np
import jax
import pytest

from tests.helpers import FLUX_TINY
from textflux_tpu.io.export import (
    export_flux_state_dict,
    export_lora_state_dict,
    save_transformer_checkpoint,
)
from textflux_tpu.io.lora import fold_lora_into_state_dict
from textflux_tpu.io.params import convert_flux_state_dict, load_flux_transformer
from textflux_tpu.models.transformer import init_flux_params
from textflux_tpu.training.train import lora_init, lora_merge


def test_state_dict_roundtrip():
    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    sd = export_flux_state_dict(params, FLUX_TINY)
    back = convert_flux_state_dict(sd, FLUX_TINY)

    flat_a = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert flat_a.keys() == flat_b.keys()
    for key in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[key]), np.asarray(flat_b[key]),
                                   atol=0, err_msg=key)


def test_roundtrip_against_torch_oracle(torch_oracle):
    """Export must load into the reference FluxTransformer2DModel."""
    import torch
    from diffusers import FluxTransformer2DModel

    params = init_flux_params(jax.random.PRNGKey(1), FLUX_TINY)
    sd = export_flux_state_dict(params, FLUX_TINY)
    model = FluxTransformer2DModel(
        patch_size=1, in_channels=FLUX_TINY.in_channels, out_channels=FLUX_TINY.out_channels,
        num_layers=FLUX_TINY.num_double_layers, num_single_layers=FLUX_TINY.num_single_layers,
        num_attention_heads=FLUX_TINY.num_heads, attention_head_dim=FLUX_TINY.head_dim,
        joint_attention_dim=FLUX_TINY.joint_dim, pooled_projection_dim=FLUX_TINY.pooled_dim,
        guidance_embeds=True, axes_dims_rope=list(FLUX_TINY.axes_dims_rope))
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected


def test_checkpoint_save_load(tmp_path):
    import jax.numpy as jnp

    params = init_flux_params(jax.random.PRNGKey(2), FLUX_TINY)
    out = str(tmp_path / "transformer")
    save_transformer_checkpoint(params, FLUX_TINY, out)
    loaded = load_flux_transformer(out, FLUX_TINY, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(loaded["double"]["img_qkv"]["w"]),
        np.asarray(params["double"]["img_qkv"]["w"]), atol=1e-6)


def test_lora_export_folding_equivalence():
    """Folding the exported LoRA into the exported base == merging factors."""
    params = init_flux_params(jax.random.PRNGKey(3), FLUX_TINY)
    lora = lora_init(jax.random.PRNGKey(4), params, FLUX_TINY, rank=4)
    # make B nonzero so the delta is real
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    alpha, rank = 8.0, 4
    scale = alpha / rank

    merged = lora_merge(params, lora, scale)

    base_sd = export_flux_state_dict(params, FLUX_TINY)
    lora_sd = export_lora_state_dict(lora, FLUX_TINY, alpha)
    folded_sd = fold_lora_into_state_dict(base_sd, lora_sd, scale=1.0)
    folded = convert_flux_state_dict(folded_sd, FLUX_TINY)

    np.testing.assert_allclose(
        np.asarray(folded["double"]["img_qkv"]["w"]),
        np.asarray(merged["double"]["img_qkv"]["w"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(folded["single"]["linear1"]["w"]),
        np.asarray(merged["single"]["linear1"]["w"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(folded["single"]["linear2"]["w"]),
        np.asarray(merged["single"]["linear2"]["w"]), atol=1e-5)


def test_sharded_checkpoint_loading(tmp_path):
    """load_flux_transformer(mesh=...) device_puts each weight straight onto
    its GSPMD shards and produces the same values as plain loading."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from textflux_tpu.parallel import partitioning as PT

    params = init_flux_params(jax.random.PRNGKey(5), FLUX_TINY)
    out = str(tmp_path / "transformer")
    save_transformer_checkpoint(params, FLUX_TINY, out)

    mesh = PT.make_mesh((1, 2, 2))
    sharded = load_flux_transformer(out, FLUX_TINY, dtype=jnp.float32, mesh=mesh)
    plain = load_flux_transformer(out, FLUX_TINY, dtype=jnp.float32)

    leaf = sharded["double"]["img_qkv"]["w"]
    assert isinstance(leaf.sharding, NamedSharding)
    assert leaf.sharding.spec == PT.flux_param_specs(FLUX_TINY)["double"]["img_qkv"]["w"]
    np.testing.assert_allclose(np.asarray(leaf),
                               np.asarray(plain["double"]["img_qkv"]["w"]), atol=1e-6)


def test_lora_import_roundtrip_matches_delta(rng):
    """export_lora_state_dict -> import_lora_factors must reproduce the same
    inserted delta: fused targets come back at rank sum(r_m) with block-diag
    B (independent per-module factors in the sd), and every target — incl.
    the double-block FFs, the reference's ff/ff_context classes — survives."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from textflux_tpu.io.lora import import_lora_factors
    from textflux_tpu.training.train import (
        LORA_TARGETS_DOUBLE,
        LORA_TARGETS_SINGLE,
        lora_init,
        lora_merge,
        lora_target_leaf,
    )
    from helpers import FLUX_TINY
    from textflux_tpu.models.transformer import init_flux_params

    params = init_flux_params(jax.random.PRNGKey(0), FLUX_TINY)
    rank, alpha = 3, 3.0
    lora = lora_init(jax.random.PRNGKey(4), params, FLUX_TINY, rank)
    # non-zero B so deltas are non-trivial
    lora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(7), x.shape), lora)
    scale = alpha / rank

    sd = export_lora_state_dict(lora, FLUX_TINY, alpha)
    imported = import_lora_factors(sd, FLUX_TINY, scale)

    assert set(imported["double"]) == set(LORA_TARGETS_DOUBLE)
    assert set(imported["single"]) == set(LORA_TARGETS_SINGLE)
    # grouped fused targets: independent per-module rank-r factors
    # (a: (L, 3, in, r)) — the reference peft family, round-tripping exactly
    assert imported["double"]["img_qkv"]["a"].shape[1:] == (
        3, lora["double"]["img_qkv"]["a"].shape[2], rank)
    assert imported["single"]["linear1"]["a"].shape[1] == 3
    assert imported["double"]["img_mlp.fc1"]["a"].shape[-1] == rank

    imp_tree = jax.tree.map(jnp.asarray, imported)
    merged_ref = lora_merge(params, lora, scale)
    merged_imp = lora_merge(params, imp_tree, scale)
    for group, names in (("double", LORA_TARGETS_DOUBLE),
                         ("single", LORA_TARGETS_SINGLE)):
        for name in names:
            w_ref = lora_target_leaf(merged_ref[group], name)["w"]
            w_imp = lora_target_leaf(merged_imp[group], name)["w"]
            np.testing.assert_allclose(np.asarray(w_imp), np.asarray(w_ref),
                                       atol=1e-5, err_msg=f"{group}.{name}")


def test_guidance_embeds_mismatch_raises(tmp_path):
    """guidance_embeds was the one config.json mismatch that failed SILENTLY
    (the converter just dropped the guidance embedder and generations went
    quietly wrong); it must crash like every other mismatch."""
    import dataclasses

    import jax.numpy as jnp

    params = init_flux_params(jax.random.PRNGKey(2), FLUX_TINY)
    out = str(tmp_path / "transformer")
    save_transformer_checkpoint(params, FLUX_TINY, out)
    no_guidance = dataclasses.replace(FLUX_TINY, guidance_embeds=False)
    with pytest.raises(ValueError, match="guidance_embeds"):
        load_flux_transformer(out, no_guidance, dtype=jnp.float32)


def test_lora_export_mixed_rank_per_target_alpha(rng):
    """Warm-started fused targets carry rank sum(r_m) != TrainConfig rank;
    the exported per-target alpha must keep alpha_t/r_t == alpha/rank, or
    consumers (peft, our own import) scale those deltas down by r_t/rank."""
    import jax

    from tests.helpers import FLUX_TINY as CFG

    params = init_flux_params(jax.random.PRNGKey(2), CFG)
    alpha, rank = 4.0, 4
    lora = lora_init(jax.random.PRNGKey(3), params, CFG, rank)
    # simulate a warm-started fused target at rank 12 (3 modules x rank 4)
    d = CFG.hidden_dim
    L = CFG.num_double_layers
    d_in = lora["double"]["img_qkv"]["a"].shape[1]
    lora["double"]["img_qkv"] = {
        "a": np.asarray(rng.standard_normal((L, d_in, 12)), np.float32),
        "b": np.asarray(rng.standard_normal((L, 12, 3 * d)), np.float32)}

    sd = export_lora_state_dict(lora, CFG, alpha, rank=rank)
    pre = "transformer.transformer_blocks.0.attn.to_q"
    a = sd[f"{pre}.lora_A.weight"]                        # (12, in)
    b = sd[f"{pre}.lora_B.weight"]                        # (d, 12)
    alpha_t = float(sd[f"{pre}.alpha"])
    assert alpha_t == alpha * (12 / rank)
    # consumer semantics (alpha_t / r_t) * B@A == training (alpha/rank) * A@B
    delta_consumer = (alpha_t / 12) * (b @ a)
    A0 = np.asarray(lora["double"]["img_qkv"]["a"][0])
    B0 = np.asarray(lora["double"]["img_qkv"]["b"][0][:, :d])
    delta_train = (alpha / rank) * (A0 @ B0).T
    np.testing.assert_allclose(delta_consumer, delta_train, atol=1e-5)
    # uniform targets keep alpha_t == alpha
    assert float(sd["transformer.transformer_blocks.0.attn.to_out.0.alpha"]) == alpha


def test_lora_import_block_subset(rng):
    """A LoRA trained on a block subset (layers missing from the sd) keeps
    the covered layers' factors; uncovered layers get a fresh no-op init
    (B=0, random A) instead of the whole target being discarded."""
    import jax

    from tests.helpers import FLUX_TINY as CFG
    from textflux_tpu.io.lora import import_lora_factors

    params = init_flux_params(jax.random.PRNGKey(2), CFG)
    lora = lora_init(jax.random.PRNGKey(3), params, CFG, 3)
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    sd = export_lora_state_dict(lora, CFG, 3.0, rank=3)
    # drop every layer-1+ entry of the to_out target (block-subset LoRA)
    subset = {k: v for k, v in sd.items()
              if not (".attn.to_out.0." in k and "transformer_blocks.0." not in k)}
    imported = import_lora_factors(subset, CFG, 1.0)
    got = imported["double"]["img_proj"]
    # layer 0 trained factors preserved (up to the folded alpha scale)
    assert np.abs(got["b"][0]).max() > 0
    # uncovered layers: B must be exactly zero (no-op), A nonzero (trainable)
    assert np.abs(got["b"][1:]).max() == 0
    assert np.abs(got["a"][1:]).max() > 0


def test_fold_lora_unrecognized_format_raises():
    from textflux_tpu.io.lora import fold_lora_into_state_dict

    with pytest.raises(ValueError, match="unrecognized naming"):
        fold_lora_into_state_dict(
            {"x.weight": np.zeros((2, 2), np.float32)},
            {"lora_unet_foo_lora_down.weight": np.zeros((2, 2), np.float32)})
