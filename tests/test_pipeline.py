"""End-to-end fill pipeline tests: tiny self-contained run + denoise-loop
parity vs the reference FluxFillPipeline with all stochastic inputs pinned."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from textflux_tpu.config import (
    CLIPTextConfig,
    FluxConfig,
    PipelineConfig,
    T5Config,
    VAEConfig,
)
from textflux_tpu.models import vae as V
from textflux_tpu.models.clip import init_clip_params
from textflux_tpu.models.t5 import init_t5_params
from textflux_tpu.models.transformer import init_flux_params
from textflux_tpu.ops import packing, samplers
from textflux_tpu.ops.rope import rope_tables
from textflux_tpu.pipeline.fill import FillPipeline

VAE_TINY = VAEConfig(
    block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, scaling_factor=0.5, shift_factor=0.1,
)
# cond channels: 4*4 packed latents + (2*2)*4 packed mask = 32; noise tokens 16
FLUX_TINY = FluxConfig(
    in_channels=48, out_channels=16, num_double_layers=2, num_single_layers=2,
    num_heads=2, head_dim=8, joint_dim=32, pooled_dim=16, guidance_embeds=True,
    axes_dims_rope=(4, 2, 2), time_embed_channels=256,
)
CLIP_TINY = CLIPTextConfig(vocab_size=100, hidden_dim=16, num_layers=1, num_heads=2,
                           mlp_dim=32, max_positions=24, eos_token_id=99)
T5_TINY = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=1, num_heads=4)


def _tiny_pipeline(attn_impl="xla"):
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)

    def clip_tok(prompt):
        ids = (np.frombuffer(prompt.encode()[:23].ljust(23), np.uint8) % 90).astype(np.int32)
        return np.concatenate([ids, [99]])[None]

    def t5_tok(prompt):
        ids = (np.frombuffer(prompt.encode()[:16].ljust(16), np.uint8) % 99).astype(np.int32)
        return ids[None]

    return FillPipeline(
        flux_params=init_flux_params(k1, FLUX_TINY), flux_cfg=FLUX_TINY,
        vae_params=V.init_vae_params(k2, VAE_TINY), vae_cfg=VAE_TINY,
        clip_params=init_clip_params(k3, CLIP_TINY), clip_cfg=CLIP_TINY,
        t5_params=init_t5_params(k4, T5_TINY), t5_cfg=T5_TINY,
        clip_tokenize=clip_tok, t5_tokenize=t5_tok,
        pipe_cfg=PipelineConfig(num_inference_steps=2),
        attn_impl=attn_impl,
    )


def _inputs():
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8))
    mask = np.zeros((32, 48), np.uint8)
    mask[8:20, 10:30] = 255
    return img, Image.fromarray(mask)


def test_e2e_shapes_and_determinism():
    pipe = _tiny_pipeline()
    img, mask = _inputs()
    out1 = pipe(image=img, mask_image=mask, words=["hello"], seed=3, dtype=jnp.float32)
    assert isinstance(out1[0], Image.Image)
    assert out1[0].size == (48, 32)
    out2 = pipe(image=img, mask_image=mask, words=["hello"], seed=3,
                dtype=jnp.float32, output_type="np")
    out3 = pipe(image=img, mask_image=mask, words=["hello"], seed=3,
                dtype=jnp.float32, output_type="np")
    np.testing.assert_allclose(out2, out3)
    out4 = pipe(image=img, mask_image=mask, words=["hello"], seed=4,
                dtype=jnp.float32, output_type="np")
    assert np.abs(out2 - out4).max() > 1e-4


def test_e2e_overshoot_sampler_runs():
    pipe = _tiny_pipeline()
    img, mask = _inputs()
    out = pipe(image=img, mask_image=mask, words=["hi"], sampler="overshoot",
               seed=0, dtype=jnp.float32, output_type="np")
    assert out.shape == (1, 32, 48, 3)
    assert np.isfinite(out).all()


def test_denoise_loop_parity_with_reference(torch_oracle, rng):
    """Pin noise, conditioning, and text embeddings; the Euler denoise loop must
    match FluxFillPipeline step-for-step."""
    import torch
    from diffusers import FluxFillPipeline, FluxTransformer2DModel, AutoencoderKL
    from diffusers import FlowMatchEulerDiscreteScheduler

    torch.manual_seed(21)
    transformer = FluxTransformer2DModel(
        patch_size=1, in_channels=FLUX_TINY.in_channels, out_channels=FLUX_TINY.out_channels,
        num_layers=2, num_single_layers=2, num_attention_heads=2, attention_head_dim=8,
        joint_attention_dim=32, pooled_projection_dim=16, guidance_embeds=True,
        axes_dims_rope=[4, 2, 2],
    ).eval()
    vae = AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 2, up_block_types=("UpDecoderBlock2D",) * 2,
        block_out_channels=VAE_TINY.block_out_channels, layers_per_block=1,
        latent_channels=4, norm_num_groups=4,
        scaling_factor=0.5, shift_factor=0.1,
        use_quant_conv=False, use_post_quant_conv=False,
    ).eval()
    scheduler = FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, use_dynamic_shifting=True, base_shift=0.5,
        max_shift=1.15, base_image_seq_len=256, max_image_seq_len=4096,
    )
    ref_pipe = FluxFillPipeline(
        scheduler=scheduler, vae=vae, text_encoder=None, tokenizer=None,
        text_encoder_2=None, tokenizer_2=None, transformer=transformer,
    )

    B, H, W, steps = 1, 32, 32, 4
    t_img = (H // 2 // 2) * (W // 2 // 2)  # vae 2x then patch 2x => 8*8
    noise = rng.standard_normal((B, t_img, 16)).astype(np.float32)
    cond = rng.standard_normal((B, t_img, 32)).astype(np.float32)
    txt = rng.standard_normal((B, 6, 32)).astype(np.float32)
    pooled = rng.standard_normal((B, 16)).astype(np.float32)

    with torch.no_grad():
        ref_lat = ref_pipe(
            prompt_embeds=torch.from_numpy(txt),
            pooled_prompt_embeds=torch.from_numpy(pooled),
            latents=torch.from_numpy(noise),
            masked_image_latents=torch.from_numpy(cond),
            height=H, width=W, num_inference_steps=steps, guidance_scale=30.0,
            output_type="latent",
        ).images.numpy()

    # ours
    from textflux_tpu.io.params import convert_flux_state_dict

    sd = {k: v.detach().numpy() for k, v in transformer.state_dict().items()}
    flux_params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                               convert_flux_state_dict(sd, FLUX_TINY))
    pipe = FillPipeline(
        flux_params=flux_params, flux_cfg=FLUX_TINY,
        vae_params=V.init_vae_params(jax.random.PRNGKey(0), VAE_TINY), vae_cfg=VAE_TINY,
        pipe_cfg=PipelineConfig(), attn_impl="xla",
    )
    lat_h, lat_w = H // 2, W // 2
    ids = np.concatenate([packing.text_ids(6), packing.latent_image_ids(lat_h, lat_w)], axis=0)
    cos, sin = rope_tables(ids, FLUX_TINY.axes_dims_rope)
    sigmas = samplers.make_schedule(steps, t_img)
    keys = jax.random.split(jax.random.PRNGKey(0), steps)
    ours = pipe._denoise(
        flux_params, jnp.asarray(noise), jnp.asarray(cond), jnp.asarray(txt),
        jnp.asarray(pooled), jnp.asarray(sigmas), jnp.full((B,), 30.0, jnp.float32),
        jnp.asarray(cos), jnp.asarray(sin), keys, "euler", 2.0,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_lat, atol=5e-4, rtol=1e-3)


def test_lora_folding(rng):
    from textflux_tpu.io.lora import fold_lora_into_state_dict

    w = rng.standard_normal((8, 6)).astype(np.float32)
    a = rng.standard_normal((2, 6)).astype(np.float32)
    b = rng.standard_normal((8, 2)).astype(np.float32)
    sd = {"x_embedder.weight": w.copy()}
    lora = {
        "transformer.x_embedder.lora_A.weight": a,
        "transformer.x_embedder.lora_B.weight": b,
        "transformer.x_embedder.alpha": np.float32(4.0),
    }
    out = fold_lora_into_state_dict(sd, lora, scale=0.5)
    np.testing.assert_allclose(out["x_embedder.weight"], w + 0.5 * 2.0 * (b @ a), rtol=1e-5)


def test_seq_pad_multiple_matches_unpadded():
    from tests.helpers import tiny_pipeline

    pipe = tiny_pipeline()
    rng_l = np.random.default_rng(5)
    img = Image.fromarray(rng_l.integers(0, 255, (32, 48, 3), np.uint8))
    mask = np.zeros((32, 48), np.uint8)
    mask[8:20, 10:30] = 255
    kw = dict(image=img, mask_image=Image.fromarray(mask), words=["pad"],
              seed=2, dtype=jnp.float32, output_type="np", sampler="euler")
    ref = pipe(**kw)
    out = pipe(**kw, seq_pad_multiple=64)   # t_img = 96 -> pads to 128
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_quantized_pipeline_runs():
    from tests.helpers import tiny_pipeline, FLUX_TINY
    from textflux_tpu.io.quantize import quantize_tree

    pipe = tiny_pipeline()
    pipe.flux_params = quantize_tree(pipe.flux_params, min_size=0)
    img, mask = _inputs()
    out = pipe(image=img, mask_image=mask, words=["q"], seed=0,
               dtype=jnp.float32, output_type="np")
    assert np.isfinite(out).all()


def test_nf4_pipeline_runs():
    # tiny dims fall back to int8 per-leaf, but hidden-128 leaves engage nf4
    # in test_quantize; here the mode string plumbs through the pipeline
    from tests.helpers import tiny_pipeline
    from textflux_tpu.io.quantize import quantize_tree

    pipe = tiny_pipeline()
    pipe.flux_params = quantize_tree(pipe.flux_params, min_size=0, mode="nf4")
    img, mask = _inputs()
    out = pipe(image=img, mask_image=mask, words=["q"], seed=0,
               dtype=jnp.float32, output_type="np")
    assert np.isfinite(out).all()


def test_overshoot_c_is_traced_not_static():
    """overshoot_c must be a traced multiplier: a static arg recompiled the
    whole full-width denoise program for every demo-slider value (~2-4 min
    per value through the tunnel). Different c values -> different outputs,
    same compiled program."""
    pipe = _tiny_pipeline()
    img, mask = _inputs()
    kw = dict(image=img, mask_image=mask, words=["hi"], sampler="overshoot",
              seed=0, dtype=jnp.float32, output_type="np",
              num_inference_steps=3)
    # c=1.0 stays below the t<=1 overshoot clip that large c saturates at
    # the early steps, so the two trajectories genuinely differ
    out_a = pipe(overshoot_c=1.0, **kw)
    n_compiles = pipe._denoise._cache_size()
    out_b = pipe(overshoot_c=3.0, **kw)
    assert pipe._denoise._cache_size() == n_compiles  # no retrace for new c
    assert np.isfinite(out_b).all()
    assert np.abs(out_a - out_b).max() > 1e-5         # c actually applied
