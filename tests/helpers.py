"""Shared tiny-model builders for tests."""

import numpy as np
import jax

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
from textflux_tpu.pipeline.fill import FillPipeline

VAE_TINY = VAEConfig(
    block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, scaling_factor=0.5, shift_factor=0.1,
)
FLUX_TINY = FluxConfig(
    in_channels=48, out_channels=16, num_double_layers=2, num_single_layers=2,
    num_heads=2, head_dim=8, joint_dim=32, pooled_dim=16, guidance_embeds=True,
    axes_dims_rope=(4, 2, 2), time_embed_channels=256,
)
CLIP_TINY = CLIPTextConfig(vocab_size=100, hidden_dim=16, num_layers=1, num_heads=2,
                           mlp_dim=32, max_positions=24, eos_token_id=99)
T5_TINY = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=1, num_heads=4)


def dummy_clip_tokenize(prompt: str) -> np.ndarray:
    ids = (np.frombuffer(prompt.encode()[:23].ljust(23), np.uint8) % 90).astype(np.int32)
    return np.concatenate([ids, [99]])[None]


def dummy_t5_tokenize(prompt: str) -> np.ndarray:
    ids = (np.frombuffer(prompt.encode()[:16].ljust(16), np.uint8) % 99).astype(np.int32)
    return ids[None]


def tiny_pipeline(attn_impl="xla", steps=2) -> FillPipeline:
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    return FillPipeline(
        flux_params=init_flux_params(k1, FLUX_TINY), flux_cfg=FLUX_TINY,
        vae_params=V.init_vae_params(k2, VAE_TINY), vae_cfg=VAE_TINY,
        clip_params=init_clip_params(k3, CLIP_TINY), clip_cfg=CLIP_TINY,
        t5_params=init_t5_params(k4, T5_TINY), t5_cfg=T5_TINY,
        clip_tokenize=dummy_clip_tokenize, t5_tokenize=dummy_t5_tokenize,
        pipe_cfg=PipelineConfig(num_inference_steps=steps),
        attn_impl=attn_impl,
    )


# hidden = 2*64 = 128: the smallest width where every block dense satisfies
# NF4's in-dim % 128 == 0 (see io/quantize.py), so 4-bit paths run for real
FLUX_TINY_WIDE = FluxConfig(
    in_channels=48, out_channels=16, num_double_layers=1, num_single_layers=1,
    num_heads=2, head_dim=64, joint_dim=32, pooled_dim=16, guidance_embeds=True,
    axes_dims_rope=(32, 16, 16), time_embed_channels=256,
)


def tiny_pipeline_wide(attn_impl="xla", steps=2) -> FillPipeline:
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    return FillPipeline(
        flux_params=init_flux_params(k1, FLUX_TINY_WIDE), flux_cfg=FLUX_TINY_WIDE,
        vae_params=V.init_vae_params(k2, VAE_TINY), vae_cfg=VAE_TINY,
        clip_params=init_clip_params(k3, CLIP_TINY), clip_cfg=CLIP_TINY,
        t5_params=init_t5_params(k4, T5_TINY), t5_cfg=T5_TINY,
        clip_tokenize=dummy_clip_tokenize, t5_tokenize=dummy_t5_tokenize,
        pipe_cfg=PipelineConfig(num_inference_steps=steps),
        attn_impl=attn_impl,
    )
