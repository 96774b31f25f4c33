"""Text-to-image pipeline (FluxPipeline counterpart).

The reference ships a modified `FluxPipeline` alongside the fill pipeline
(/root/reference/diffusers/.../pipeline_flux.py:136-836); TextFlux itself
serves fill, but the t2i path exercises the same transformer with 64-channel
inputs (no conditioning concat). Useful for base-model sanity checks and
non-fill FLUX checkpoints.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from textflux_tpu.config import FluxConfig, PipelineConfig, VAEConfig
from textflux_tpu.pipeline import image_processor as improc


class Text2ImagePipeline:
    """Minimal FLUX t2i: packed-noise tokens -> denoise scan -> VAE decode."""

    def __init__(self, *, flux_params, flux_cfg: FluxConfig, vae_params,
                 vae_cfg: VAEConfig, clip_params=None, clip_cfg=None,
                 t5_params=None, t5_cfg=None, clip_tokenize=None, t5_tokenize=None,
                 pipe_cfg: PipelineConfig = PipelineConfig(guidance_scale=3.5),
                 attn_impl: str = "auto"):
        from textflux_tpu.pipeline.fill import FillPipeline

        # reuse the fill pipeline's jitted stages/machinery with no cond tokens
        self._fill = FillPipeline(
            flux_params=flux_params, flux_cfg=flux_cfg,
            vae_params=vae_params, vae_cfg=vae_cfg,
            clip_params=clip_params, clip_cfg=clip_cfg,
            t5_params=t5_params, t5_cfg=t5_cfg,
            clip_tokenize=clip_tokenize, t5_tokenize=t5_tokenize,
            pipe_cfg=pipe_cfg, attn_impl=attn_impl)

    def __call__(self, *, prompt: Optional[str] = None, prompt_2: Optional[str] = None,
                 height: int = 512, width: int = 512,
                 num_inference_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None, seed: int = 0,
                 sampler: Optional[str] = None, overshoot_c: Optional[float] = None,
                 seq_pad_multiple: Optional[int] = None, dtype=jnp.bfloat16,
                 text_embeds=None, output_type: str = "pil"):
        f = self._fill
        cfgp = f.pipe_cfg
        steps = num_inference_steps or cfgp.num_inference_steps
        guidance_scale = cfgp.guidance_scale if guidance_scale is None else guidance_scale
        sampler = sampler or cfgp.sampler
        width, height = (width // 16) * 16, (height // 16) * 16

        if text_embeds is None:
            prompt_2 = prompt_2 or prompt
            pooled, txt = f.encode_prompts(prompt, prompt_2, dtype)
        else:
            pooled, txt = text_embeds
            pooled, txt = jnp.asarray(pooled, dtype), jnp.asarray(txt, dtype)

        b = pooled.shape[0]
        lat_h, lat_w = height // f.vae_cfg.spatial_factor, width // f.vae_cfg.spatial_factor
        t_img = (lat_h // 2) * (lat_w // 2)
        t_txt = txt.shape[1]

        key = jax.random.PRNGKey(seed)
        key_noise, key_steps = jax.random.split(key)
        latents = jax.random.normal(
            key_noise, (b, t_img, f.vae_cfg.latent_channels * 4), jnp.float32).astype(dtype)
        cond = jnp.zeros((b, t_img, 0), dtype)   # t2i: no conditioning channels

        # the denoise tail is the FILL pipeline's, not a re-implementation:
        # an earlier local copy drifted (step keys missing the batch axis
        # crashed the overshoot sampler's per-sample vmap)
        step_keys = jax.vmap(lambda k: jax.random.split(k, b))(
            jax.random.split(key_steps, steps))          # (steps, B, 2)
        latents = f._run_denoise(
            latents, cond, txt, pooled, step_keys,
            t_img=t_img, lat_h=lat_h, lat_w=lat_w, steps=steps,
            guidance_scale=guidance_scale, sampler=sampler,
            overshoot_c=(cfgp.overshoot_c if overshoot_c is None
                         else overshoot_c),
            seq_pad_multiple=seq_pad_multiple)
        if output_type == "latent":
            return latents
        images = f._decode(f.vae_params, latents, lat_h, lat_w)
        images_np = np.asarray(images.astype(jnp.float32))
        return images_np if output_type == "np" else improc.postprocess_image(images_np)
