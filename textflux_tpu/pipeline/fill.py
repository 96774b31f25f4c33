"""End-to-end FLUX-Fill inpainting pipeline, jit-compiled per shape bucket.

Stages (each a cached jit; params are arguments so jit caches persist across
checkpoint swaps):

  1. text encode      — CLIP pooled + T5 sequence embeddings
  2. conditioning     — VAE-encode the masked image, pack latents + 8x8->2x2
                        mask rearrangement into 320-channel cond tokens
  3. denoise          — lax.scan over the sigma schedule; the MM-DiT consumes
                        [noise tokens | cond tokens] (384 ch) each step
  4. decode           — unpack + VAE decode

Behavioral parity reference: FluxFillPipeline.__call__
(/root/reference/diffusers/.../pipeline_flux_fill.py:1850-2137). Deviations
(documented): RNG is jax.random (torch.Generator seeds do not transfer), and
all image math is NHWC.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from textflux_tpu.config import (
    CLIPTextConfig,
    FluxConfig,
    PipelineConfig,
    T5Config,
    VAEConfig,
)
from textflux_tpu.models.clip import clip_encode
from textflux_tpu.models.t5 import t5_encode
from textflux_tpu.models import transformer
from textflux_tpu.models.transformer import flux_apply
from textflux_tpu.models.vae import vae_decode, vae_encode
from textflux_tpu.ops import packing, samplers
from textflux_tpu.pipeline import image_processor as improc
from textflux_tpu.pipeline.prompts import build_prompts


class FillPipeline:
    """Scene-text inpainting: glyph-conditioned FLUX fill."""

    def __init__(
        self,
        *,
        flux_params,
        flux_cfg: FluxConfig,
        vae_params,
        vae_cfg: VAEConfig,
        clip_params=None,
        clip_cfg: Optional[CLIPTextConfig] = None,
        t5_params=None,
        t5_cfg: Optional[T5Config] = None,
        clip_tokenize: Optional[Callable[[str], np.ndarray]] = None,
        t5_tokenize: Optional[Callable[[str], np.ndarray]] = None,
        pipe_cfg: PipelineConfig = PipelineConfig(),
        attn_impl: str = "auto",
    ):
        self.flux_params = flux_params
        self.flux_cfg = flux_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg
        self.clip_tokenize = clip_tokenize
        self.t5_tokenize = t5_tokenize
        self.pipe_cfg = pipe_cfg
        if attn_impl == "auto":
            # the fused kernel requires 128-lane-aligned head_dim on real TPUs;
            # other configs stay on the per-call auto (pallas/xla) dispatch
            if jax.default_backend() == "tpu" and flux_cfg.head_dim % 128 == 0:
                attn_impl = "fused"
        self.attn_impl = attn_impl
        if attn_impl == "fused" and flux_params is not None:
            # fold the rotate-half permutation into the q/k weight columns once
            # (a deferred DiT is permuted by load_transformer instead)
            from textflux_tpu.models.transformer import half_permute_flux_params

            self.flux_params = half_permute_flux_params(self.flux_params, flux_cfg)
        self._build_jits()

    def _rope_tables(self, ids):
        from textflux_tpu.ops.rope import rope_tables, rope_tables_half

        fn = rope_tables_half if self.attn_impl == "fused" else rope_tables
        return fn(ids, self.flux_cfg.axes_dims_rope, self.flux_cfg.rope_theta)

    # ------------------------------------------------------------------
    # jitted stages
    # ------------------------------------------------------------------

    def _build_jits(self):
        flux_cfg, vae_cfg = self.flux_cfg, self.vae_cfg
        clip_cfg, t5_cfg = self.clip_cfg, self.t5_cfg
        attn_impl = self.attn_impl
        # tensor-parallel fast path (set by shard_for_serving, which then
        # rebuilds these jits): flux_apply splits the device-major fused
        # projections locally and runs attention head-parallel via shard_map
        tp = getattr(self, "_tp", 1)
        tp_mesh = getattr(self, "mesh", None) if tp > 1 else None

        def encode_text(clip_params, t5_params, clip_ids, t5_ids, dtype=jnp.bfloat16):
            _, pooled = clip_encode(clip_params, clip_cfg, clip_ids, dtype=dtype)
            txt = t5_encode(t5_params, t5_cfg, t5_ids, dtype=dtype)
            return pooled, txt

        # beyond this latent area the VAE mid-block attention (quadratic) and
        # decoder activations dominate memory: switch to tiled encode/decode
        VAE_TILE_THRESHOLD = 160 * 160

        def prepare_cond(vae_params, image, mask, key):
            # mask out the edit region, encode, pack; mask folds 8x8 -> 256 ch
            from textflux_tpu.models.vae import vae_encode_tiled

            masked = image * (1.0 - mask[..., None])
            lat_area = (image.shape[1] // vae_cfg.spatial_factor) * (
                image.shape[2] // vae_cfg.spatial_factor)
            if lat_area > VAE_TILE_THRESHOLD:
                z = vae_encode_tiled(vae_params, vae_cfg, masked, key=key, tile=128)
            else:
                z = vae_encode(vae_params, vae_cfg, masked, key=key)
            img_tokens = packing.pack_latents(z)
            mask_tokens = packing.pack_mask(mask.astype(z.dtype), vae_cfg.spatial_factor)
            return jnp.concatenate([img_tokens, mask_tokens], axis=-1)

        def denoise(flux_params, latents, cond, txt, pooled, sigmas, guidance,
                    rope_cos, rope_sin, keys, sampler: str, overshoot_c: float,
                    kv_len=None):
            """keys: (steps, B, 2) raw PRNG keys — one stream PER SAMPLE, so a
            batched run consumes exactly the noise a per-item run would."""
            b = latents.shape[0]

            # Precompute every step's AdaLN modulation vectors in one batched
            # matmul over (steps*B) conditioning rows: the modulation weights
            # (~27% of the DiT's params) are read once per image instead of
            # once per step (measured -5.1 ms/step at full depth, w8a8, B=1).
            # Row-wise results match the per-step matvecs; the int8 path is
            # bitwise identical (int32 accumulation is exact per row).
            n_steps = sigmas.shape[0] - 1
            vec_all = transformer.flux_vec(
                flux_params, flux_cfg,
                jnp.repeat(sigmas[:-1].astype(latents.dtype), b),
                None if guidance is None else jnp.tile(guidance, n_steps),
                jnp.tile(pooled, (n_steps, 1)), latents.dtype)
            mods_all = transformer.flux_mods(flux_params, flux_cfg, vec_all)

            def per_step(t):
                if t.ndim == 3:   # (L, steps*B, X) -> (steps, L, B, X)
                    return t.reshape(t.shape[0], n_steps, b, t.shape[-1]).swapaxes(0, 1)
                return t.reshape(n_steps, b, t.shape[-1])   # final: (steps*B, X)

            mods_xs = jax.tree.map(per_step, mods_all)

            def step(carry, xs):
                lat = carry
                sigma, sigma_next, keys_b, mods_step = xs
                v = flux_apply(
                    flux_params, flux_cfg,
                    jnp.concatenate([lat, cond], axis=-1),
                    txt, pooled,
                    jnp.full((b,), sigma, lat.dtype),
                    guidance,
                    rope_cos, rope_sin,
                    attn_impl=attn_impl,
                    kv_len=kv_len,
                    mods=mods_step,
                    tp=tp,
                    mesh=tp_mesh,
                )
                if sampler == "overshoot":
                    lat = jax.vmap(lambda l, u, k: samplers.overshoot_step(
                        l, u, sigma, sigma_next, k, c=overshoot_c))(lat, v, keys_b)
                elif sampler == "overshoot_spatial":
                    # per-token overshoot weighted by mask occupancy (the packed
                    # mask is the tail of the cond features)
                    c_map = overshoot_c * jnp.mean(
                        cond[..., vae_cfg.latent_channels * 4:].astype(jnp.float32), -1)
                    lat = jax.vmap(lambda l, u, k, cm: samplers.overshoot_step_spatial(
                        l, u, sigma, sigma_next, k, cm))(lat, v, keys_b, c_map)
                else:
                    lat = samplers.euler_step(lat, v, sigma, sigma_next)
                return lat, None

            xs = (sigmas[:-1], sigmas[1:], keys, mods_xs)
            latents, _ = jax.lax.scan(step, latents, xs)
            return latents

        def decode(vae_params, latents, lat_h: int, lat_w: int):
            from textflux_tpu.models.vae import vae_decode_tiled

            z = packing.unpack_latents(latents, lat_h, lat_w)
            if lat_h * lat_w > VAE_TILE_THRESHOLD:
                return vae_decode_tiled(vae_params, vae_cfg, z, tile=128)
            return vae_decode(vae_params, vae_cfg, z)

        def prepare_cond_batch(vae_params, image, mask, keys):
            # per-sample VAE posterior keys: sample i is bit-identical to a
            # b=1 prepare_cond(image[i], mask[i], keys[i]) call
            return jax.vmap(
                lambda im, mk, k: prepare_cond(vae_params, im[None], mk[None], k)[0]
            )(image, mask, keys)

        self._encode_text = jax.jit(encode_text, static_argnames=("dtype",))
        self._prepare_cond = jax.jit(prepare_cond)
        self._prepare_cond_batch = jax.jit(prepare_cond_batch)
        # overshoot_c stays a TRACED scalar: it is only ever a multiplier in
        # the samplers, and a static arg would recompile the full-width
        # denoise program for every new demo-slider value (~2-4 min each
        # through the tunnel)
        self._denoise = jax.jit(denoise, static_argnames=("sampler", "kv_len"))
        self._decode = jax.jit(decode, static_argnames=("lat_h", "lat_w"))

    def _run_denoise(self, latents, cond, txt, pooled, step_keys, *,
                     t_img: int, lat_h: int, lat_w: int, steps: int,
                     guidance_scale: float, sampler: str, overshoot_c: float,
                     seq_pad_multiple):
        """Shared tail of __call__ and generate_batch: sequence-bucket
        padding (masked kv), RoPE tables, the dynamic-shift schedule, the
        jitted denoise scan, and unpadding — ONE implementation so the
        per-item and batched paths cannot drift apart."""
        cfgp = self.pipe_cfg
        t_txt = txt.shape[1]
        ids = np.concatenate([packing.text_ids(t_txt),
                              packing.latent_image_ids(lat_h, lat_w)], axis=0)

        # optional sequence bucketing: pad image tokens to a multiple so the
        # denoise program compiles once per bucket, with padded keys masked
        kv_len = None
        t_pad = t_img
        if seq_pad_multiple:
            t_pad = -(-t_img // seq_pad_multiple) * seq_pad_multiple
            if t_pad != t_img:
                pad = t_pad - t_img
                latents = jnp.pad(latents, ((0, 0), (0, pad), (0, 0)))
                cond = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
                ids = np.concatenate([ids, np.tile(ids[-1:], (pad, 1))], axis=0)
                kv_len = t_txt + t_img

        cos, sin = self._rope_tables(ids)
        sigmas = samplers.make_schedule(
            steps, t_img,
            base_seq_len=cfgp.base_image_seq_len, max_seq_len=cfgp.max_image_seq_len,
            base_shift=cfgp.base_shift, max_shift=cfgp.max_shift,
        )
        b = latents.shape[0]
        guidance = (jnp.full((b,), guidance_scale, jnp.float32)
                    if self.flux_cfg.guidance_embeds else None)
        latents = self._denoise(
            self.flux_params, latents, cond, txt, pooled,
            jnp.asarray(sigmas), guidance,
            jnp.asarray(cos), jnp.asarray(sin), step_keys,
            sampler, float(overshoot_c), kv_len,
        )
        return latents[:, :t_img] if t_pad != t_img else latents

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def encode_prompts(self, prompt: str, prompt_2: str, dtype=jnp.bfloat16):
        if self.clip_params is None or self.t5_params is None:
            raise ValueError("pipeline was built without text encoders")
        if self.clip_tokenize is None or self.t5_tokenize is None:
            raise ValueError("pipeline was built without tokenizers")
        clip_ids = jnp.asarray(self.clip_tokenize(prompt))
        t5_ids = jnp.asarray(self.t5_tokenize(prompt_2))
        return self._encode_text(self.clip_params, self.t5_params, clip_ids, t5_ids, dtype)

    def __call__(
        self,
        *,
        image,
        mask_image,
        words: Optional[Sequence[str]] = None,
        prompt: Optional[str] = None,
        prompt_2: Optional[str] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        seed: int = 42,
        sampler: Optional[str] = None,
        overshoot_c: Optional[float] = None,
        dtype=jnp.bfloat16,
        text_embeds=None,
        output_type: str = "pil",
        seq_pad_multiple: Optional[int] = None,
    ):
        """Run glyph-conditioned inpainting.

        Args:
          image / mask_image: PIL or numpy; the pre-concatenated conditioning
            canvas (glyph strip/canvas already stitched on) and its mask.
          words: render words; builds the two prompt templates automatically.
          prompt / prompt_2: override the CLIP / T5 prompts directly.
          text_embeds: optional precomputed (pooled, txt) tuple, bypassing the
            text encoders (used by tests and batch eval).
          output_type: "pil" | "np" | "latent".
        """
        cfgp = self.pipe_cfg
        steps = num_inference_steps or cfgp.num_inference_steps
        guidance_scale = cfgp.guidance_scale if guidance_scale is None else guidance_scale
        sampler = sampler or cfgp.sampler
        overshoot_c = cfgp.overshoot_c if overshoot_c is None else overshoot_c

        pil = improc.to_pil(image)
        w0, h0 = pil.size
        # latent grid must be even for 2x2 packing => 16-pixel granularity
        width = ((width or w0) // 16) * 16
        height = ((height or h0) // 16) * 16

        img = jnp.asarray(improc.preprocess_image(image, height, width), dtype)
        mask = jnp.asarray(improc.preprocess_mask(mask_image, height, width), dtype)

        if text_embeds is None:
            if prompt is None or prompt_2 is None:
                if words is None:
                    if prompt is not None or prompt_2 is not None:
                        # one prompt given, no words to derive the other from
                        raise ValueError(
                            "provide both prompt and prompt_2, or words to "
                            "derive the missing one from")
                    raise ValueError("provide words, prompts, or text_embeds")
                # derive only the MISSING prompt(s): an explicit override
                # must never be silently replaced by the words template
                auto_p, auto_p2 = build_prompts(words)
                prompt = prompt if prompt is not None else auto_p
                prompt_2 = prompt_2 if prompt_2 is not None else auto_p2
            pooled, txt = self.encode_prompts(prompt, prompt_2, dtype)
        else:
            pooled, txt = text_embeds
            pooled = jnp.asarray(pooled, dtype)
            txt = jnp.asarray(txt, dtype)

        b = img.shape[0]
        lat_h = height // self.vae_cfg.spatial_factor
        lat_w = width // self.vae_cfg.spatial_factor
        t_img = (lat_h // 2) * (lat_w // 2)
        t_txt = txt.shape[1]

        key = jax.random.PRNGKey(seed)
        key_noise, key_vae, key_steps = jax.random.split(key, 3)

        cond = self._prepare_cond(self.vae_params, img, mask, key_vae)
        latents = jax.random.normal(
            key_noise, (b, t_img, self.vae_cfg.latent_channels * 4), jnp.float32
        ).astype(dtype)

        # improc.preprocess_* always yield batch 1 here; batched generation
        # goes through generate_batch, which builds per-sample key streams
        step_keys = jax.random.split(key_steps, steps)[:, None, :]  # (steps, 1, 2)

        latents = self._run_denoise(
            latents, cond, txt, pooled, step_keys,
            t_img=t_img, lat_h=lat_h, lat_w=lat_w, steps=steps,
            guidance_scale=guidance_scale, sampler=sampler,
            overshoot_c=overshoot_c, seq_pad_multiple=seq_pad_multiple)

        if output_type == "latent":
            return latents
        images = self._decode(self.vae_params, latents, lat_h, lat_w)
        images_np = np.asarray(images.astype(jnp.float32))
        if output_type == "np":
            return images_np
        return improc.postprocess_image(images_np)

    # ------------------------------------------------------------------
    # multi-chip serving
    # ------------------------------------------------------------------

    def shard_for_serving(self, mesh, quantize: Union[bool, str] = False,
                          quantize_min_size: int = 1 << 16) -> None:
        """Reshard pipeline params over a ("data", "fsdp", "tensor") mesh:
        the DiT tensor-shards (fits the 12B model on small slices), VAE and
        text encoders replicate, and batches shard over the data axes.

        This is the TPU-native replacement for the reference's
        process-per-GPU eval farm (scripts/run_eval.py:221-247): one jitted
        program, GSPMD inserts the collectives.

        With a tensor axis > 1 the DiT weights are tp-permuted into
        device-major fused-column layout and the denoise step recompiles onto
        the clean-megatron tensor-parallel path (shard_map'd head-parallel
        attention, 2 all-reduces per block — see tp_permute_flux_params).
        ``quantize`` (False | "weight_only" | "w8a8" | "nf4" | "mixed")
        quantizes AFTER the permutation — required ordering for nf4, whose
        packed rows cannot be permuted post hoc.
        """
        from textflux_tpu.parallel import partitioning as PT

        self.mesh = mesh
        tp = mesh.shape["tensor"]
        prev_tp = getattr(self, "_tp", 1)
        if tp > 1 and prev_tp == 1:
            self.flux_params = transformer.tp_permute_flux_params(
                self.flux_params, self.flux_cfg, tp)
            self._tp = tp
        elif prev_tp not in (1, tp):
            # the weights are device-major for prev_tp; re-permuting for a
            # different tp would silently scramble attention
            raise ValueError(
                f"pipeline already tensor-permuted for tp={prev_tp}; reload "
                f"the checkpoint to serve at tp={tp}")
        if quantize:
            from textflux_tpu.io.quantize import quantize_tree

            mode = quantize if isinstance(quantize, str) else "weight_only"
            self.flux_params = quantize_tree(self.flux_params, mode=mode,
                                             min_size=quantize_min_size)
        specs = PT.adapt_specs_to_params(
            PT.flux_param_specs(self.flux_cfg), self.flux_params)
        self.flux_params = PT.shard_tree(self.flux_params, specs, mesh)
        if tp > 1:
            self._build_jits()   # rebind the denoise step to the tp path
        self.vae_params = PT.replicate_tree(self.vae_params, mesh)
        if self.clip_params is not None:
            self.clip_params = PT.replicate_tree(self.clip_params, mesh)
        if self.t5_params is not None:
            self.t5_params = PT.replicate_tree(self.t5_params, mesh)

    def encode_batch_prompts(self, words_list, dtype=jnp.bfloat16):
        """(pooled, txt) embeddings for a batch of render-word lists, using
        generate_batch's templates (shared generic CLIP prompt, per-sample T5
        word prompts). Staged residency: call for every batch while the text
        encoders are resident, then release_text_encoders()."""
        from textflux_tpu.pipeline.prompts import GENERIC_TEMPLATE, words_prompt

        if self.clip_params is None or self.t5_params is None:
            raise ValueError("text encoders were released or never loaded")
        clip_ids = np.concatenate([self.clip_tokenize(GENERIC_TEMPLATE)] * len(words_list))
        t5_ids = np.concatenate([self.t5_tokenize(words_prompt(w)) for w in words_list])
        return self._encode_text(self.clip_params, self.t5_params,
                                 jnp.asarray(clip_ids), jnp.asarray(t5_ids), dtype)

    def generate_batch(
        self,
        images,
        masks,
        words_list,
        *,
        height: int,
        width: int,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        seed: int = 42,
        seeds: Optional[Sequence[int]] = None,
        sampler: Optional[str] = None,
        overshoot_c: Optional[float] = None,
        dtype=jnp.bfloat16,
        seq_pad_multiple: Optional[int] = None,
        text_embeds=None,
    ):
        """Batched generation: all samples share one (height, width) bucket;
        T5 prompts differ per sample, CLIP uses the shared generic template.
        When shard_for_serving was called, the batch data-shards over the mesh.

        RNG is PER SAMPLE: sample i consumes exactly the noise streams of a
        single-item __call__ with seed ``seeds[i]`` (default: ``seed`` for
        every sample, matching the reference eval farm re-seeding each item —
        scripts/run_eval.py:117), so batched output == per-item output.
        """
        from textflux_tpu.pipeline.prompts import GENERIC_TEMPLATE, words_prompt

        cfgp = self.pipe_cfg
        steps = num_inference_steps or cfgp.num_inference_steps
        guidance_scale = cfgp.guidance_scale if guidance_scale is None else guidance_scale
        sampler = sampler or cfgp.sampler
        overshoot_c = cfgp.overshoot_c if overshoot_c is None else overshoot_c
        width, height = (width // 16) * 16, (height // 16) * 16

        b = len(images)
        seeds = [int(s) for s in (seeds if seeds is not None else [seed] * b)]
        if len(seeds) != b:
            raise ValueError(f"{len(seeds)} seeds for {b} images")

        # mesh mode: batches data-shard over (data, fsdp) — pad ragged tails
        # by replicating the last sample and slice the outputs back
        b_real = b
        mesh_pre = getattr(self, "mesh", None)
        if mesh_pre is not None:
            shards = mesh_pre.shape["data"] * mesh_pre.shape["fsdp"]
            pad_n = (-b) % shards
            if pad_n:
                images = list(images) + [images[-1]] * pad_n
                masks = list(masks) + [masks[-1]] * pad_n
                words_list = list(words_list) + [words_list[-1]] * pad_n
                seeds = seeds + [seeds[-1]] * pad_n
                b += pad_n

        img = jnp.asarray(np.concatenate(
            [improc.preprocess_image(im, height, width) for im in images]), dtype)
        mask = jnp.asarray(np.concatenate(
            [improc.preprocess_mask(m, height, width) for m in masks]), dtype)

        mesh = mesh_pre
        bspec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bspec = NamedSharding(mesh, P(("data", "fsdp")))
            img = jax.device_put(img, bspec)
            mask = jax.device_put(mask, bspec)
        if text_embeds is not None:
            # staged residency: embeds were computed while the encoders were
            # resident (encode_batch_prompts); pad ragged tails like the inputs
            pooled, txt = text_embeds
            pooled = jnp.asarray(pooled, dtype)
            txt = jnp.asarray(txt, dtype)
            if b_real != b:
                extra = b - pooled.shape[0]
                pooled = jnp.concatenate([pooled, jnp.repeat(pooled[-1:], extra, 0)])
                txt = jnp.concatenate([txt, jnp.repeat(txt[-1:], extra, 0)])
            if bspec is not None:
                pooled = jax.device_put(pooled, bspec)
                txt = jax.device_put(txt, bspec)
        else:
            clip_ids = np.concatenate([self.clip_tokenize(GENERIC_TEMPLATE)] * len(images))
            t5_ids = np.concatenate([self.t5_tokenize(words_prompt(w)) for w in words_list])
            if bspec is not None:
                clip_ids = jax.device_put(jnp.asarray(clip_ids), bspec)
                t5_ids = jax.device_put(jnp.asarray(t5_ids), bspec)
            pooled, txt = self._encode_text(
                self.clip_params, self.t5_params, jnp.asarray(clip_ids),
                jnp.asarray(t5_ids), dtype)

        lat_h = height // self.vae_cfg.spatial_factor
        lat_w = width // self.vae_cfg.spatial_factor
        t_img = (lat_h // 2) * (lat_w // 2)

        # per-sample RNG streams, mirroring __call__'s split(key, 3)
        per = [jax.random.split(jax.random.PRNGKey(s), 3) for s in seeds]
        vae_keys = jnp.stack([k[1] for k in per])               # (B, 2)
        if bspec is not None:
            vae_keys = jax.device_put(vae_keys, bspec)
        cond = self._prepare_cond_batch(self.vae_params, img, mask, vae_keys)
        latents = jnp.stack([
            jax.random.normal(k[0], (t_img, self.vae_cfg.latent_channels * 4),
                              jnp.float32)
            for k in per]).astype(dtype)
        step_keys = jnp.stack(
            [jax.random.split(k[2], steps) for k in per], axis=1)  # (steps, B, 2)
        if bspec is not None:
            latents = jax.device_put(latents, bspec)

        latents = self._run_denoise(
            latents, cond, txt, pooled, step_keys,
            t_img=t_img, lat_h=lat_h, lat_w=lat_w, steps=steps,
            guidance_scale=guidance_scale, sampler=sampler,
            overshoot_c=overshoot_c, seq_pad_multiple=seq_pad_multiple)
        images_out = self._decode(self.vae_params, latents, lat_h, lat_w)
        outs = improc.postprocess_image(np.asarray(images_out.astype(jnp.float32)))
        return outs[:b_real]

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        base_path: str,
        *,
        transformer_path: Optional[str] = None,
        lora_path: Optional[str] = None,
        lora_scale: float = 1.0,
        dtype=jnp.bfloat16,
        quantize: Union[bool, str] = False,
        quantize_t5: Optional[bool] = None,
        defer_transformer: bool = False,
        mesh=None,
        pipe_cfg: PipelineConfig = PipelineConfig(),
        attn_impl: str = "auto",
    ) -> "FillPipeline":
        """Load from a diffusers-layout checkpoint directory
        (subfolders: transformer/ vae/ text_encoder/ text_encoder_2/ tokenizer*/).

        Single-chip staged residency: the int8 12B DiT (11.1 GiB) and the
        bf16 T5-XXL (8.9 GiB) cannot both sit on a 16 GiB chip. With
        ``defer_transformer=True`` the DiT is NOT loaded here; encode all
        prompts first, then ``release_text_encoders()`` and
        ``load_transformer()`` — peak residency is max(T5 phase, DiT phase)
        instead of the sum (budget table in ARCHITECTURE.md).

        quantize_t5 (default: on whenever ``quantize`` is on) stores the T5
        weights int8 weight-only (8.9 -> 4.4 GiB), for co-resident
        interactive serving on larger slices.
        """
        from textflux_tpu.io.config_io import (
            clip_config_from,
            flux_config_from,
            t5_config_from,
            vae_config_from,
        )
        from textflux_tpu.io.params import (
            convert_clip_state_dict,
            convert_t5_state_dict,
            convert_vae_state_dict,
            load_flux_transformer,
            load_safetensors_dir,
            to_device_params,
        )

        t_path = transformer_path or os.path.join(base_path, "transformer")
        flux_cfg = flux_config_from(t_path)
        # tensor>1: quantization moves AFTER the tp permutation (inside
        # shard_for_serving) so nf4 packs the permuted rows
        tp_deg = mesh.shape["tensor"] if mesh is not None else 1

        def _load_flux(mesh_arg):
            if lora_path is None:
                # with a mesh, the DiT loads straight onto its tensor shards
                fp = load_flux_transformer(t_path, flux_cfg, dtype=dtype, mesh=mesh_arg)
            else:
                from textflux_tpu.io.lora import load_folded_flux_transformer

                fp = load_folded_flux_transformer(
                    t_path, lora_path, flux_cfg, scale=lora_scale, dtype=dtype)
            if quantize and tp_deg == 1:
                # int8 serving: "weight_only" (True) fits the 12B fill DiT on
                # a single 16GB chip; "w8a8" additionally runs the matmuls on
                # the int8 MXU (quality table in ARCHITECTURE.md)
                from textflux_tpu.io.quantize import quantize_tree

                mode = quantize if isinstance(quantize, str) else "weight_only"
                fp = quantize_tree(fp, mode=mode)
                if mesh_arg is not None:
                    # pin canonical shardings on the int8 leaves (scale
                    # follows the out-dim axis)
                    from textflux_tpu.parallel import partitioning as PT

                    fp = PT.shard_tree(
                        fp, PT.adapt_specs_to_params(
                            PT.flux_param_specs(flux_cfg), fp), mesh_arg)
            return fp

        flux_params = None if defer_transformer else _load_flux(mesh)

        vae_cfg = vae_config_from(os.path.join(base_path, "vae"))
        vae_sd = load_safetensors_dir(os.path.join(base_path, "vae"))
        vae_params = to_device_params(convert_vae_state_dict(vae_sd, vae_cfg), dtype=dtype)

        clip_cfg = clip_config_from(os.path.join(base_path, "text_encoder"))
        clip_sd = load_safetensors_dir(os.path.join(base_path, "text_encoder"))
        clip_params = to_device_params(convert_clip_state_dict(clip_sd, clip_cfg), dtype=dtype)

        t5_cfg = t5_config_from(os.path.join(base_path, "text_encoder_2"))
        t5_sd = load_safetensors_dir(os.path.join(base_path, "text_encoder_2"))
        t5_params = to_device_params(convert_t5_state_dict(t5_sd, t5_cfg), dtype=dtype)
        if quantize_t5 if quantize_t5 is not None else bool(quantize):
            from textflux_tpu.io.quantize import quantize_tree

            t5_params = quantize_tree(t5_params, mode="weight_only")

        from textflux_tpu.pipeline.tokenizers import load_tokenizers

        clip_tok, t5_tok = load_tokenizers(base_path, max_t5_length=pipe_cfg.max_sequence_length)

        if mesh is not None:
            from textflux_tpu.parallel import partitioning as PT

            vae_params = PT.replicate_tree(vae_params, mesh)
            clip_params = PT.replicate_tree(clip_params, mesh)
            t5_params = PT.replicate_tree(t5_params, mesh)

        pipe = cls(
            flux_params=flux_params, flux_cfg=flux_cfg,
            vae_params=vae_params, vae_cfg=vae_cfg,
            clip_params=clip_params, clip_cfg=clip_cfg,
            t5_params=t5_params, t5_cfg=t5_cfg,
            clip_tokenize=clip_tok, t5_tokenize=t5_tok,
            pipe_cfg=pipe_cfg, attn_impl=attn_impl,
        )
        if mesh is not None:
            pipe.mesh = mesh
            if tp_deg > 1 and pipe.flux_params is not None:
                # tp-permute (post half_permute from __init__) + deferred
                # quantize + shard + rebind jits to the tp fast path
                pipe.shard_for_serving(mesh, quantize=quantize)
        if defer_transformer:
            pipe._deferred_flux = _load_flux
            pipe._deferred_quantize = quantize if tp_deg > 1 else False
        return pipe

    def release_text_encoders(self) -> None:
        """Free the text encoders' device buffers (staged residency phase
        boundary: all prompts are encoded, the DiT loads next)."""
        for tree in (self.t5_params, self.clip_params):
            if tree is not None:
                for leaf in jax.tree.leaves(tree):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
        self.t5_params = None
        self.clip_params = None

    def load_transformer(self) -> None:
        """Load the DiT deferred by from_pretrained(defer_transformer=True)."""
        if self.flux_params is not None:
            return
        if not hasattr(self, "_deferred_flux"):
            raise ValueError("pipeline was not built with defer_transformer=True")
        mesh = getattr(self, "mesh", None)
        params = self._deferred_flux(mesh)
        if self.attn_impl == "fused":
            from textflux_tpu.models.transformer import half_permute_flux_params

            params = half_permute_flux_params(params, self.flux_cfg)
        self.flux_params = params
        if mesh is not None and mesh.shape["tensor"] > 1:
            self.shard_for_serving(
                mesh, quantize=getattr(self, "_deferred_quantize", False))
