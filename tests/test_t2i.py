"""Text-to-image pipeline + render-token window matcher tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import (
    CLIP_TINY,
    T5_TINY,
    VAE_TINY,
    dummy_clip_tokenize,
    dummy_t5_tokenize,
)
from textflux_tpu.config import FluxConfig, PipelineConfig
from textflux_tpu.models import vae as V
from textflux_tpu.models.clip import init_clip_params
from textflux_tpu.models.t5 import init_t5_params
from textflux_tpu.models.transformer import init_flux_params
from textflux_tpu.pipeline.prompts import find_render_token_windows, words_prompt
from textflux_tpu.pipeline.t2i import Text2ImagePipeline

# t2i: in_channels == out_channels == latent*4 (no cond concat)
T2I_TINY = FluxConfig(
    in_channels=16, out_channels=16, num_double_layers=1, num_single_layers=1,
    num_heads=2, head_dim=8, joint_dim=32, pooled_dim=16, guidance_embeds=True,
    axes_dims_rope=(4, 2, 2), time_embed_channels=256,
)


def test_t2i_generates():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pipe = Text2ImagePipeline(
        flux_params=init_flux_params(ks[0], T2I_TINY), flux_cfg=T2I_TINY,
        vae_params=V.init_vae_params(ks[1], VAE_TINY), vae_cfg=VAE_TINY,
        clip_params=init_clip_params(ks[2], CLIP_TINY), clip_cfg=CLIP_TINY,
        t5_params=init_t5_params(ks[3], T5_TINY), t5_cfg=T5_TINY,
        clip_tokenize=dummy_clip_tokenize, t5_tokenize=dummy_t5_tokenize,
        pipe_cfg=PipelineConfig(num_inference_steps=2, guidance_scale=3.5),
        attn_impl="xla")
    out = pipe(prompt="a sign that says 'HELLO'", height=32, width=48,
               seed=1, dtype=jnp.float32, output_type="np")
    assert out.shape == (1, 32, 48, 3)
    assert np.isfinite(out).all()


def test_find_render_token_windows():
    def tokenize(text):
        # toy tokenizer: one id per character (+2 keeps 0 free for padding)
        return np.array([[ord(c) % 97 + 2 for c in text]])

    prompt = words_prompt(["cat", "dog"])
    windows = find_render_token_windows(tokenize, prompt)
    words = [w for w, _, _ in windows]
    assert "cat" in words and "dog" in words
    ids = [ord(c) % 97 + 2 for c in prompt]
    for w, s, e in windows:
        # per-char tokenizer: span ids [', c,a,t, '] -> needle [c,a,t]
        assert ids[s:e] == [ord(c) % 97 + 2 for c in w]


def test_t2i_overshoot_sampler_runs():
    """The t2i path used to build step keys without the batch axis, crashing
    the overshoot sampler's per-sample vmap; it now delegates to the fill
    pipeline's _run_denoise."""
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pipe = Text2ImagePipeline(
        flux_params=init_flux_params(ks[0], T2I_TINY), flux_cfg=T2I_TINY,
        vae_params=V.init_vae_params(ks[1], VAE_TINY), vae_cfg=VAE_TINY,
        clip_params=init_clip_params(ks[2], CLIP_TINY), clip_cfg=CLIP_TINY,
        t5_params=init_t5_params(ks[3], T5_TINY), t5_cfg=T5_TINY,
        clip_tokenize=dummy_clip_tokenize, t5_tokenize=dummy_t5_tokenize,
        pipe_cfg=PipelineConfig(num_inference_steps=2, guidance_scale=3.5),
        attn_impl="xla")
    out = pipe(prompt="the image", num_inference_steps=3, height=32, width=48,
               sampler="overshoot", overshoot_c=1.5, seed=1,
               dtype=jnp.float32, output_type="np")
    assert out.shape == (1, 32, 48, 3)
    assert np.isfinite(out).all()


def test_find_render_token_windows_spm_like():
    """SentencePiece-like tokenizer: the bare word starts with a word-initial
    piece that never occurs after the opening quote, so the OLD bare-word
    needle silently matched nothing; the reference-faithful quoted-span
    needle (ids[1:first_pad-1]) matches."""
    def tok(text):
        ids, prev_space = [], True
        for c in text:
            if c == " ":
                prev_space = True
                continue
            ids.append(ord(c) + (1000 if prev_space else 0))
            prev_space = False
        ids.append(1)           # </s>
        ids.extend([0] * 4)     # pad
        return np.array([ids])

    prompt = "an image with the words 'cat', nice"
    windows = find_render_token_windows(tok, prompt)
    assert len(windows) == 1
    word, s, e = windows[0]
    assert word == "cat"
    full = [int(t) for t in tok(prompt).ravel()]
    assert full[s:e] == [ord("c"), ord("a"), ord("t"), ord("'")]

    with pytest.raises(ValueError, match="no token window"):
        find_render_token_windows(tok, "the words 'cat' end",
                                  max_length=3)  # needle past the window
