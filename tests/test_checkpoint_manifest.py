"""Real-checkpoint key coverage vs tests/golden/checkpoint_manifest.json.

The manifest is the COMPLETE state-dict key/shape inventory of the actual
FLUX.1-Fill-dev model family, dumped from the vendored torch diffusers on
meta tensors (benchmarks/dump_checkpoint_manifest.py): transformer (the real
19+38-block fill config), VAE, CLIP-L, T5-XXL, and the reference's peft
rank-128 LoRA layout (train_lora.py:508-534). These tests prove MIGRATION.md's
"weights are interchangeable" claim at the key level against REAL checkpoints,
not just self-generated ones:

  - export produces exactly the real key set (nothing missing, nothing extra)
  - ingest CONSUMES every real key (a silently-dropped weight tensor is the
    worst failure mode: wrong images, no error)

Tiny tensor dims keep the tests fast; key sets depend only on layer counts
and structural flags, which match the real configs exactly.
"""

import json
import os

import numpy as np
import jax
import pytest

from textflux_tpu.config import CLIPTextConfig, FluxConfig, T5Config, VAEConfig
from textflux_tpu.io.export import export_flux_state_dict, export_lora_state_dict
from textflux_tpu.io.lora import import_lora_factors
from textflux_tpu.io.params import (
    convert_clip_state_dict,
    convert_flux_state_dict,
    convert_t5_state_dict,
    convert_vae_state_dict,
)
from textflux_tpu.models.transformer import init_flux_params
from textflux_tpu.training.train import lora_init

MANIFEST_PATH = os.path.join(os.path.dirname(__file__), "golden",
                             "checkpoint_manifest.json")

# real layer counts, tiny dims (key NAMES depend only on structure)
TINY_FLUX = FluxConfig(in_channels=12, out_channels=4, num_double_layers=19,
                       num_single_layers=38, num_heads=2, head_dim=4,
                       joint_dim=8, pooled_dim=6, time_embed_channels=8)


@pytest.fixture(scope="module")
def manifest():
    with open(MANIFEST_PATH) as f:
        return json.load(f)


class RecordingSD(dict):
    """State-dict wrapper that records which keys ingestion actually reads."""

    def __init__(self, sd):
        super().__init__(sd)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


def test_manifest_pins_real_config_shapes(manifest):
    """Guard that the manifest was dumped from the REAL configs (a tiny or
    wrong-config dump would make every coverage assertion vacuous)."""
    t = manifest["transformer"]
    assert t["x_embedder.weight"] == [3072, 384]          # fill: 384-ch cond
    assert t["proj_out.weight"] == [64, 3072]
    assert t["transformer_blocks.18.attn.to_q.weight"] == [3072, 3072]
    assert t["single_transformer_blocks.37.proj_mlp.weight"] == [12288, 3072]
    assert "transformer_blocks.19.attn.to_q.weight" not in t
    assert manifest["vae"]["encoder.conv_in.weight"] == [128, 3, 3, 3]
    assert manifest["vae"]["decoder.conv_out.weight"] == [3, 128, 3, 3]
    assert manifest["clip"]["text_model.embeddings.token_embedding.weight"] == [49408, 768]
    assert manifest["t5"]["shared.weight"] == [32128, 4096]
    assert manifest["t5"]["encoder.block.23.layer.1.DenseReluDense.wi_0.weight"] == [10240, 4096]
    assert manifest["lora"][
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight"] == [128, 3072]


def test_transformer_export_matches_real_key_set(manifest):
    params = init_flux_params(jax.random.PRNGKey(0), TINY_FLUX)
    sd = export_flux_state_dict(params, TINY_FLUX)
    real = set(manifest["transformer"])
    ours = set(sd)
    assert ours - real == set(), f"export emits keys no real checkpoint has: {sorted(ours - real)[:8]}"
    assert real - ours == set(), f"export misses real keys: {sorted(real - ours)[:8]}"


def test_transformer_ingest_consumes_every_real_key(manifest):
    params = init_flux_params(jax.random.PRNGKey(0), TINY_FLUX)
    sd = RecordingSD(export_flux_state_dict(params, TINY_FLUX))
    convert_flux_state_dict(sd, TINY_FLUX)
    unread = set(manifest["transformer"]) - sd.accessed
    assert unread == set(), f"ingest silently drops real keys: {sorted(unread)[:8]}"


@pytest.fixture(scope="module")
def torch_models(request):
    """Tiny-dim torch models with the REAL structure (layer counts, channel
    equal/unequal transition pattern) for ingest-coverage state dicts."""
    request.getfixturevalue("torch_oracle")
    import torch
    from diffusers import AutoencoderKL
    from transformers import (CLIPTextConfig as HFClipConfig, CLIPTextModel,
                              T5Config as HFT5Config, T5EncoderModel)

    torch.manual_seed(0)
    # (8,16,32,32) mirrors the real (128,256,512,512) transition pattern
    # (differ, differ, same) so conv_shortcut keys appear in the same places
    vae = AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(8, 16, 32, 32), layers_per_block=2,
        latent_channels=16, norm_num_groups=4,
        use_quant_conv=False, use_post_quant_conv=False,
    )
    clip = CLIPTextModel(HFClipConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=12, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
    ))
    t5 = T5EncoderModel(HFT5Config(
        vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=24,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    ))
    to_np = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}  # noqa: E731
    return {"vae": to_np(vae), "clip": to_np(clip), "t5": to_np(t5)}


def test_vae_ingest_covers_real_keys(manifest, torch_models):
    sd = RecordingSD(torch_models["vae"])
    assert set(sd) == set(manifest["vae"]), "tiny VAE structure drifted from the real config"
    convert_vae_state_dict(sd, VAEConfig(block_out_channels=(8, 16, 32, 32),
                                         norm_num_groups=4))
    unread = set(manifest["vae"]) - sd.accessed
    assert unread == set(), f"VAE ingest drops: {sorted(unread)[:8]}"


def test_clip_ingest_covers_real_keys(manifest, torch_models):
    sd = RecordingSD(torch_models["clip"])
    assert set(sd) == set(manifest["clip"]), "tiny CLIP structure drifted from the real config"
    convert_clip_state_dict(sd, CLIPTextConfig(vocab_size=64, hidden_dim=16,
                                               mlp_dim=32, num_layers=12,
                                               num_heads=2))
    unread = set(manifest["clip"]) - sd.accessed
    assert unread == set(), f"CLIP ingest drops: {sorted(unread)[:8]}"


def test_t5_ingest_covers_real_keys(manifest, torch_models):
    sd = RecordingSD(torch_models["t5"])
    assert set(sd) == set(manifest["t5"]), "tiny T5 structure drifted from the real config"
    convert_t5_state_dict(sd, T5Config(vocab_size=64, d_model=16, d_kv=4,
                                       d_ff=32, num_layers=24, num_heads=4,
                                       relative_attention_num_buckets=8,
                                       relative_attention_max_distance=16))
    # encoder.embed_tokens.weight is torch's tied ALIAS of shared.weight;
    # ingestion reads shared.weight (params.py:241 prefers it)
    unread = set(manifest["t5"]) - sd.accessed - {"encoder.embed_tokens.weight"}
    assert unread == set(), f"T5 ingest drops: {sorted(unread)[:8]}"


def test_lora_export_matches_real_peft_layout(manifest):
    params = init_flux_params(jax.random.PRNGKey(0), TINY_FLUX)
    lora = lora_init(jax.random.PRNGKey(1), params, TINY_FLUX, rank=2)
    sd = export_lora_state_dict(lora, TINY_FLUX, alpha=2.0)
    ours = {k for k in sd if not k.endswith(".alpha")}   # alpha: optional extras
    real = set(manifest["lora"])
    assert ours - real == set(), f"LoRA export emits non-peft keys: {sorted(ours - real)[:8]}"
    assert real - ours == set(), f"LoRA export misses peft keys: {sorted(real - ours)[:8]}"


def test_lora_import_consumes_real_peft_layout(manifest):
    """Import from an alpha-free file shaped exactly like the real peft save
    (every manifest key, tiny dims), then re-export: the key set must survive
    the roundtrip and every module must be represented in the factor tree."""
    rng = np.random.default_rng(0)
    d, m, r = TINY_FLUX.hidden_dim, TINY_FLUX.mlp_dim, 2
    sd = {}
    for key, shape in manifest["lora"].items():
        out_real, in_real = shape
        is_a = key.endswith("lora_A.weight")
        # map real dims -> tiny: 3072->d, 12288->m, 128->r
        tiny = {3072: d, 12288: m, 128: r}
        rows = tiny.get(out_real, r if is_a else d)
        cols = tiny.get(in_real, d)
        sd[key] = rng.standard_normal((rows, cols)).astype(np.float32) * 0.01
    factors = import_lora_factors(sd, TINY_FLUX, lora_scale=1.0)
    sd2 = export_lora_state_dict(factors, TINY_FLUX, alpha=1.0, rank=1)
    ours = {k for k in sd2 if not k.endswith(".alpha")}
    assert ours == set(manifest["lora"])
