"""Dump the REAL FLUX.1-Fill-dev checkpoint key manifests (offline, meta tensors).

VERDICT r4 item 4: MIGRATION.md promises weight interchangeability, but the
ingest/export maps were only ever exercised against checkpoints this repo
generated itself. This script instantiates the reference's exact model
configs with the vendored torch diffusers/transformers on the torch `meta`
device (zero weight memory, zero egress) and records every state-dict key
with its shape:

  - FluxTransformer2DModel, the FLUX.1-Fill config
    (/root/reference/diffusers/.../transformer_flux.py:865-879: in 384,
    out 64, 19+38 blocks, 24x128 heads, guidance_embeds=True)
  - AutoencoderKL, the FLUX VAE config (16 latent ch, (128,256,512,512),
    layers_per_block 2, no quant convs)
  - CLIPTextModel, CLIP-L text config (pooled encoder)
  - T5EncoderModel, T5-XXL v1.1 config
  - the peft rank-128 LoRA layout the reference trains
    (/root/reference/scripts/train_lora.py:508-534, saved through
    FluxFillPipeline.save_lora_weights -> 'transformer.' prefix)

Output: tests/golden/checkpoint_manifest.json, the fixture for
tests/test_checkpoint_manifest.py (bidirectional key-coverage audit).

Usage: python benchmarks/dump_checkpoint_manifest.py
"""
import json
import os
import sys

sys.path.insert(0, "/root/reference/diffusers/src")


def dump_state_keys(model) -> dict:
    return {k: list(v.shape) for k, v in sorted(model.state_dict().items())}


def main() -> int:
    import torch
    from diffusers import AutoencoderKL, FluxTransformer2DModel
    from transformers import CLIPTextConfig, CLIPTextModel, T5Config, T5EncoderModel

    with torch.device("meta"):
        transformer = FluxTransformer2DModel(
            patch_size=1, in_channels=384, out_channels=64,
            num_layers=19, num_single_layers=38,
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=4096, pooled_projection_dim=768,
            guidance_embeds=True, axes_dims_rope=(16, 56, 56),
        )
        vae = AutoencoderKL(
            in_channels=3, out_channels=3,
            down_block_types=("DownEncoderBlock2D",) * 4,
            up_block_types=("UpDecoderBlock2D",) * 4,
            block_out_channels=(128, 256, 512, 512), layers_per_block=2,
            latent_channels=16, norm_num_groups=32, sample_size=1024,
            scaling_factor=0.3611, shift_factor=0.1159,
            use_quant_conv=False, use_post_quant_conv=False,
        )
        clip = CLIPTextModel(CLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, hidden_act="quick_gelu",
            projection_dim=768,
        ))
        t5 = T5EncoderModel(T5Config(
            vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240,
            num_layers=24, num_heads=64, relative_attention_num_buckets=32,
            relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
            dropout_rate=0.1, is_encoder_decoder=False,
        ))

    manifest = {
        "transformer": dump_state_keys(transformer),
        "vae": dump_state_keys(vae),
        "clip": dump_state_keys(clip),
        "t5": dump_state_keys(t5),
    }

    # peft LoRA layout: inject the reference's exact adapter config, then
    # reproduce the on-disk naming of FluxFillPipeline.save_lora_weights
    # (lora_pipeline.py:2005): get_peft_model_state_dict keys (adapter-name
    # infix stripped) + 'transformer.' prefix.
    from peft import LoraConfig
    from peft.utils import get_peft_model_state_dict

    target_modules = [
        "attn.to_k", "attn.to_q", "attn.to_v", "attn.to_out.0",
        "attn.add_k_proj", "attn.add_q_proj", "attn.add_v_proj",
        "attn.to_add_out", "ff.net.0.proj", "ff.net.2",
        "ff_context.net.0.proj", "ff_context.net.2",
    ]
    transformer.add_adapter(LoraConfig(
        r=128, lora_alpha=128, init_lora_weights="gaussian",
        target_modules=target_modules))
    lora_sd = get_peft_model_state_dict(transformer)
    manifest["lora"] = {f"transformer.{k}": list(v.shape)
                        for k, v in sorted(lora_sd.items())}

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "golden", "checkpoint_manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    for name, keys in manifest.items():
        print(f"{name:12s} {len(keys):5d} keys")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
