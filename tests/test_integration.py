"""Full-stack integration: a tiny diffusers-layout checkpoint on disk ->
FillPipeline.from_pretrained -> image; trainer CLI end-to-end with resume."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory, request):
    request.getfixturevalue("torch_oracle")
    import torch
    from diffusers import AutoencoderKL, FluxTransformer2DModel
    from transformers import (
        CLIPTextConfig as HFClipConfig,
        CLIPTextModel,
        PreTrainedTokenizerFast,
        T5Config as HFT5Config,
        T5EncoderModel,
    )
    from tokenizers import Tokenizer, models, pre_tokenizers

    root = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)

    # latent 4ch, vae 2x => cond 4*4 + 4*4 = 32; in = 16 + 32 = 48
    FluxTransformer2DModel(
        patch_size=1, in_channels=48, out_channels=16, num_layers=1, num_single_layers=1,
        num_attention_heads=2, attention_head_dim=8, joint_attention_dim=32,
        pooled_projection_dim=16, guidance_embeds=True, axes_dims_rope=[4, 2, 2],
    ).save_pretrained(root / "transformer")
    AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 2, up_block_types=("UpDecoderBlock2D",) * 2,
        block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, scaling_factor=0.5, shift_factor=0.1,
        use_quant_conv=False, use_post_quant_conv=False,
    ).save_pretrained(root / "vae")
    CLIPTextModel(HFClipConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=3, bos_token_id=2, pad_token_id=0,
    )).save_pretrained(root / "text_encoder")
    T5EncoderModel(HFT5Config(
        vocab_size=64, d_model=32, d_kv=4, d_ff=32, num_layers=1, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )).save_pretrained(root / "text_encoder_2")

    vocab = {"<unk>": 1, "<pad>": 0, "<bos>": 2, "<eos>": 3}
    for i, w in enumerate("the a image text words with of on and is".split()):
        vocab[w] = 4 + i
    for name in ("tokenizer", "tokenizer_2"):
        tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        fast = PreTrainedTokenizerFast(
            tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>",
            bos_token="<bos>", eos_token="<eos>")
        fast.save_pretrained(root / name)
    return str(root)


def test_from_pretrained_end_to_end(tiny_checkpoint, rng):
    import jax.numpy as jnp

    from textflux_tpu.config import PipelineConfig
    from textflux_tpu.pipeline.fill import FillPipeline

    pipe = FillPipeline.from_pretrained(
        tiny_checkpoint, dtype=jnp.float32,
        pipe_cfg=PipelineConfig(num_inference_steps=2, max_sequence_length=16),
        attn_impl="xla")
    img = Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8))
    mask = np.zeros((32, 48), np.uint8)
    mask[10:20, 10:30] = 255
    out = pipe(image=img, mask_image=Image.fromarray(mask), words=["the words"],
               seed=1, dtype=jnp.float32)
    assert out[0].size == (48, 32)


def test_train_cli_end_to_end(tiny_checkpoint, tmp_path, rng):
    from textflux_tpu.cli.train import main

    data_dir = tmp_path / "data"
    (data_dir / "mask").mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            data_dir / f"s_{i}.png")
        m = np.zeros((64, 64), np.uint8)
        m[20:40, 20:40] = 255
        Image.fromarray(m).save(data_dir / "mask" / f"s_{i}_mask.png")
        (data_dir / f"s_{i}.txt").write_text("the text\n")

    out_dir = tmp_path / "out"
    args = [
        "--model", tiny_checkpoint,
        "--data-dir", str(data_dir),
        "--resolution", "64",
        "--output-dir", str(out_dir),
        "--mode", "attn",
        "--train-batch-size", "1",
        "--grad-accum", "2",
        "--max-train-steps", "2",
        "--checkpointing-steps", "1",
        "--max-sequence-length", "16",
        "--log-every", "1",
        "--mesh", "1,1,1",
    ]
    main(args)
    assert (out_dir / "transformer" / "config.json").exists()
    assert (out_dir / "transformer" / "diffusion_pytorch_model.safetensors").exists()
    log = (out_dir / "train_log.jsonl").read_text().strip().splitlines()
    assert len(log) == 2
    assert np.isfinite(json.loads(log[0])["loss"])

    # resume from step-2 checkpoint, run to step 3
    args2 = [a for a in args]
    args2[args2.index("--max-train-steps") + 1] = "3"
    main(args2 + ["--resume-from-checkpoint", "latest"])
    log2 = (out_dir / "train_log.jsonl").read_text().strip().splitlines()
    assert json.loads(log2[-1])["step"] == 3


def test_train_cli_lora(tiny_checkpoint, tmp_path, rng):
    from textflux_tpu.cli.train import main

    data_dir = tmp_path / "data"
    (data_dir / "mask").mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            data_dir / f"s_{i}.png")
        Image.fromarray(np.full((64, 64), 255, np.uint8)).save(
            data_dir / "mask" / f"s_{i}_mask.png")
        (data_dir / f"s_{i}.txt").write_text("words\n")

    out_dir = tmp_path / "out_lora"
    main([
        "--model", tiny_checkpoint,
        "--data-dir", str(data_dir),
        "--resolution", "64",
        "--output-dir", str(out_dir),
        "--mode", "lora", "--lora-rank", "2", "--lora-alpha", "2",
        "--train-batch-size", "1", "--grad-accum", "1",
        "--max-train-steps", "1", "--checkpointing-steps", "10",
        "--max-sequence-length", "16", "--log-every", "1", "--mesh", "1,1,1",
    ])
    assert (out_dir / "pytorch_lora_weights.safetensors").exists()
