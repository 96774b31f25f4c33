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
    steps = [json.loads(l)["step"] for l in log2]
    # the whole file must be ONE strictly increasing pass: a broken resume
    # that fresh-initializes at step 0 also ends at step 3 and keeps the
    # last-line assertion green, but re-appends steps 1..3 -> [1,2,1,2,3]
    assert steps == [1, 2, 3], steps


def test_train_cli_schedule_shift_reaches_train_config(
        tiny_checkpoint, tmp_path, monkeypatch, rng):
    """The args -> TrainConfig link: run the REAL cli.train main with a spy
    on make_train_step and assert the tc it receives carries the
    --schedule-shift value. Deleting `schedule_shift=args.schedule_shift`
    from the TrainConfig construction must fail a test, not silently
    re-create the round-4 undertraining (the parsing + math-identity test
    in test_training.py cannot see this link)."""
    from textflux_tpu.cli.train import main
    from textflux_tpu.training import train as training_mod

    seen = {}
    orig = training_mod.make_train_step

    def spy(flux_cfg, vae_cfg, tc, tx, **kw):
        seen["schedule_shift"] = tc.schedule_shift
        return orig(flux_cfg, vae_cfg, tc, tx, **kw)

    monkeypatch.setattr(training_mod, "make_train_step", spy)

    data_dir = tmp_path / "ss_data"
    (data_dir / "mask").mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        data_dir / "s_0.png")
    Image.fromarray(np.full((64, 64), 255, np.uint8)).save(
        data_dir / "mask" / "s_0_mask.png")
    (data_dir / "s_0.txt").write_text("x\n")
    main([
        "--model", tiny_checkpoint, "--data-dir", str(data_dir),
        "--resolution", "64", "--output-dir", str(tmp_path / "ss_out"),
        "--max-train-steps", "1", "--max-sequence-length", "16",
        "--train-batch-size", "1", "--grad-accum", "1",
        "--log-every", "1", "--mesh", "1,1,1", "--mode", "attn",
        "--schedule-shift", "1.75",
    ])
    assert seen.get("schedule_shift") == pytest.approx(1.75)

    # the too-small-dataset guard: 1 sample cannot fill the default
    # batch-size x grad-accum(8) — must error loudly, not spin forever
    # re-iterating empty epochs (the pre-guard behavior)
    with pytest.raises(SystemExit, match="one optimizer step needs"):
        main([
            "--model", tiny_checkpoint, "--data-dir", str(data_dir),
            "--resolution", "64", "--output-dir", str(tmp_path / "ss_out2"),
            "--max-train-steps", "1", "--max-sequence-length", "16",
            "--log-every", "1", "--mesh", "1,1,1", "--mode", "attn",
        ])


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


def test_train_cli_rejects_indivisible_batch(tiny_checkpoint, tmp_path):
    """The batch axis shards over (data, fsdp); a global batch that does not
    divide their product must fail fast with guidance, not deep inside
    device_put mid-training."""
    import pytest

    from textflux_tpu.cli.train import main

    with pytest.raises(SystemExit, match="divisible by"):
        main([
            "--model", tiny_checkpoint,
            "--data-dir", str(tmp_path),
            "--output-dir", str(tmp_path / "out"),
            "--mesh", "1,2,1", "--train-batch-size", "1",
            "--max-train-steps", "1",
        ])


def test_staged_residency_matches_resident(tiny_checkpoint, rng):
    """defer_transformer: encode -> release_text_encoders -> load_transformer
    -> __call__(text_embeds) must equal the all-resident pipeline bitwise
    (same RNG streams; the text embeds are the same arrays)."""
    import jax.numpy as jnp

    from textflux_tpu.config import PipelineConfig
    from textflux_tpu.pipeline.fill import FillPipeline
    from textflux_tpu.pipeline.prompts import build_prompts

    cfgp = PipelineConfig(num_inference_steps=2, max_sequence_length=16)
    img = Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8))
    mask = np.zeros((32, 48), np.uint8)
    mask[10:20, 10:30] = 255
    mask_img = Image.fromarray(mask)

    ref_pipe = FillPipeline.from_pretrained(
        tiny_checkpoint, dtype=jnp.float32, pipe_cfg=cfgp, attn_impl="xla")
    ref = np.asarray(ref_pipe(image=img, mask_image=mask_img,
                              words=["the words"], seed=1, dtype=jnp.float32,
                              output_type="np")[0])

    pipe = FillPipeline.from_pretrained(
        tiny_checkpoint, dtype=jnp.float32, pipe_cfg=cfgp, attn_impl="xla",
        defer_transformer=True)
    assert pipe.flux_params is None
    prompt, prompt_2 = build_prompts(["the words"])
    embeds = pipe.encode_prompts(prompt, prompt_2, dtype=jnp.float32)
    pipe.release_text_encoders()
    assert pipe.t5_params is None and pipe.clip_params is None
    pipe.load_transformer()
    assert pipe.flux_params is not None
    out = np.asarray(pipe(image=img, mask_image=mask_img, text_embeds=embeds,
                          seed=1, dtype=jnp.float32, output_type="np")[0])
    np.testing.assert_array_equal(out, ref)


def test_generate_batch_text_embeds_matches(tiny_checkpoint, rng):
    """generate_batch(text_embeds=encode_batch_prompts(...)) == the internal
    encode path (staged eval CLI correctness)."""
    import jax.numpy as jnp

    from textflux_tpu.config import PipelineConfig
    from textflux_tpu.pipeline.fill import FillPipeline

    cfgp = PipelineConfig(num_inference_steps=2, max_sequence_length=16)
    pipe = FillPipeline.from_pretrained(
        tiny_checkpoint, dtype=jnp.float32, pipe_cfg=cfgp, attn_impl="xla")
    imgs = [Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8))
            for _ in range(2)]
    masks = []
    for _ in range(2):
        m = np.zeros((32, 48), np.uint8)
        m[8:22, 12:30] = 255
        masks.append(Image.fromarray(m))
    words = [["the words"], ["a image"]]

    ref = pipe.generate_batch(imgs, masks, words, height=32, width=48,
                              seeds=[1, 2], dtype=jnp.float32)
    embeds = pipe.encode_batch_prompts(words, dtype=jnp.float32)
    out = pipe.generate_batch(imgs, masks, words, height=32, width=48,
                              seeds=[1, 2], dtype=jnp.float32,
                              text_embeds=(np.asarray(embeds[0]), np.asarray(embeds[1])))
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_t5_loads_and_is_close(tiny_checkpoint):
    """quantize_t5 stores the T5 int8 weight-only; embeddings stay close to
    the bf16/fp32 path (int8 per-channel quantization error only)."""
    import jax.numpy as jnp

    from textflux_tpu.config import PipelineConfig
    from textflux_tpu.pipeline.fill import FillPipeline

    from textflux_tpu.io import quantize as QZ

    calls = []
    orig_qt = QZ.quantize_tree

    def spy(tree, **kw):
        calls.append(kw)
        return orig_qt(tree, **kw)

    cfgp = PipelineConfig(num_inference_steps=2, max_sequence_length=16)
    QZ.quantize_tree = spy
    try:
        ref_pipe = FillPipeline.from_pretrained(
            tiny_checkpoint, dtype=jnp.float32, pipe_cfg=cfgp, attn_impl="xla")
        assert not calls, "quantize_tree ran without any quantize flag"
        q_pipe = FillPipeline.from_pretrained(
            tiny_checkpoint, dtype=jnp.float32, pipe_cfg=cfgp, attn_impl="xla",
            quantize_t5=True)
        # the FLAG must actually route the T5 through quantize_tree (the
        # hand re-quant below would otherwise hide a from_pretrained that
        # ignores quantize_t5 entirely)
        assert any(kw.get("mode") == "weight_only" for kw in calls), calls
    finally:
        QZ.quantize_tree = orig_qt
    # tiny T5 weights are below the quantize_tree min_size; force by re-quant
    from textflux_tpu.io.quantize import quantize_tree
    q_pipe.t5_params = quantize_tree(ref_pipe.t5_params, min_size=0,
                                     mode="weight_only")
    p_ref, t_ref = ref_pipe.encode_prompts("the words", "a image with text",
                                           dtype=jnp.float32)
    p_q, t_q = q_pipe.encode_prompts("the words", "a image with text",
                                     dtype=jnp.float32)
    assert np.allclose(np.asarray(t_ref), np.asarray(t_q), atol=0.1, rtol=0.2)
    assert np.asarray(t_q).std() > 0


def test_train_cli_preemption_checkpoint(tiny_checkpoint, tmp_path, rng):
    """SIGTERM (the TPU-pod preemption notice) mid-run: the trainer finishes
    the in-flight step, saves a checkpoint, logs {'preempted': true}, skips
    the final export, and `--resume-from-checkpoint latest` continues."""
    import os
    import signal
    import threading
    import time

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
    log = out_dir / "train_log.jsonl"
    args = [
        "--model", tiny_checkpoint,
        "--data-dir", str(data_dir),
        "--resolution", "64",
        "--output-dir", str(out_dir),
        "--mode", "attn",
        "--train-batch-size", "1",
        "--grad-accum", "1",
        "--max-train-steps", "50",
        "--checkpointing-steps", "100",   # never reached: only the preemption saves
        "--max-sequence-length", "16",
        "--log-every", "1",
        "--mesh", "1,1,1",
    ]

    def preempt_after_first_step():
        deadline = time.time() + 300
        while time.time() < deadline:
            if log.exists() and log.read_text().strip():
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.2)

    threading.Thread(target=preempt_after_first_step, daemon=True).start()
    main(args)

    lines = [json.loads(l) for l in log.read_text().strip().splitlines()]
    assert lines[-1].get("preempted") is True
    stop_step = lines[-1]["step"]
    assert 1 <= stop_step < 50
    assert not (out_dir / "transformer").exists()   # no half-trained final export

    args2 = [a for a in args]
    args2[args2.index("--max-train-steps") + 1] = str(stop_step + 1)
    main(args2 + ["--resume-from-checkpoint", "latest"])
    lines2 = [json.loads(l) for l in log.read_text().strip().splitlines()]
    assert lines2[-1]["step"] == stop_step + 1
    assert np.isfinite(lines2[-1]["loss"])
    # the resumed run must CONTINUE, not retrain: every line it appended
    # has step > stop_step (a fresh-init "resume" re-logs steps 1..N and
    # still satisfies the last-line checks above)
    step_lines = [l["step"] for l in lines2 if "step" in l and "loss" in l]
    assert step_lines == sorted(step_lines) and \
        len(step_lines) == len(set(step_lines)), step_lines
    assert (out_dir / "transformer" / "config.json").exists()
