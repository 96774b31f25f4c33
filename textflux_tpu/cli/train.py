"""Training driver (parity with /root/reference/scripts/train.py and
train_lora.py in one CLI).

Flow per optimizer step (one jitted XLA program):
  text embeddings (frozen CLIP/T5, jitted) -> flow-matching microbatch scan
  with remat -> masked AdamW update over the fsdp-sharded state.

Usage:
  python -m textflux_tpu.cli.train \
      --model /path/to/FLUX.1-Fill-dev [--transformer path] \
      --data-json data.json --data-images imgs/      (AnyWord single-line)
      | --data-dir combined/ [--multi-dataset]       (pre-combined folders)
      --output-dir out/ [--mode attn|all|lora] [--lora-rank 128]
      [--learning-rate 2e-5] [--train-batch-size 1] [--grad-accum 8]
      [--max-train-steps 10000] [--checkpointing-steps 5000]
      [--resume-from-checkpoint latest] [--mesh dp,fsdp,tp]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="textflux-tpu trainer")
    p.add_argument("--model", required=True)
    p.add_argument("--transformer", default=None)
    p.add_argument("--data-json", default=None)
    p.add_argument("--data-images", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--multi-dataset", action="store_true")
    p.add_argument("--caption-type", default="txt")
    p.add_argument("--resolution", type=int, nargs="*", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--mode", choices=["attn", "all", "lora"], default="attn")
    p.add_argument("--lora-rank", type=int, default=128)
    p.add_argument("--lora-alpha", type=float, default=128.0)
    p.add_argument("--quantize-base", choices=["none", "weight_only", "nf4"],
                   default="none",
                   help="LoRA mode only: serve-quantize the FROZEN base DiT "
                        "(int8 weight-only or NF4) so the full-depth 12B LoRA "
                        "step fits a single 16GB chip (QLoRA-equivalent); the "
                        "LoRA branch itself trains in fp32")
    p.add_argument("--learning-rate", type=float, default=2e-5)
    p.add_argument("--adam-beta1", type=float, default=0.9)
    p.add_argument("--adam-beta2", type=float, default=0.999)
    p.add_argument("--adam-epsilon", type=float, default=1e-8)
    p.add_argument("--adam-weight-decay", type=float, default=1e-2)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--logit-mean", type=float, default=0.0,
                   help="timestep-density sampling (weighting-scheme "
                        "logit_normal)")
    p.add_argument("--logit-std", type=float, default=1.0)
    p.add_argument("--mode-scale", type=float, default=1.29)
    p.add_argument("--font-path", default=None,
                   help="glyph font for the AnyWord dataset (default: "
                        "bundled/DejaVu fallback)")
    p.add_argument("--pretrained-lora", default=None,
                   help="warm-start LoRA training from an existing "
                        "pytorch_lora_weights.safetensors (reference "
                        "train_lora.py:536-553)")
    p.add_argument("--optimizer", choices=["adamw", "adamw8bit", "prodigy"],
                   default="adamw")
    p.add_argument("--use-8bit-adam", action="store_true",
                   help="int8 blockwise Adam moments (reference --use_8bit_adam)")
    p.add_argument("--prodigy-beta3", type=float, default=None,
                   help="prodigy D-estimate momentum (default sqrt(beta2), "
                        "reference --prodigy_beta3)")
    p.add_argument("--prodigy-safeguard-warmup", action="store_true",
                   help="remove lr from the prodigy D-estimate denominator "
                        "during warmup (reference --prodigy_safeguard_warmup)")
    p.add_argument("--lr-scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "cosine",
                            "cosine_with_restarts", "linear", "polynomial"])
    p.add_argument("--lr-warmup-steps", type=int, default=0)
    p.add_argument("--lr-num-cycles", type=int, default=1,
                   help="hard restarts in cosine_with_restarts")
    p.add_argument("--lr-power", type=float, default=1.0,
                   help="polynomial schedule exponent")
    p.add_argument("--scale-lr", action="store_true",
                   help="multiply the lr by grad_accum * train_batch_size "
                        "(reference --scale_lr; the batch here is already "
                        "global, so no device-count factor)")
    p.add_argument("--train-batch-size", type=int, default=1)
    p.add_argument("--bucket-quant", type=int, default=None,
                   help="short-side snap multiple for resolution buckets "
                        "(default: 32 at B=1 = exact reference sizing, 128 "
                        "at B>1 so shape-uniform batches fill)")
    p.add_argument("--loader-procs", type=int, default=0,
                   help="sample-prep worker PROCESSES (persistent spawn "
                        "pool, the torch num_workers equivalent); 0 = "
                        "thread prefetch (default — measured ~36 items/s, "
                        "ample for the ~1-4 items/s the 12B step consumes)")
    p.add_argument("--grad-accum", type=int, default=8)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--weighting-scheme", default="none")
    p.add_argument("--schedule-shift", type=float, default=3.0,
                   help="static timestep-schedule shift for the training "
                        "noise density (the reference reads it from the "
                        "scheduler config, scripts/train.py:975-981; FLUX "
                        "ships 3.0). Set it to e^mu of the serving "
                        "resolution's dynamic shift to align the training "
                        "density with the inference sigma trajectory when "
                        "training from scratch")
    p.add_argument("--cond-dropout-prob", type=float, default=0.0,
                   help="dropout on the packed 320-ch conditioning "
                        "(reference --dropout_prob)")
    p.add_argument("--mixed-precision", choices=["bf16", "no"], default="bf16",
                   help="model compute dtype under the jit 'autocast' "
                        "(reference --mixed_precision; fp16 is not offered — "
                        "bf16 is the TPU-native half precision)")
    p.add_argument("--no-gradient-checkpointing", action="store_true",
                   help="disable per-block remat (reference trains WITH "
                        "--gradient_checkpointing; disabling trades memory "
                        "for speed on small models)")
    p.add_argument("--max-train-steps", type=int, default=None,
                   help="total optimizer steps (default: derived from "
                        "--num-train-epochs like the reference when unset)")
    p.add_argument("--num-train-epochs", type=int, default=1,
                   help="used only when --max-train-steps is unset: steps = "
                        "epochs * ceil(len(dataset) / (batch * accum)) "
                        "(reference parser_helper.py:228-233)")
    p.add_argument("--checkpointing-steps", type=int, default=5000)
    p.add_argument("--checkpoints-total-limit", type=int, default=3)
    p.add_argument("--resume-from-checkpoint", default=None)
    p.add_argument("--max-sequence-length", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh", default=None, help="dp,fsdp,tp (default: all fsdp)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--report-to", default="jsonl", choices=["jsonl", "wandb"])
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace for the first N steps")
    return p.parse_args(argv)


def build_dataset(args):
    from textflux_tpu.data import (
        AnyWordSingleLineDataset,
        CombinedFolderDataset,
        UnionDataset,
        PREFERRED_RESOLUTIONS,
    )

    resolutions = args.resolution or PREFERRED_RESOLUTIONS
    # B>1 TPU batches must be shape-uniform; coarsen the aspect lattice so
    # buckets actually fill (data/dataset.py _snap_bucket). B=1 keeps exact
    # reference sizing.
    quant = args.bucket_quant
    if quant is None:
        quant = 128 if args.train_batch_size > 1 else 32
    if args.data_json:
        return AnyWordSingleLineDataset(
            [(args.data_json, args.data_images)], resolutions=resolutions,
            seed=args.seed, bucket_quant=quant, font_path=args.font_path)
    if args.multi_dataset:
        return UnionDataset(args.data_dir, img_size=resolutions,
                            caption_type=args.caption_type, seed=args.seed,
                            bucket_quant=quant)
    return CombinedFolderDataset(args.data_dir, img_size=resolutions,
                                 caption_type=args.caption_type,
                                 seed=args.seed, bucket_quant=quant)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from textflux_tpu.utils.tracking import enable_compilation_cache
    enable_compilation_cache()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from textflux_tpu.config import CLIPTextConfig, FluxConfig, T5Config, VAEConfig
    from textflux_tpu.data import BucketedLoader
    from textflux_tpu.io.export import (
        export_lora_state_dict,
        save_safetensors,
        save_transformer_checkpoint,
    )
    from textflux_tpu.io.params import (
        convert_clip_state_dict,
        convert_t5_state_dict,
        convert_vae_state_dict,
        load_flux_transformer,
        load_safetensors_dir,
        to_device_params,
    )
    from textflux_tpu.models.clip import clip_encode
    from textflux_tpu.models.t5 import t5_encode
    from textflux_tpu.parallel import partitioning as PT
    from textflux_tpu.pipeline.tokenizers import load_tokenizers
    from textflux_tpu.training import train as TR
    from textflux_tpu.training.checkpoint import CheckpointManager

    from textflux_tpu.io.config_io import (
        clip_config_from,
        flux_config_from,
        t5_config_from,
        vae_config_from,
    )

    t_path_cfg = args.transformer or os.path.join(args.model, "transformer")
    flux_cfg = flux_config_from(t_path_cfg)
    vae_cfg = vae_config_from(os.path.join(args.model, "vae"))
    clip_cfg = clip_config_from(os.path.join(args.model, "text_encoder"))
    t5_cfg = t5_config_from(os.path.join(args.model, "text_encoder_2"))

    # the dataset is host-side and cheap to index; built before the config so
    # --num-train-epochs can derive the step budget like the reference
    # (scripts/train.py:806-834)
    dataset = build_dataset(args)
    if args.max_train_steps is None:
        import math

        steps_per_epoch = math.ceil(
            len(dataset) / (args.train_batch_size * args.grad_accum))
        args.max_train_steps = args.num_train_epochs * steps_per_epoch
        print(f"derived max_train_steps={args.max_train_steps} "
              f"({args.num_train_epochs} epochs x {steps_per_epoch} steps)")
    if args.scale_lr:
        args.learning_rate *= args.grad_accum * args.train_batch_size

    tc = TR.TrainConfig(
        learning_rate=args.learning_rate,
        optimizer="adamw8bit" if args.use_8bit_adam else args.optimizer,
        lr_scheduler=("constant" if args.lr_scheduler == "constant_with_warmup"
                      else args.lr_scheduler),
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        adam_b1=args.adam_beta1,
        adam_b2=args.adam_beta2,
        adam_eps=args.adam_epsilon,
        weight_decay=args.adam_weight_decay,
        max_grad_norm=args.max_grad_norm,
        guidance_scale=args.guidance_scale,
        weighting_scheme=args.weighting_scheme,
        schedule_shift=args.schedule_shift,
        logit_mean=args.logit_mean,
        logit_std=args.logit_std,
        mode_scale=args.mode_scale,
        grad_accum=args.grad_accum,
        mode=args.mode,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        cond_dropout_prob=args.cond_dropout_prob,
        compute_dtype="bfloat16" if args.mixed_precision == "bf16" else "float32",
        remat=not args.no_gradient_checkpointing,
        prodigy_beta3=args.prodigy_beta3,
        prodigy_safeguard_warmup=args.prodigy_safeguard_warmup,
        lr_num_cycles=args.lr_num_cycles,
        lr_power=args.lr_power,
    )

    # mesh
    n = len(jax.devices())
    if args.mesh:
        shape = tuple(int(x) for x in args.mesh.split(","))
    else:
        shape = (1, n, 1)
    mesh = PT.make_mesh(shape)
    dp = shape[0] * shape[1]
    if args.train_batch_size % dp:
        raise SystemExit(
            f"--train-batch-size {args.train_batch_size} must be divisible by "
            f"the mesh's data x fsdp product ({shape[0]}x{shape[1]}={dp}): "
            f"the batch axis shards over both mesh axes")

    # models
    t_path = args.transformer or os.path.join(args.model, "transformer")
    if args.quantize_base != "none" and args.mode != "lora":
        raise SystemExit("--quantize-base requires --mode lora (full-param "
                         "training cannot update a quantized base)")
    if args.quantize_base != "none":
        from textflux_tpu.io.quantize import quantize_tree

        # host=True + leaf-wise quantize: each full-precision weight visits
        # the device one at a time and only its quantized form stays — the
        # 12B base never materializes whole in HBM (the single-chip QLoRA
        # path; a plain load would commit ~24 GB bf16 to one 16 GB chip
        # before quantize_tree ever ran)
        params = quantize_tree(
            load_flux_transformer(t_path, flux_cfg, host=True),
            mode=args.quantize_base)
    else:
        # mesh-aware load: every weight device_puts straight onto its GSPMD
        # shards, so fsdp-meshed full-param training never stages the whole
        # model on device 0
        params = load_flux_transformer(
            t_path, flux_cfg,
            dtype=jnp.float32 if args.mode != "lora" else jnp.bfloat16,
            mesh=mesh if mesh.devices.size > 1 else None)
    vae_params = to_device_params(
        convert_vae_state_dict(load_safetensors_dir(os.path.join(args.model, "vae")), vae_cfg))
    clip_params = to_device_params(
        convert_clip_state_dict(load_safetensors_dir(os.path.join(args.model, "text_encoder")), clip_cfg))
    t5_params = to_device_params(
        convert_t5_state_dict(load_safetensors_dir(os.path.join(args.model, "text_encoder_2")), t5_cfg))
    clip_tok, t5_tok = load_tokenizers(args.model, max_t5_length=args.max_sequence_length)

    encode_text = jax.jit(lambda cp, tp, cids, tids: (
        clip_encode(cp, clip_cfg, cids, dtype=jnp.bfloat16)[1],
        t5_encode(tp, t5_cfg, tids, dtype=jnp.bfloat16),
    ))

    with mesh:
        params = PT.shard_tree(
            params,
            PT.adapt_specs_to_params(PT.flux_param_specs(flux_cfg), params),
            mesh)
        vae_params = PT.replicate_tree(vae_params, mesh)

        ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                                 max_to_keep=args.checkpoints_total_limit)

        if args.mode == "lora":
            lora = TR.lora_init(jax.random.PRNGKey(args.seed), params, flux_cfg, tc.lora_rank)
            if args.pretrained_lora:
                # warm start (reference train_lora.py:536-553): imported
                # targets replace their fresh init; fused targets come back
                # at rank sum(r_m) — lora_insert handles per-target ranks
                from textflux_tpu.io.lora import import_lora_factors
                from textflux_tpu.io.params import load_safetensors_dir

                imported = import_lora_factors(
                    load_safetensors_dir(args.pretrained_lora), flux_cfg,
                    tc.lora_alpha / tc.lora_rank)
                n = 0
                for group, tree in imported.items():
                    for name, f in tree.items():
                        lora[group][name] = {
                            "a": jnp.asarray(f["a"]), "b": jnp.asarray(f["b"])}
                        n += 1
                print(f"warm-started {n} LoRA targets from {args.pretrained_lora}")
            # replicated factors over the sharded base (lora_param_specs
            # documents the decision); opt_state inherits the replication
            lora = PT.shard_tree(lora, PT.lora_param_specs(lora), mesh)
            tx = TR.make_optimizer(tc)
            opt_state = tx.init(lora)
            # donate the lora/opt_state buffers (reassigned every step)
            step_fn = jax.jit(TR.make_lora_train_step(flux_cfg, vae_cfg, tc, tx),
                              donate_argnums=(1, 2))
            state = {"lora": lora, "opt_state": opt_state, "step": 0}
        else:
            mask = (TR.attn_only_mask(params, flux_cfg, tc) if args.mode == "attn"
                    else TR.all_trainable_mask(params))
            tx = TR.make_optimizer(tc, mask)
            opt_state = tx.init(params)
            import jax as _jax
            trainable = _jax.tree.map(TR.np_any_trainable, mask)
            # donate params/opt_state (reassigned every step): halves the
            # peak param-buffer footprint of the 12B step
            step_fn = jax.jit(TR.make_train_step(
                flux_cfg, vae_cfg, tc, tx, trainable_leaves=trainable),
                donate_argnums=(0, 1))
            state = {"params": params, "opt_state": opt_state, "step": 0}

        if args.resume_from_checkpoint:
            # honor the VALUE: 'latest', a bare step number, or a checkpoint
            # path ending in the step number (reference accelerate semantics
            # — resuming a specific step must not silently load the latest)
            want = args.resume_from_checkpoint
            if want == "latest":
                step_arg = None
            else:
                base = os.path.basename(os.path.normpath(want))
                if not base.isdigit():
                    raise SystemExit(
                        f"--resume-from-checkpoint expects 'latest', a step "
                        f"number, or a checkpoint path ending in the step "
                        f"number; got {want!r}")
                step_arg = int(base)
            if step_arg is not None and step_arg not in ckpt.manager.all_steps():
                raise SystemExit(
                    f"no checkpoint at step {step_arg} under "
                    f"{os.path.join(args.output_dir, 'checkpoints')} "
                    f"(available: {sorted(ckpt.manager.all_steps())})")
            restored = ckpt.restore(step_arg, template=state)
            if restored is not None:
                state = restored
                print(f"resumed from step {state['step']}")

        samples_per_batch = args.train_batch_size * args.grad_accum
        if len(dataset) < samples_per_batch:
            # without this, the epoch loop below spins FOREVER: every epoch
            # yields zero full batches (shape-uniform batches are required,
            # partials are dropped) and no step ever runs — observed as a
            # silent infinite loop with the default --grad-accum 8 on a
            # tiny dataset
            raise SystemExit(
                f"dataset has {len(dataset)} sample(s) but one optimizer "
                f"step needs --train-batch-size x --grad-accum = "
                f"{samples_per_batch}; reduce them or add data (and note "
                f"per-bucket batches must FILL — mixed-resolution data "
                f"needs enough samples per bucket, see --bucket-quant)")
        loader = BucketedLoader(
            dataset, batch_size=args.train_batch_size,
            grad_accum=args.grad_accum, seed=args.seed,
            num_procs=args.loader_procs,
            # spawn-picklable: module-level fn + argparse Namespace
            dataset_factory=(functools.partial(build_dataset, args)
                             if args.loader_procs else None))
        bspec = NamedSharding(mesh, P(None, ("data", "fsdp")))

        from textflux_tpu.utils.tracking import Tracker, profile_trace

        # TPU-pod preemption safety: on SIGTERM (the preemption notice),
        # finish the in-flight step, checkpoint, and exit cleanly so
        # `--resume-from-checkpoint latest` continues where it stopped.
        # (The reference's accelerate/DeepSpeed stack loses everything since
        # the last --checkpointing_steps save.)
        import signal

        preempt = {"seen": False}

        def _on_sigterm(signum, frame):
            preempt["seen"] = True

        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (in-process test harness)
            prev_sigterm = None

        # per-step noise keys derive as fold_in(base, step) below: a pure
        # function of (seed, step), so a resumed run CONTINUES the stream
        # instead of replaying steps 1..N's noise/timestep draws
        base_key = jax.random.PRNGKey(args.seed)
        step = int(state["step"])
        if step:
            # position the data order too: completed-epoch count (the exact
            # intra-epoch position is undefined under racing prefetch
            # workers, but the resumed epochs must not replay epoch 0)
            batches_per_epoch = max(
                1, len(dataset) // (args.train_batch_size * args.grad_accum))
            loader.set_epoch(step // batches_per_epoch)
        log_path = os.path.join(args.output_dir, "train_log.jsonl")
        os.makedirs(args.output_dir, exist_ok=True)
        tracker = Tracker(args.output_dir, use_wandb=(args.report_to == "wandb"),
                          config=vars(args))
        if args.profile_steps:
            profiler_ctx = profile_trace(os.path.join(args.output_dir, "profile"))
            profiler_ctx.__enter__()
        t_start = time.time()

        while step < args.max_train_steps:
            epoch_batches = 0
            for batch in loader:
                epoch_batches += 1
                if step >= args.max_train_steps:
                    break
                cids = np.concatenate([clip_tok(p) for p in batch["clip_prompts"]])
                tids = np.concatenate([t5_tok(p) for p in batch["prompts"]])
                pooled, txt = encode_text(clip_params, t5_params,
                                          jnp.asarray(cids), jnp.asarray(tids))
                a, b = args.grad_accum, args.train_batch_size
                device_batch = {
                    "pixel_values": jax.device_put(
                        jnp.asarray(batch["pixel_values"], jnp.bfloat16), bspec),
                    "mask": jax.device_put(jnp.asarray(batch["mask"], jnp.bfloat16), bspec),
                    "txt": jax.device_put(txt.reshape(a, b, *txt.shape[1:]), bspec),
                    "pooled": jax.device_put(pooled.reshape(a, b, -1), bspec),
                }
                sub = jax.random.fold_in(base_key, step)
                if args.mode == "lora":
                    state["lora"], state["opt_state"], metrics = step_fn(
                        params, state["lora"], state["opt_state"], vae_params,
                        device_batch, sub)
                else:
                    state["params"], state["opt_state"], metrics = step_fn(
                        state["params"], state["opt_state"], mask, vae_params,
                        device_batch, sub)
                step += 1
                state["step"] = step

                if args.profile_steps and step == args.profile_steps:
                    jax.block_until_ready(metrics["loss"])
                    profiler_ctx.__exit__(None, None, None)
                if step % args.log_every == 0:
                    entry = {"step": step, "loss": float(metrics["loss"]),
                             "grad_norm": float(metrics["grad_norm"]),
                             "elapsed_s": round(time.time() - t_start, 1)}
                    print(json.dumps(entry))
                    with open(log_path, "a") as f:
                        f.write(json.dumps(entry) + "\n")
                    tracker.log({"loss": entry["loss"], "grad_norm": entry["grad_norm"]},
                                step)
                if step % args.checkpointing_steps == 0:
                    ckpt.save(step, state, wait=preempt["seen"])
                elif preempt["seen"]:
                    ckpt.save(step, state, wait=True)
                if preempt["seen"]:
                    break
            if preempt["seen"]:
                break
            if epoch_batches == 0:
                # enough samples overall, but no single (H, W) bucket ever
                # filled a batch — the same silent-infinite-loop mode as the
                # too-small-dataset case above, reachable with
                # mixed-resolution data at B>1 (see --bucket-quant)
                raise SystemExit(
                    "a full data epoch produced zero full batches: no "
                    "resolution bucket reached --train-batch-size x "
                    "--grad-accum samples; coarsen --bucket-quant, reduce "
                    "the batch settings, or add data per bucket")

        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
        if preempt["seen"]:
            entry = {"step": step, "preempted": True}
            print(json.dumps(entry))
            with open(log_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            print("preempted: checkpoint saved; resume with "
                  "--resume-from-checkpoint latest")
            return

        # final artifact in diffusers layout
        if args.mode == "lora":
            sd = export_lora_state_dict(state["lora"], flux_cfg, tc.lora_alpha,
                                        rank=tc.lora_rank)
            save_safetensors(sd, os.path.join(args.output_dir,
                                              "pytorch_lora_weights.safetensors"))
        else:
            save_transformer_checkpoint(state["params"], flux_cfg,
                                        os.path.join(args.output_dir, "transformer"))
        ckpt.wait()  # drain any in-flight async orbax write before exit
        print("training complete")


if __name__ == "__main__":
    main()
