#!/bin/bash
# LoRA training launcher — TPU equivalent of the reference's
# scripts/train_lora.sh. Rank-128 grouped per-module factors (the exact peft
# family the reference trains). Add --quantize-base nf4 for QLoRA: the full
# 12B base in 4-bit lets this run on ONE 16 GiB chip.
set -euo pipefail

export MODEL_NAME="${MODEL_NAME:-/path/to/FLUX.1-Fill-dev}"
export INSTANCE_DIR="${INSTANCE_DIR:-cat}"
export OUTPUT_DIR="${OUTPUT_DIR:-outputs/textflux-lora}"

python -m textflux_tpu.cli.train \
  --model "$MODEL_NAME" \
  --data-dir "$INSTANCE_DIR" \
  --output-dir "$OUTPUT_DIR" \
  --mode lora --lora-rank 128 \
  --mixed-precision bf16 \
  --train-batch-size 1 \
  --guidance-scale 1 \
  --grad-accum 8 \
  --optimizer adamw --use-8bit-adam \
  --learning-rate 1e-4 \
  --lr-scheduler constant --lr-warmup-steps 0 \
  --max-train-steps 10000 \
  --seed 42 \
  --max-sequence-length 512 \
  --checkpointing-steps 5000 \
  "$@"
