#!/bin/bash
# LoRA training launcher — TPU equivalent of the reference's
# scripts/train_lora.sh. Rank-128 grouped per-module factors (the exact peft
# family the reference trains), Prodigy optimizer at lr=1 per the reference
# defaults, optional warm start from an existing LoRA via PRETRAINED_LORA
# (the reference's --pretrained_lora_path weights/pytorch_lora_weights.safetensors).
# Add --quantize-base nf4 for QLoRA: the full 12B base in 4-bit lets this run
# on ONE 16 GiB chip.
set -euo pipefail

export MODEL_NAME="${MODEL_NAME:-/path/to/FLUX.1-Fill-dev}"
export OUTPUT_DIR="${OUTPUT_DIR:-outputs/textflux-lora}"

EXTRA=()
if [[ -n "${PRETRAINED_LORA:-}" ]]; then
  EXTRA+=(--pretrained-lora "$PRETRAINED_LORA")
fi

python -m textflux_tpu.cli.train \
  --model "$MODEL_NAME" \
  ${EXTRA[@]+"${EXTRA[@]}"} \
  --data-json "${DATA_JSON:-/path/to/anyword/data.json}" \
  --data-images "${DATA_IMAGES:-/path/to/anyword/images}" \
  --output-dir "$OUTPUT_DIR" \
  --mode lora --lora-rank 128 --lora-alpha 128 \
  --mixed-precision bf16 \
  --train-batch-size 1 \
  --guidance-scale 1 \
  --grad-accum 8 \
  --optimizer prodigy \
  --learning-rate 1 \
  --lr-scheduler constant --lr-warmup-steps 0 \
  --max-train-steps 10000 \
  --seed 42 \
  --max-sequence-length 512 \
  --checkpointing-steps 5000 \
  "$@"
