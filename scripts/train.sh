#!/bin/bash
# Full-parameter training launcher — TPU equivalent of the reference's
# scripts/train.sh (accelerate launch scripts/train.py). One process drives
# the whole mesh via GSPMD; no accelerate/DeepSpeed config needed — the
# default all-fsdp mesh is the ZeRO-2 equivalent (pass --mesh dp,fsdp,tp to
# change the layout). See MIGRATION.md for the flag-by-flag map.
set -euo pipefail

export MODEL_NAME="${MODEL_NAME:-/path/to/FLUX.1-Fill-dev}"
export OUTPUT_DIR="${OUTPUT_DIR:-outputs/textflux-beta}"

EXTRA=()
if [[ -n "${PRETRAINED_TRANSFORMER:-}" ]]; then
  EXTRA+=(--transformer "$PRETRAINED_TRANSFORMER")
fi

# DATA_JSON/DATA_IMAGES select the AnyWord single-line dataset family — the
# reference's single-line DynamicConcatDataset path behind --instance_data_dir
# (see MIGRATION.md). For the pre-combined multi-line folder layout use
# DATA_DIR=... and swap --data-json/--data-images for --data-dir.
python -m textflux_tpu.cli.train \
  --model "$MODEL_NAME" \
  ${EXTRA[@]+"${EXTRA[@]}"} \
  --data-json "${DATA_JSON:-/path/to/anyword/data.json}" \
  --data-images "${DATA_IMAGES:-/path/to/anyword/images}" \
  --output-dir "$OUTPUT_DIR" \
  --mode attn \
  --mixed-precision bf16 \
  --train-batch-size 1 \
  --guidance-scale 1 \
  --grad-accum 8 \
  --optimizer adamw --use-8bit-adam \
  --learning-rate 2e-5 \
  --lr-scheduler constant --lr-warmup-steps 0 \
  --max-train-steps 10000 \
  --seed 42 \
  --max-sequence-length 512 \
  --checkpointing-steps 5000 \
  --report-to wandb \
  "$@"
