#!/bin/bash
# Batch evaluation launcher — TPU equivalent of the reference's
# scripts/batch_eval.sh (and batch_eval_lora.sh: pass --lora DIR). The GPU
# process farm (--num_gpus) becomes one jitted program over a device mesh
# (--mesh) with aspect-bucketed batching; --skip-existing resumes an
# interrupted run.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-textflux_benchmark_all_mask_1024_single_line}"

# FONT_PATH: optional — when unset the CLI's own default/fallback font policy
# applies (the reference's Arial-Unicode-Regular.ttf is a missing blob and is
# not shipped here; provision it and export FONT_PATH to match exactly).
FONT_ARGS=()
if [[ -n "${FONT_PATH:-}" ]]; then
  FONT_ARGS=(--font "$FONT_PATH")
fi

python -m textflux_tpu.cli.run_eval \
  --model "${MODEL_NAME:-/path/to/FLUX.1-Fill-dev}" \
  --transformer "${WEIGHTS_PATH:-outputs/textflux-beta/checkpoint-10000/transformer}" \
  --json-path "$DATA_ROOT/ReCTS_ori.json" \
  --original-images-dir "$DATA_ROOT/textflux_data/processed_ReCTS_test_images/original" \
  --output-dir ./results/ReCTS_output \
  ${FONT_ARGS[@]+"${FONT_ARGS[@]}"} \
  --text-height-ratio 0.15625 \
  --scheduler overshoot \
  --batch-size 4 --skip-existing \
  "$@"
