#!/bin/bash
# FID + LPIPS pass — TPU equivalent of the reference's eval/eval_fid_lpips.sh.
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-textflux_benchmark_all_mask_1024_single_line}"

python -m textflux_tpu.cli.eval_fid_lpips \
  --gen-dir results/ReCTS_output/cropped_images \
  --gt-dir "$DATA_ROOT/textflux_data/processed_ReCTS_test_images_other_words/original" \
  "$@"
