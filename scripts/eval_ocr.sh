#!/bin/bash
# OCR metric pass — TPU equivalent of the reference's eval/eval_ocr.sh
# (eval/eval_dgocr.py). Same char-ID SeqAcc/NED math; the recognizer is
# pluggable (default: the bundled PP-OCRv3 CTC port — see MIGRATION.md for
# why absolute values differ from the published modelscope-ConvNeXt table).
set -euo pipefail

# The ppocr:recognize entry point locates its weights via PPOCR_CKPT /
# PPOCR_DICT / PPOCR_LANG (defaults: ./eval/ocr_weights/ppv3_rec.pth,
# ./eval/ocr_weights/ppocr_keys_v1.txt, ch) — provision them locally first.
DATA_ROOT="${DATA_ROOT:-textflux_benchmark_all_mask_1024_single_line}"

python -m textflux_tpu.cli.eval_ocr \
  --images-dir results/ReCTS_output/cropped_images \
  --json-path "$DATA_ROOT/ReCTS_ori.json" \
  --recognizer textflux_tpu.evaluation.ppocr:recognize \
  "$@"
