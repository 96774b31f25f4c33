"""Every public module imports cleanly (no hidden hard deps)."""

import importlib

import pytest

MODULES = [
    "textflux_tpu",
    "textflux_tpu.config",
    "textflux_tpu.models.transformer",
    "textflux_tpu.models.vae",
    "textflux_tpu.models.clip",
    "textflux_tpu.models.t5",
    "textflux_tpu.models.layers",
    "textflux_tpu.ops.packing",
    "textflux_tpu.ops.rope",
    "textflux_tpu.ops.attention",
    "textflux_tpu.ops.flash_attention",
    "textflux_tpu.ops.samplers",
    "textflux_tpu.pipeline.fill",
    "textflux_tpu.pipeline.prompts",
    "textflux_tpu.pipeline.image_processor",
    "textflux_tpu.pipeline.tokenizers",
    "textflux_tpu.rendering.glyph",
    "textflux_tpu.rendering.compose",
    "textflux_tpu.data.dataset",
    "textflux_tpu.data.loader",
    "textflux_tpu.data.native",
    "textflux_tpu.data.anytext",
    "textflux_tpu.parallel.partitioning",
    "textflux_tpu.training.train",
    "textflux_tpu.training.checkpoint",
    "textflux_tpu.io.params",
    "textflux_tpu.io.export",
    "textflux_tpu.io.lora",
    "textflux_tpu.io.config_io",
    "textflux_tpu.evaluation.metrics",
    "textflux_tpu.evaluation.crop",
    "textflux_tpu.evaluation.fid",
    "textflux_tpu.evaluation.lpips",
    "textflux_tpu.evaluation.ppocr",
    "textflux_tpu.utils.benchmarking",
    "textflux_tpu.utils.tracking",
    "textflux_tpu.cli.run_inference",
    "textflux_tpu.cli.run_eval",
    "textflux_tpu.cli.eval_ocr",
    "textflux_tpu.cli.eval_fid_lpips",
    "textflux_tpu.cli.train",
    "textflux_tpu.cli.demo",
]


@pytest.mark.parametrize("module", MODULES)
def test_import(module):
    importlib.import_module(module)
