"""textflux-tpu: a TPU-native (JAX/XLA/Pallas) scene-text synthesis & editing framework.

Re-implements the capabilities of the TextFlux reference (FLUX.1-Fill-style MM-DiT
inpainting with glyph spatial-concatenation conditioning) as an idiomatic TPU stack:

- ``textflux_tpu.models``      — MM-DiT transformer, Flux VAE, CLIP-L / T5 text encoders
  (functional param-pytree modules, scan-stacked blocks, bf16 weights / fp32 norms).
- ``textflux_tpu.ops``         — latent packing, 3-axis RoPE, Pallas flash attention,
  flow-matching Euler + AMO stochastic-overshoot samplers.
- ``textflux_tpu.pipeline``    — the end-to-end jitted fill (inpainting) pipeline.
- ``textflux_tpu.rendering``   — host-side glyph rendering / mask extraction /
  spatial-concat conditioning.
- ``textflux_tpu.parallel``    — device meshes, GSPMD partition rules, sharded
  inference/training helpers.
- ``textflux_tpu.training``    — flow-matching training step (full-param + LoRA),
  sharded optimizer states, checkpointing.
- ``textflux_tpu.evaluation``  — SeqAcc/NED metric harness and batch-eval driver.
- ``textflux_tpu.io``          — safetensors checkpoint ingestion + LoRA folding.
"""

__version__ = "0.1.0"

from textflux_tpu.config import (  # noqa: F401
    FluxConfig,
    VAEConfig,
    CLIPTextConfig,
    T5Config,
    PipelineConfig,
)
