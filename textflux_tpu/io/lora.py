"""LoRA ingestion: load-time folding into base weights.

TPU-first design decision: instead of the reference's runtime peft adapter
injection (/root/reference/run_inference_lora.py:48-66), LoRA deltas fold into
the base matrices once at load — W' = W + scale * (alpha/r) * B @ A — so the
serving graph is identical to the full-parameter model (zero runtime overhead,
no extra HBM). Unfolding for continued training uses the training module's
explicit LoRA parameterization instead.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from textflux_tpu.config import FluxConfig
from textflux_tpu.io.params import (
    convert_flux_state_dict,
    load_safetensors_dir,
    to_device_params,
)


def fold_lora_into_state_dict(
    sd: Dict[str, np.ndarray],
    lora_sd: Dict[str, np.ndarray],
    scale: float = 1.0,
    prefix: str = "transformer.",
) -> Dict[str, np.ndarray]:
    """Fold diffusers-format LoRA weights into a base state dict (torch naming).

    Keys look like ``transformer.<module>.lora_A.weight`` / ``lora_B.weight``;
    optional ``<module>.alpha`` scalars override alpha (default: alpha = rank,
    i.e. scaling 1 — the reference trains rank 128 / alpha 128).
    """
    out = dict(sd)
    modules = set()
    for k in lora_sd:
        if k.endswith("lora_A.weight"):
            modules.add(k[: -len(".lora_A.weight")])
    for mod in sorted(modules):
        a = np.asarray(lora_sd[f"{mod}.lora_A.weight"], np.float32)   # (r, in)
        b = np.asarray(lora_sd[f"{mod}.lora_B.weight"], np.float32)   # (out, r)
        r = a.shape[0]
        alpha = float(np.asarray(lora_sd.get(f"{mod}.alpha", r)))
        base_key = mod[len(prefix):] if mod.startswith(prefix) else mod
        base_key = f"{base_key}.weight"
        if base_key not in out:
            raise KeyError(f"LoRA targets missing base weight: {base_key}")
        w = np.asarray(out[base_key], np.float32)
        out[base_key] = (w + scale * (alpha / r) * (b @ a)).astype(np.float32)
    return out


def load_folded_flux_transformer(
    base_path: str,
    lora_path: str,
    cfg: FluxConfig,
    *,
    scale: float = 1.0,
    dtype=None,
):
    """Load a base transformer checkpoint and fold a LoRA file/directory in."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    sd = load_safetensors_dir(base_path)
    if os.path.isdir(lora_path):
        candidate = os.path.join(lora_path, "pytorch_lora_weights.safetensors")
        lora_path = candidate if os.path.exists(candidate) else lora_path
    lora_sd = load_safetensors_dir(lora_path)
    folded = fold_lora_into_state_dict(sd, lora_sd, scale=scale)
    return to_device_params(convert_flux_state_dict(folded, cfg), dtype=dtype)
