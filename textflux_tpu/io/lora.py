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
    if lora_sd and not modules:
        # e.g. a kohya-format file ('lora_unet_..._lora_down.weight') or a
        # peft adapter-name infix — silently serving the base model as if
        # the fine-tune loaded is the worst failure mode
        sample = sorted(lora_sd)[:3]
        raise ValueError(
            "no '<module>.lora_A.weight' keys found in the LoRA file — "
            f"unrecognized naming scheme (sample keys: {sample}); expected "
            "the diffusers/peft pytorch_lora_weights.safetensors format")
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


# training warm-start: torch LoRA sd -> factor tree ---------------------------

# target -> reference sub-modules, in fused column order (matches
# io/export.export_lora_state_dict's name maps)
_IMPORT_MAP_DOUBLE = {
    "img_qkv": ("attn.to_q", "attn.to_k", "attn.to_v"),
    "txt_qkv": ("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"),
    "img_proj": ("attn.to_out.0",),
    "txt_proj": ("attn.to_add_out",),
    "img_mlp.fc1": ("ff.net.0.proj",),
    "img_mlp.fc2": ("ff.net.2",),
    "txt_mlp.fc1": ("ff_context.net.0.proj",),
    "txt_mlp.fc2": ("ff_context.net.2",),
}
_IMPORT_MAP_SINGLE = {
    "linear1": ("attn.to_q", "attn.to_k", "attn.to_v"),
}
# fused targets whose sub-modules import as GROUPED independent per-module
# factors (training.train.LORA_GROUPED); single-module targets import flat
_GROUPED_IMPORTS = ("img_qkv", "txt_qkv", "linear1")
# module names the reference's peft target list never adapts; a file carrying
# them was trained with a custom --lora_layers subset we cannot represent
_UNSUPPORTED_SINGLE_MODS = (".proj_mlp.lora_A", ".proj_out.lora_A")


def import_lora_factors(
    lora_sd: Dict[str, np.ndarray],
    cfg: FluxConfig,
    lora_scale: float,
) -> Dict[str, Dict[str, np.ndarray]]:
    """diffusers/peft LoRA state dict -> training factor tree (warm start,
    reference train_lora.py:536-553).

    Sub-modules of a fused projection (qkv, single linear1's q/k/v) carry
    INDEPENDENT (A, B) pairs in the sd and import as grouped per-module
    factors a: (L, M, in, r) / b: (L, M, r, d) — the same parameterization
    fresh training uses, so continued training stays in the reference's
    model family (an earlier rank-concat/block-diagonal fused import was
    init-exact but let gradients fill the cross-module blocks). Each
    module's own alpha_m/r_m, divided by the train step's global
    ``lora_scale`` (alpha/rank), is folded into A so the inserted delta
    reproduces the sd's exactly. Targets absent from the sd are omitted
    (caller keeps its fresh init); absent LAYERS of a present target get a
    fresh per-layer init (B=0)."""
    for k in lora_sd:
        if any(m in k for m in _UNSUPPORTED_SINGLE_MODS):
            raise ValueError(
                f"LoRA file adapts {k.split('.lora_')[0]} — outside the "
                "reference's peft target list (single blocks adapt only "
                "attn.to_q/k/v); custom --lora_layers subsets are not "
                "importable (see ARCHITECTURE.md deviations)")

    def lookup(prefix, i, mod):
        key = f"{prefix}.{i}.{mod}"
        for p in (f"transformer.{key}", key):
            if f"{p}.lora_A.weight" in lora_sd:
                a = np.asarray(lora_sd[f"{p}.lora_A.weight"], np.float32)
                b = np.asarray(lora_sd[f"{p}.lora_B.weight"], np.float32)
                r = a.shape[0]
                alpha = float(np.asarray(lora_sd.get(f"{p}.alpha", r)))
                return a.T * ((alpha / r) / lora_scale), b.T  # (in, r), (r, out)
        return None

    # one rng for the whole import: a fresh default_rng(0) per target would
    # hand every same-shaped target byte-identical "random" fresh-layer A's
    rng = np.random.default_rng(0)

    def build(prefix: str, n_layers: int, name_map):
        out = {}
        for target, mods in name_map.items():
            grouped = target in _GROUPED_IMPORTS
            per_layer = []
            for i in range(n_layers):
                pairs = [lookup(prefix, i, mod) for mod in mods]
                if all(p is None for p in pairs):
                    per_layer.append(None)  # layer not in sd: fresh below
                    continue
                if any(p is None for p in pairs):
                    raise ValueError(
                        f"LoRA sd covers only some sub-modules of fused "
                        f"target {target} (layer {i}): {mods}")
                if grouped:
                    ranks = {a.shape[1] for a, _ in pairs}
                    if len(ranks) != 1:
                        raise ValueError(
                            f"per-module ranks differ inside {target} "
                            f"(layer {i}): {ranks}")
                    per_layer.append((np.stack([a for a, _ in pairs]),
                                      np.stack([b for _, b in pairs])))
                else:
                    per_layer.append(pairs[0])
            present = [x for x in per_layer if x is not None]
            if not present:
                continue                                   # target not in sd
            ranks = {a.shape[-1] for a, _ in present}
            if len(ranks) != 1:
                raise ValueError(f"rank differs across layers for {target}: {ranks}")
            # layers absent from the sd (block-subset LoRAs): fresh init —
            # B=0 (no-op delta) with a random A like lora_init (A=B=0 would
            # zero both gradients and freeze the layer) — instead of
            # discarding the whole target
            a0, b0 = present[0]

            def fresh():
                return (rng.standard_normal(a0.shape).astype(np.float32)
                        / a0.shape[-1], np.zeros_like(b0))

            per_layer = [x if x is not None else fresh() for x in per_layer]
            out[target] = {"a": np.stack([a for a, _ in per_layer]),
                           "b": np.stack([b for _, b in per_layer])}
        return out

    return {
        "double": build("transformer_blocks", cfg.num_double_layers,
                        _IMPORT_MAP_DOUBLE),
        "single": build("single_transformer_blocks", cfg.num_single_layers,
                        _IMPORT_MAP_SINGLE),
    }
