"""Checkpoint export: textflux-tpu pytrees -> diffusers-format safetensors.

Inverse of textflux_tpu.io.params.convert_flux_state_dict, so weights trained
here load directly into the reference stack (and vice versa). LoRA factors
export in the peft/diffusers `pytorch_lora_weights.safetensors` naming
(lora_A/lora_B per target module) the reference consumes
(run_inference_lora.py:48-66).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _put_lin(sd: Dict[str, np.ndarray], name: str, p) -> None:
    sd[f"{name}.weight"] = _np(p["w"]).T
    if "b" in p:
        sd[f"{name}.bias"] = _np(p["b"])


def _put_mlp(sd, fc1: str, fc2: str, p) -> None:
    _put_lin(sd, fc1, p["fc1"])
    _put_lin(sd, fc2, p["fc2"])


def _split_lin(p, i: int, sizes):
    """Slice fused linear params back into per-projection (w, b) dicts."""
    starts = np.cumsum([0] + list(sizes))
    w = _np(p["w"])[i]
    b = _np(p["b"])[i]
    return [
        {"w": w[:, s:e], "b": b[s:e]} for s, e in zip(starts[:-1], starts[1:])
    ]


def export_flux_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """Our param pytree -> diffusers FluxTransformer2DModel state dict (numpy)."""
    import jax

    # ONE device->host transfer per stacked leaf up front: the per-layer
    # _np(...)[i] slices below would otherwise re-copy the full stacked
    # tensor from device for every layer x projection (~150 copies of the
    # ~10 GB linear1 stack on a 12B export)
    params = jax.tree.map(np.asarray, params)
    d = cfg.hidden_dim
    sd: Dict[str, np.ndarray] = {}
    _put_lin(sd, "x_embedder", params["img_in"])
    _put_lin(sd, "context_embedder", params["txt_in"])
    _put_mlp(sd, "time_text_embed.timestep_embedder.linear_1",
             "time_text_embed.timestep_embedder.linear_2", params["time_in"])
    _put_mlp(sd, "time_text_embed.text_embedder.linear_1",
             "time_text_embed.text_embedder.linear_2", params["vector_in"])
    if cfg.guidance_embeds:
        _put_mlp(sd, "time_text_embed.guidance_embedder.linear_1",
                 "time_text_embed.guidance_embedder.linear_2", params["guidance_in"])
    _put_lin(sd, "norm_out.linear", params["final_mod"])
    _put_lin(sd, "proj_out", params["final_proj"])

    dbl = params["double"]
    for i in range(cfg.num_double_layers):
        pre = f"transformer_blocks.{i}"
        sub = lambda name: {k: _np(v)[i] for k, v in dbl[name].items()}  # noqa: E731
        _put_lin(sd, f"{pre}.norm1.linear", sub("img_mod"))
        _put_lin(sd, f"{pre}.norm1_context.linear", sub("txt_mod"))
        for proj, src in (("to_q", 0), ("to_k", 1), ("to_v", 2)):
            _put_lin(sd, f"{pre}.attn.{proj}", _split_lin(dbl["img_qkv"], i, [d, d, d])[src])
        for proj, src in (("add_q_proj", 0), ("add_k_proj", 1), ("add_v_proj", 2)):
            _put_lin(sd, f"{pre}.attn.{proj}", _split_lin(dbl["txt_qkv"], i, [d, d, d])[src])
        sd[f"{pre}.attn.norm_q.weight"] = _np(dbl["img_q_scale"])[i]
        sd[f"{pre}.attn.norm_k.weight"] = _np(dbl["img_k_scale"])[i]
        sd[f"{pre}.attn.norm_added_q.weight"] = _np(dbl["txt_q_scale"])[i]
        sd[f"{pre}.attn.norm_added_k.weight"] = _np(dbl["txt_k_scale"])[i]
        _put_lin(sd, f"{pre}.attn.to_out.0", sub("img_proj"))
        _put_lin(sd, f"{pre}.attn.to_add_out", sub("txt_proj"))
        _put_lin(sd, f"{pre}.ff.net.0.proj", {k: _np(v)[i] for k, v in dbl["img_mlp"]["fc1"].items()})
        _put_lin(sd, f"{pre}.ff.net.2", {k: _np(v)[i] for k, v in dbl["img_mlp"]["fc2"].items()})
        _put_lin(sd, f"{pre}.ff_context.net.0.proj", {k: _np(v)[i] for k, v in dbl["txt_mlp"]["fc1"].items()})
        _put_lin(sd, f"{pre}.ff_context.net.2", {k: _np(v)[i] for k, v in dbl["txt_mlp"]["fc2"].items()})

    sng = params["single"]
    m = cfg.mlp_dim
    for i in range(cfg.num_single_layers):
        pre = f"single_transformer_blocks.{i}"
        _put_lin(sd, f"{pre}.norm.linear", {k: _np(v)[i] for k, v in sng["mod"].items()})
        q, k, v, mlp = _split_lin(sng["linear1"], i, [d, d, d, m])
        _put_lin(sd, f"{pre}.attn.to_q", q)
        _put_lin(sd, f"{pre}.attn.to_k", k)
        _put_lin(sd, f"{pre}.attn.to_v", v)
        _put_lin(sd, f"{pre}.proj_mlp", mlp)
        sd[f"{pre}.attn.norm_q.weight"] = _np(sng["q_scale"])[i]
        sd[f"{pre}.attn.norm_k.weight"] = _np(sng["k_scale"])[i]
        _put_lin(sd, f"{pre}.proj_out", {k2: _np(v2)[i] for k2, v2 in sng["linear2"].items()})
    return sd


def export_lora_state_dict(lora, cfg, alpha: float,
                           rank: Optional[int] = None) -> Dict[str, np.ndarray]:
    """LoRA factor tree -> diffusers/peft naming.

    Fused targets export per-projection by slicing the B factor columns
    (delta = A @ B, so column slices of B give per-projection deltas with a
    shared A).

    ``rank``: the TrainConfig rank the uniform train-time scale alpha/rank
    was computed with. Warm-started fused targets can carry a DIFFERENT
    per-target rank r_t (import_lora_factors rebuilds them at sum of the
    sub-module ranks); consumers recover the scale as alpha_t/r_t from the
    tensor shapes, so each target's alpha must be (alpha/rank)*r_t — a
    single global alpha silently shrank warm-started qkv deltas 3x. With
    rank=None every target's own rank is used (alpha_t = alpha only when
    uniform, the pre-warm-start behavior)."""
    import jax

    lora = jax.tree.map(np.asarray, lora)   # one device->host copy per leaf
    d, m = cfg.hidden_dim, cfg.mlp_dim
    sd: Dict[str, np.ndarray] = {}

    name_map_double = {
        "img_qkv": [("attn.to_q", d), ("attn.to_k", d), ("attn.to_v", d)],
        "txt_qkv": [("attn.add_q_proj", d), ("attn.add_k_proj", d), ("attn.add_v_proj", d)],
        "img_proj": [("attn.to_out.0", d)],
        "txt_proj": [("attn.to_add_out", d)],
        "img_mlp.fc1": [("ff.net.0.proj", m)],
        "img_mlp.fc2": [("ff.net.2", d)],
        "txt_mlp.fc1": [("ff_context.net.0.proj", m)],
        "txt_mlp.fc2": [("ff_context.net.2", d)],
    }
    name_map_single = {
        "linear1": [("attn.to_q", d), ("attn.to_k", d), ("attn.to_v", d), ("proj_mlp", m)],
        "linear2": [("proj_out", d)],
    }

    def emit(prefix: str, factors, n_layers: int, name_map):
        for key, targets in name_map.items():
            if key not in factors:
                continue
            a = _np(factors[key]["a"])  # (L, in, r) or grouped (L, M, in, r)
            b = _np(factors[key]["b"])  # (L, r, out) or grouped (L, M, r, d)
            r_t = a.shape[-1]
            alpha_t = alpha if rank is None else alpha * (r_t / rank)
            grouped = a.ndim == 4
            for i in range(n_layers):
                if grouped:
                    # independent per-module adapters (reference peft family)
                    for m, (target, _) in enumerate(targets[: a.shape[1]]):
                        mod = f"{prefix}.{i}.{target}"
                        sd[f"transformer.{mod}.lora_A.weight"] = a[i, m].T
                        sd[f"transformer.{mod}.lora_B.weight"] = b[i, m].T
                        sd[f"transformer.{mod}.alpha"] = np.float32(alpha_t)
                    continue
                start = 0
                for target, size in targets:
                    mod = f"{prefix}.{i}.{target}"
                    sd[f"transformer.{mod}.lora_A.weight"] = a[i].T            # (r, in)
                    sd[f"transformer.{mod}.lora_B.weight"] = b[i, :, start:start + size].T  # (out_slice, r)
                    sd[f"transformer.{mod}.alpha"] = np.float32(alpha_t)
                    start += size

    emit("transformer_blocks", lora.get("double", {}), cfg.num_double_layers, name_map_double)
    emit("single_transformer_blocks", lora.get("single", {}), cfg.num_single_layers, name_map_single)
    return sd


def save_safetensors(sd: Dict[str, np.ndarray], path: str, dtype=None) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    out = {}
    for k, v in sd.items():
        arr = np.ascontiguousarray(v)
        if dtype is not None and arr.ndim >= 1:
            arr = arr.astype(dtype)
        out[k] = arr
    save_file(out, path)


def save_transformer_checkpoint(params, cfg, out_dir: str) -> None:
    """Save a diffusers-layout transformer/ directory (config.json + weights)."""
    os.makedirs(out_dir, exist_ok=True)
    sd = export_flux_state_dict(params, cfg)
    save_safetensors(sd, os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))
    config = {
        "_class_name": "FluxTransformer2DModel",
        "patch_size": 1,
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "num_layers": cfg.num_double_layers,
        "num_single_layers": cfg.num_single_layers,
        "attention_head_dim": cfg.head_dim,
        "num_attention_heads": cfg.num_heads,
        "joint_attention_dim": cfg.joint_dim,
        "pooled_projection_dim": cfg.pooled_dim,
        "guidance_embeds": cfg.guidance_embeds,
        "axes_dims_rope": list(cfg.axes_dims_rope),
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
