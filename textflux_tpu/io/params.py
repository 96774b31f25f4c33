"""Checkpoint ingestion: diffusers-format safetensors -> textflux-tpu pytrees.

Torch-free: reads safetensors directly into numpy and remaps names/layouts.
Linear weights transpose from torch's (out, in) to our (in, out); per-stream
q/k/v projections concatenate into the fused qkv matrices; the single-block
qkv+mlp fusion concatenates four projections.

Name map source (for parity auditing): the diffusers FluxTransformer2DModel
module tree, /root/reference/diffusers/.../transformer_flux.py:675-922.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from textflux_tpu.config import FluxConfig


Array = np.ndarray
StateDict = Mapping[str, Array]


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load every *.safetensors shard in a directory (or a single file) into one dict."""
    from safetensors import safe_open

    files = []
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
        )
    elif path.endswith(".safetensors"):
        files = [path]
    if not files:
        raise FileNotFoundError(f"no safetensors found under {path}")
    out: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as reader:
            for name in reader.keys():
                out[name] = reader.get_tensor(name)
    return out


def _lin_w(sd: StateDict, name: str) -> np.ndarray:
    # safetensors' numpy reader yields ml_dtypes.bfloat16 arrays for bf16 shards;
    # numpy ops (T/concat/stack) handle them natively.
    return np.asarray(sd[f"{name}.weight"]).T


def _lin(sd: StateDict, name: str) -> dict:
    p = {"w": _lin_w(sd, name)}
    if f"{name}.bias" in sd:
        p["b"] = np.asarray(sd[f"{name}.bias"])
    return p


def _mlp(sd: StateDict, fc1: str, fc2: str) -> dict:
    return {"fc1": _lin(sd, fc1), "fc2": _lin(sd, fc2)}


def _cat_lin(*linears: dict) -> dict:
    """Concatenate linear params along the output dim (for fused projections)."""
    return {
        "w": np.concatenate([l["w"] for l in linears], axis=-1),
        "b": np.concatenate([l["b"] for l in linears], axis=-1),
    }


def _stack_np(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_flux_state_dict(sd: StateDict, cfg: FluxConfig) -> dict:
    """Map a diffusers FluxTransformer2DModel state dict onto our param pytree."""

    def double(i: int) -> dict:
        pre = f"transformer_blocks.{i}"
        return {
            "img_mod": _lin(sd, f"{pre}.norm1.linear"),
            "txt_mod": _lin(sd, f"{pre}.norm1_context.linear"),
            "img_qkv": _cat_lin(
                _lin(sd, f"{pre}.attn.to_q"),
                _lin(sd, f"{pre}.attn.to_k"),
                _lin(sd, f"{pre}.attn.to_v"),
            ),
            "txt_qkv": _cat_lin(
                _lin(sd, f"{pre}.attn.add_q_proj"),
                _lin(sd, f"{pre}.attn.add_k_proj"),
                _lin(sd, f"{pre}.attn.add_v_proj"),
            ),
            "img_q_scale": np.asarray(sd[f"{pre}.attn.norm_q.weight"]),
            "img_k_scale": np.asarray(sd[f"{pre}.attn.norm_k.weight"]),
            "txt_q_scale": np.asarray(sd[f"{pre}.attn.norm_added_q.weight"]),
            "txt_k_scale": np.asarray(sd[f"{pre}.attn.norm_added_k.weight"]),
            "img_proj": _lin(sd, f"{pre}.attn.to_out.0"),
            "txt_proj": _lin(sd, f"{pre}.attn.to_add_out"),
            "img_mlp": _mlp(sd, f"{pre}.ff.net.0.proj", f"{pre}.ff.net.2"),
            "txt_mlp": _mlp(sd, f"{pre}.ff_context.net.0.proj", f"{pre}.ff_context.net.2"),
        }

    def single(i: int) -> dict:
        pre = f"single_transformer_blocks.{i}"
        return {
            "mod": _lin(sd, f"{pre}.norm.linear"),
            "linear1": _cat_lin(
                _lin(sd, f"{pre}.attn.to_q"),
                _lin(sd, f"{pre}.attn.to_k"),
                _lin(sd, f"{pre}.attn.to_v"),
                _lin(sd, f"{pre}.proj_mlp"),
            ),
            "q_scale": np.asarray(sd[f"{pre}.attn.norm_q.weight"]),
            "k_scale": np.asarray(sd[f"{pre}.attn.norm_k.weight"]),
            "linear2": _lin(sd, f"{pre}.proj_out"),
        }

    params = {
        "img_in": _lin(sd, "x_embedder"),
        "txt_in": _lin(sd, "context_embedder"),
        "time_in": _mlp(sd, "time_text_embed.timestep_embedder.linear_1",
                        "time_text_embed.timestep_embedder.linear_2"),
        "vector_in": _mlp(sd, "time_text_embed.text_embedder.linear_1",
                          "time_text_embed.text_embedder.linear_2"),
        "final_mod": _lin(sd, "norm_out.linear"),
        "final_proj": _lin(sd, "proj_out"),
        "double": _stack_np([double(i) for i in range(cfg.num_double_layers)]),
        "single": _stack_np([single(i) for i in range(cfg.num_single_layers)]),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = _mlp(sd, "time_text_embed.guidance_embedder.linear_1",
                                     "time_text_embed.guidance_embedder.linear_2")
    return params


def _conv(sd: StateDict, name: str) -> dict:
    # torch conv weight (O, I, H, W) -> HWIO
    return {
        "w": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
        "b": np.asarray(sd[f"{name}.bias"]),
    }


def _gn(sd: StateDict, name: str) -> dict:
    return {"scale": np.asarray(sd[f"{name}.weight"]), "bias": np.asarray(sd[f"{name}.bias"])}


def convert_vae_state_dict(sd: StateDict, cfg) -> dict:
    """Map a diffusers AutoencoderKL state dict onto our NHWC VAE pytree."""

    def resnet(pre: str) -> dict:
        p = {
            "norm1": _gn(sd, f"{pre}.norm1"),
            "conv1": _conv(sd, f"{pre}.conv1"),
            "norm2": _gn(sd, f"{pre}.norm2"),
            "conv2": _conv(sd, f"{pre}.conv2"),
        }
        if f"{pre}.conv_shortcut.weight" in sd:
            p["skip"] = _conv(sd, f"{pre}.conv_shortcut")
        return p

    def mid(pre: str) -> dict:
        return {
            "res1": resnet(f"{pre}.resnets.0"),
            "res2": resnet(f"{pre}.resnets.1"),
            "attn": {
                "norm": _gn(sd, f"{pre}.attentions.0.group_norm"),
                "q": _lin(sd, f"{pre}.attentions.0.to_q"),
                "k": _lin(sd, f"{pre}.attentions.0.to_k"),
                "v": _lin(sd, f"{pre}.attentions.0.to_v"),
                "out": _lin(sd, f"{pre}.attentions.0.to_out.0"),
            },
        }

    n_blocks = len(cfg.block_out_channels)
    enc_down = []
    for i in range(n_blocks):
        block = {"resnets": [resnet(f"encoder.down_blocks.{i}.resnets.{j}")
                             for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["down"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc_down.append(block)

    dec_up = []
    for i in range(n_blocks):
        block = {"resnets": [resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                             for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["up"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec_up.append(block)

    return {
        "encoder": {
            "conv_in": _conv(sd, "encoder.conv_in"),
            "down": enc_down,
            "mid": mid("encoder.mid_block"),
            "norm_out": _gn(sd, "encoder.conv_norm_out"),
            "conv_out": _conv(sd, "encoder.conv_out"),
        },
        "decoder": {
            "conv_in": _conv(sd, "decoder.conv_in"),
            "mid": mid("decoder.mid_block"),
            "up": dec_up,
            "norm_out": _gn(sd, "decoder.conv_norm_out"),
            "conv_out": _conv(sd, "decoder.conv_out"),
        },
    }


def convert_clip_state_dict(sd: StateDict, cfg) -> dict:
    """Map a transformers CLIPTextModel state dict onto our pytree."""
    pre = "text_model"
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}.encoder.layers.{i}"
        layers.append({
            "ln1": _gn(sd, f"{lp}.layer_norm1"),
            "q": _lin(sd, f"{lp}.self_attn.q_proj"),
            "k": _lin(sd, f"{lp}.self_attn.k_proj"),
            "v": _lin(sd, f"{lp}.self_attn.v_proj"),
            "o": _lin(sd, f"{lp}.self_attn.out_proj"),
            "ln2": _gn(sd, f"{lp}.layer_norm2"),
            "fc1": _lin(sd, f"{lp}.mlp.fc1"),
            "fc2": _lin(sd, f"{lp}.mlp.fc2"),
        })
    return {
        "token_embedding": np.asarray(sd[f"{pre}.embeddings.token_embedding.weight"]),
        "position_embedding": np.asarray(sd[f"{pre}.embeddings.position_embedding.weight"]),
        "layers": _stack_np(layers),
        "final_ln": _gn(sd, f"{pre}.final_layer_norm"),
    }


def convert_t5_state_dict(sd: StateDict, cfg) -> dict:
    """Map a transformers T5EncoderModel state dict onto our pytree."""
    emb_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoder.block.{i}"
        layers.append({
            "attn_norm": np.asarray(sd[f"{lp}.layer.0.layer_norm.weight"]),
            "q": _lin(sd, f"{lp}.layer.0.SelfAttention.q"),
            "k": _lin(sd, f"{lp}.layer.0.SelfAttention.k"),
            "v": _lin(sd, f"{lp}.layer.0.SelfAttention.v"),
            "o": _lin(sd, f"{lp}.layer.0.SelfAttention.o"),
            "mlp_norm": np.asarray(sd[f"{lp}.layer.1.layer_norm.weight"]),
            "wi_0": _lin(sd, f"{lp}.layer.1.DenseReluDense.wi_0"),
            "wi_1": _lin(sd, f"{lp}.layer.1.DenseReluDense.wi_1"),
            "wo": _lin(sd, f"{lp}.layer.1.DenseReluDense.wo"),
        })
    return {
        "embedding": np.asarray(sd[emb_key]),
        "rel_bias": np.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "layers": _stack_np(layers),
        "final_norm": np.asarray(sd["encoder.final_layer_norm.weight"]),
    }


def to_device_params(params, dtype=jnp.bfloat16, put: Callable = jnp.asarray):
    """Cast a numpy param tree to device arrays. Norm scales stay float32."""
    import jax

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.endswith("scale"):
            return put(np.asarray(x, np.float32))
        return put(np.asarray(x)).astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def load_flux_transformer(path: str, cfg: FluxConfig, dtype=jnp.bfloat16,
                          mesh=None, specs=None, host=False):
    """Load a diffusers-format transformer checkpoint directory.

    Expects ``path`` to contain safetensors shards (and optionally config.json,
    which is validated against ``cfg`` when present). With ``mesh`` given,
    every weight device_puts straight from host memory onto its GSPMD shards
    (specs default to parallel.flux_param_specs) — the 12B model never
    materializes whole on one device. With ``host=True`` the converted tree is
    returned with numpy leaves, untouched by any device: the caller streams
    leaves through the device itself (the single-chip QLoRA path quantizes
    leaf-by-leaf so the full-precision 12B base never sits in HBM whole).
    """
    config_file = os.path.join(path, "config.json")
    if os.path.exists(config_file):
        with open(config_file) as f:
            ref = json.load(f)
        checks = {
            "in_channels": cfg.in_channels,
            "num_layers": cfg.num_double_layers,
            "num_single_layers": cfg.num_single_layers,
            "num_attention_heads": cfg.num_heads,
            "attention_head_dim": cfg.head_dim,
            # the one mismatch that would otherwise fail SILENTLY: the
            # converter would drop guidance_embedder.* and flux_vec would
            # skip guidance conditioning — wrong images, no error
            "guidance_embeds": cfg.guidance_embeds,
        }
        for k, ours in checks.items():
            if k in ref and ref[k] != ours:
                raise ValueError(f"checkpoint {k}={ref[k]} != config {ours}")
    sd = load_safetensors_dir(path)
    host_tree = convert_flux_state_dict(sd, cfg)
    if host:
        return host_tree
    if mesh is None:
        return to_device_params(host_tree, dtype=dtype)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from textflux_tpu.parallel.partitioning import flux_param_specs

    specs = specs if specs is not None else flux_param_specs(cfg)

    def put(spec, path_leaf, x):
        name = path_leaf[-1].key if hasattr(path_leaf[-1], "key") else str(path_leaf[-1])
        arr = np.asarray(x)
        target = np.float32 if name.endswith("scale") else dtype
        # copy=False: the checkpoint is usually already bf16 — an
        # unconditional astype copy would double transient host memory on
        # the 24 GB host tree
        return jax.device_put(arr.astype(target, copy=False),
                              NamedSharding(mesh, spec))

    flat_specs = {jax.tree_util.keystr(p): s for p, s in
                  jax.tree_util.tree_flatten_with_path(
                      specs, is_leaf=lambda x: isinstance(x, PartitionSpec))[0]}
    flat = jax.tree_util.tree_flatten_with_path(host_tree)[0]
    out_flat = [put(flat_specs[jax.tree_util.keystr(p)], p, x) for p, x in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(host_tree), out_flat)
