"""Device mesh + GSPMD partition specs.

Mesh axes (reference's DeepSpeed-ZeRO-2 + process-farm parallelism maps here,
SURVEY.md §2.4):

  data   — batch parallelism (reference: ZeRO data-parallel ranks / eval farm)
  fsdp   — parameter+optimizer sharding (reference: ZeRO-2 optimizer sharding;
           here full ZeRO-3-style weight gathering per scan step)
  tensor — megatron-style tensor parallelism over attention heads / MLP columns
           (the reference has none; required on TPU to fit the 12B DiT on small
           slices, SURVEY.md §7 hard part (d))

Specs mirror the param pytrees structurally. Stacked block params carry a
leading layer axis that is never sharded.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from textflux_tpu.config import FluxConfig

MESH_AXES = ("data", "fsdp", "tensor")


def make_mesh(shape: Optional[Tuple[int, int, int]] = None, devices=None) -> Mesh:
    """Create a ("data", "fsdp", "tensor") mesh. Default: all devices on fsdp."""
    explicit_devices = devices is not None
    devices = devices if explicit_devices else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n, 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    if need < n and not explicit_devices:
        import warnings

        warnings.warn(
            f"mesh shape {shape} uses {need} of {n} available devices; pass "
            "devices= explicitly to subset intentionally", stacklevel=2)
    arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, MESH_AXES)


def _col(stacked: bool) -> dict:
    """Column-parallel linear: weight (…, in, out) -> out over tensor."""
    lead = (None,) if stacked else ()
    return {"w": P(*lead, "fsdp", "tensor"), "b": P(*lead, "tensor")}


def _row(stacked: bool) -> dict:
    """Row-parallel linear: weight (…, in, out) -> in over tensor."""
    lead = (None,) if stacked else ()
    return {"w": P(*lead, "tensor", "fsdp"), "b": P(*lead)}


def _rep(stacked: bool = False) -> dict:
    lead = (None,) if stacked else ()
    return {"w": P(*lead), "b": P(*lead)}


def flux_param_specs(cfg: FluxConfig):
    """PartitionSpec tree matching init_flux_params structure."""
    double = {
        "img_mod": _col(True),
        "txt_mod": _col(True),
        "img_qkv": _col(True),
        "txt_qkv": _col(True),
        "img_q_scale": P(None),
        "img_k_scale": P(None),
        "txt_q_scale": P(None),
        "txt_k_scale": P(None),
        "img_proj": _row(True),
        "txt_proj": _row(True),
        "img_mlp": {"fc1": _col(True), "fc2": _row(True)},
        "txt_mlp": {"fc1": _col(True), "fc2": _row(True)},
    }
    single = {
        "mod": _col(True),
        "linear1": _col(True),
        "q_scale": P(None),
        "k_scale": P(None),
        "linear2": _row(True),
    }
    specs = {
        "img_in": {"w": P(None, "tensor"), "b": P("tensor")},
        "txt_in": {"w": P(None, "tensor"), "b": P("tensor")},
        "time_in": {"fc1": _rep(), "fc2": _rep()},
        "vector_in": {"fc1": _rep(), "fc2": _rep()},
        "final_mod": _rep(),
        "final_proj": _rep(),
        "double": double,
        "single": single,
    }
    if cfg.guidance_embeds:
        specs["guidance_in"] = {"fc1": _rep(), "fc2": _rep()}
    return specs


def adapt_specs_to_params(specs, params):
    """Adapt a {"w", "b"} dense-spec tree to the actual param leaf layout.

    Quantized denses (io/quantize.py) replace "w" with "w_q"/"w_q8a8" plus a
    per-output-channel "scale": the int8 weight takes w's spec; scale keeps
    the out-dim sharding (w's last axis) so each shard dequantizes locally.
    """
    def rec(s, p):
        if isinstance(s, dict) and isinstance(p, dict) and "w" in s and "w" not in p:
            wspec = s["w"]
            n = len(tuple(wspec))
            # scale (..., out) keeps w's out-dim axis; replicated/short specs
            # (trailing dims implicitly replicated) get a replicated scale
            sspec = P(*wspec[:-2], wspec[-1]) if n >= 2 else P()
            out = {}
            for k in p:
                if k in ("w_q", "w_q8a8", "w_nf4"):
                    # w_nf4 packs two in-rows per byte and absmax4 is one row
                    # per 64 — both keep w's axis layout, so the same specs
                    # shard them (axis sizes stay divisible: tp shards the
                    # out dim; an in-dim shard would need in/2 divisible,
                    # which holds for all 128-multiple layers)
                    out[k] = wspec
                elif k in ("scale", "amax_lo", "amax_hi"):
                    out[k] = sspec
                elif k in ("absmax4", "absmax8"):
                    # (..., in/64, out): same rank/axis layout as w
                    out[k] = wspec
                elif k in ("lora_a", "lora_b", "lora_ga", "lora_gb"):
                    # rank-r parallel branches (QLoRA serving layout): tiny —
                    # replicate rather than shard a rank axis that rarely
                    # divides tp
                    out[k] = P()
                else:  # bias
                    out[k] = s.get("b", P())
            return out
        if isinstance(s, dict) and isinstance(p, dict):
            out = {k: rec(s[k], p[k]) if k in p else s[k] for k in s}
            for k in p:
                if k not in s:
                    # params-only entries the spec tree cannot know about:
                    # lora_a/lora_b on unquantized leaves, the _tp_layout
                    # marker — all tiny, replicate
                    out[k] = (jax.tree.map(lambda _: P(), p[k])
                              if isinstance(p[k], dict) else P())
            return out
        return s

    return rec(specs, params)


def lora_param_specs(lora):
    """PartitionSpec tree for a training-time LoRA factor tree (lora_init).

    Decision (documented here deliberately): LoRA factors REPLICATE over the
    whole mesh while the frozen base stays sharded per ``flux_param_specs``.
    Rationale: the rank-r factors are ~1.7 GiB fp32 at rank 128 — small enough
    to replicate — and their rank axis (r=128) rarely divides the tensor axis
    cleanly against the grouped per-module layout; replicated factors make the
    lora branch ``y += (x@A)@B`` local on every shard (A's in-dim matmul
    all-reduces with the base matmul's existing row-parallel reduction), and
    the optimizer update is purely local. Matches the serving-side choice in
    ``adapt_specs_to_params`` (lora_a/lora_b/lora_ga/lora_gb -> P()).
    """
    return spec_like(lora, P())


def batch_spec() -> P:
    """Batch dims shard over (data, fsdp) jointly (fsdp doubles as extra DP)."""
    return P(("data", "fsdp"))


def shard_tree(tree, specs, mesh: Mesh):
    """device_put a pytree with a matching PartitionSpec tree.

    Maps over the *specs* tree (PartitionSpec is a tuple subclass, so it must
    be declared a leaf explicitly).
    """
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs, tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def sharding_tree(specs, mesh: Mesh):
    """Convert a PartitionSpec tree into a NamedSharding tree (for jit in/out_shardings)."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def spec_like(tree, spec: P):
    """A PartitionSpec tree assigning one spec to every leaf."""
    return jax.tree.map(lambda _: spec, tree)
