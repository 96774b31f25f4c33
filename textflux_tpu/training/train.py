"""Flow-matching training for the fill DiT: full-param (attention-only
unfreeze) and LoRA.

TPU-first re-design of the reference trainers (scripts/train.py:904-1056,
scripts/train_lora.py):

- One jitted ``train_step`` runs gradient accumulation as a ``lax.scan`` over
  microbatches (reference: accelerate.accumulate over 8 python steps), so a
  full optimizer step is a single XLA program.
- Selective unfreeze is a *gradient/update mask tree* (reference: per-tensor
  requires_grad): attention columns inside the fused single-block matrices are
  masked at sub-tensor granularity.
- ZeRO-equivalence comes from sharding params/grads/optimizer state over the
  fsdp mesh axis (reference: DeepSpeed ZeRO-2 over NCCL).
- LoRA trains explicit (A, B) factor trees on frozen bases; serving folds them
  (textflux_tpu.io.lora).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from textflux_tpu.config import FluxConfig, VAEConfig
from textflux_tpu.models.transformer import flux_apply
from textflux_tpu.models.vae import vae_encode
from textflux_tpu.ops import packing, samplers


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults mirror scripts/train.sh + parser_helper.py."""

    learning_rate: float = 2e-5
    optimizer: str = "adamw"              # "adamw" | "adamw8bit" | "prodigy" (train_lora.sh: lr 1)
    lr_scheduler: str = "constant"        # "constant" | "cosine" | "linear"
    lr_warmup_steps: int = 0
    max_train_steps: int = 10000
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    guidance_scale: float = 1.0           # train.sh: --guidance_scale=1
    weighting_scheme: str = "none"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    schedule_shift: float = 3.0           # FLUX scheduler config shift
    grad_accum: int = 1
    remat: bool = True
    mode: str = "attn"                    # "attn" | "all" | "lora"
    lora_rank: int = 128
    lora_alpha: float = 128.0
    # Layers to EXCLUDE from the attention unfreeze. Default: none — the
    # reference's single_transformer_blocks list omits 11/12 but its
    # `grad_param in name` SUBSTRING match still unfreezes them, because
    # "transformer_blocks.11." (the double-block entry) is a substring of
    # "single_transformer_blocks.11.attn..." (scripts/train.py:578-585);
    # an earlier round misread the omission as a deliberate quirk.
    excluded_single_layers: Tuple[int, ...] = ()
    # model compute dtype (the reference's accelerate bf16 autocast); fp32
    # master params/optimizer state are unaffected — dense casts weights to
    # the activation dtype per-matmul (fused into the matmul by XLA)
    compute_dtype: str = "bfloat16"
    # dropout on the 320-ch packed conditioning (reference --dropout_prob,
    # scripts/train.py:946-948: torch.nn.Dropout on inpaint_cond)
    cond_dropout_prob: float = 0.0
    # prodigy knobs (reference parser_helper.py:363-394); optax's prodigy uses
    # AdamW-style decoupled decay, matching the reference default
    # --prodigy_decouple True; its D-estimate is not bias-corrected
    # (--prodigy_use_bias_correction has no optax equivalent)
    prodigy_beta3: Optional[float] = None
    prodigy_safeguard_warmup: bool = False
    # cosine_with_restarts / polynomial schedule shapes (diffusers
    # get_scheduler semantics; reference --lr_num_cycles / --lr_power)
    lr_num_cycles: int = 1
    lr_power: float = 1.0


# ---------------------------------------------------------------------------
# Trainable masks
# ---------------------------------------------------------------------------

def attn_only_mask(params, cfg: FluxConfig, tc: TrainConfig):
    """Mask tree (same structure as params, float leaves broadcastable onto
    grads): 1 where trainable. Mirrors the reference's "attn"-substring
    unfreeze: double-block qkv/proj/q-k-norms, single-block q/k/v columns of
    the fused linear1 + q/k norms; mods, MLPs, embedders stay frozen."""
    d = cfg.hidden_dim

    def zeros_like_struct(tree):
        return jax.tree.map(lambda x: jnp.zeros((), jnp.float32), tree)

    mask = zeros_like_struct(params)

    one = jnp.ones((), jnp.float32)
    for name in ("img_qkv", "txt_qkv", "img_proj", "txt_proj"):
        mask["double"][name] = jax.tree.map(lambda _: one, mask["double"][name])
    for name in ("img_q_scale", "img_k_scale", "txt_q_scale", "txt_k_scale"):
        mask["double"][name] = one

    n_single = cfg.num_single_layers
    layer_keep = jnp.asarray(
        [0.0 if i in tc.excluded_single_layers else 1.0 for i in range(n_single)],
        jnp.float32,
    )
    # fused linear1 columns: [q | k | v | mlp] — only q,k,v columns train
    qkv_cols = jnp.concatenate(
        [jnp.ones((3 * d,), jnp.float32), jnp.zeros((cfg.mlp_dim,), jnp.float32)])
    mask["single"]["linear1"] = {
        "w": layer_keep[:, None, None] * qkv_cols[None, None, :],
        "b": layer_keep[:, None] * qkv_cols[None, :],
    }
    mask["single"]["q_scale"] = layer_keep[:, None]
    mask["single"]["k_scale"] = layer_keep[:, None]
    return mask


def all_trainable_mask(params):
    return jax.tree.map(lambda x: jnp.ones((), jnp.float32), params)


def apply_mask(tree, mask):
    return jax.tree.map(lambda x, m: x * m.astype(x.dtype), tree, mask)


# ---------------------------------------------------------------------------
# LoRA parameterization (training-time; serving folds via io.lora)
# ---------------------------------------------------------------------------

# Dotted names address nested leaves (the double-block FF pairs). This is the
# reference's 12-module-class peft target list (train_lora.py:511-524): qkv +
# out projections of both streams and BOTH streams' FFs on double blocks; on
# single blocks only attn.to_q/k/v match (proj_mlp and proj_out are NOT in
# the list — peft suffix-matches module names), which live in the leading 3d
# columns of the fused linear1.
LORA_TARGETS_DOUBLE = ("img_qkv", "txt_qkv", "img_proj", "txt_proj",
                       "img_mlp.fc1", "img_mlp.fc2",
                       "txt_mlp.fc1", "txt_mlp.fc2")
LORA_TARGETS_SINGLE = ("linear1",)
# Fused projections whose reference counterparts are INDEPENDENT per-module
# peft adapters (to_q, to_k, to_v — each its own rank-r A and B). These train
# grouped factors a: (L, 3, in, r) / b: (L, 3, r, d) applied to the leading
# 3d output columns (layers.dense "lora_ga"/"lora_gb"); a single shared-A
# rank-r branch over the fused output would be a structurally different
# model family (q/k/v deltas constrained to one input subspace, and linear1's
# mlp tail adapted, which the reference never does).
LORA_GROUPED = {"img_qkv": 3, "txt_qkv": 3, "linear1": 3}


def lora_target_leaf(group_params, name: str):
    """Resolve a (possibly dotted) LoRA target name to its dense leaf."""
    node = group_params
    for part in name.split("."):
        node = node[part]
    return node


def _lora_set_leaf(out_group, src_group, name: str, leaf):
    """Immutably set a (possibly dotted, one level deep) target leaf."""
    parts = name.split(".")
    if len(parts) == 1:
        out_group[name] = leaf
        return
    sub = dict(out_group[parts[0]]) if parts[0] in out_group \
        else dict(src_group[parts[0]])
    sub[parts[1]] = leaf
    out_group[parts[0]] = sub


def lora_target_dims(leaf):
    """(lead, d_in, d_out) of a LoRA target leaf in any base layout: bf16
    ("w"), int8 ("w_q"/"w_q8a8", unpacked shape) or NF4 ("w_nf4", packed
    (d_in//2, d_out)). The QLoRA CLI quantizes the frozen base BEFORE LoRA
    init, so init must not assume a "w" key."""
    for k in ("w", "w_q", "w_q8a8"):
        if k in leaf:
            *lead, d_in, d_out = leaf[k].shape
            return lead, d_in, d_out
    if "w_nf4" in leaf:
        *lead, half, d_out = leaf["w_nf4"].shape
        return lead, 2 * half, d_out
    raise KeyError(f"no weight key in LoRA target leaf: {sorted(leaf)}")


def lora_init(key: jax.Array, params, cfg: FluxConfig, rank: int):
    """Per-target (A, B) factors: A ~ N(0, 1/r) (gaussian init), B = 0.
    Grouped targets (LORA_GROUPED) get independent per-module factors like
    the reference's peft adapters. Works over bf16 AND serve-quantized
    bases (see lora_target_dims)."""
    d = cfg.hidden_dim

    def factors(key, name, leaf):
        lead, d_in, d_out = lora_target_dims(leaf)
        ka, _ = jax.random.split(key)
        m = LORA_GROUPED.get(name)
        if m:
            a = jax.random.normal(ka, (*lead, m, d_in, rank), jnp.float32) / rank
            b = jnp.zeros((*lead, m, rank, d), jnp.float32)
        else:
            a = jax.random.normal(ka, (*lead, d_in, rank), jnp.float32) / rank
            b = jnp.zeros((*lead, rank, d_out), jnp.float32)
        return {"a": a, "b": b}

    keys = jax.random.split(key, len(LORA_TARGETS_DOUBLE) + len(LORA_TARGETS_SINGLE))
    ki = iter(keys)
    tree = {"double": {}, "single": {}}
    for name in LORA_TARGETS_DOUBLE:
        tree["double"][name] = factors(
            next(ki), name, lora_target_leaf(params["double"], name))
    for name in LORA_TARGETS_SINGLE:
        tree["single"][name] = factors(
            next(ki), name, lora_target_leaf(params["single"], name))
    return tree


def lora_merge(params, lora, scale: float):
    """params + scale * A@B on every LoRA target (jit-friendly). Requires a
    bf16/f32 base (``base["w"]``); used for serving-time folding. Training
    uses ``lora_insert`` (parallel branch, quantized-base capable)."""
    out = {k: v for k, v in params.items()}
    out["double"] = dict(params["double"])
    out["single"] = dict(params["single"])
    for group in ("double", "single"):
        for name, f in lora[group].items():
            base = lora_target_leaf(params[group], name)
            w = base["w"]
            if f["a"].ndim == 4:   # grouped per-module factors
                # (L, M, in, r) @ (L, M, r, d) -> (L, in, M*d) on the
                # leading M*d output columns; the fused mlp tail (linear1)
                # is not adapted
                delta = jnp.einsum("lmir,lmrd->limd", f["a"], f["b"]) * scale
                delta = delta.reshape(delta.shape[0], delta.shape[1], -1)
                cols = delta.shape[-1]
                w = w.at[..., :cols].add(delta.astype(w.dtype))
            else:
                delta = jnp.einsum("lir,lro->lio", f["a"], f["b"]) * scale
                w = w + delta.astype(w.dtype)
            _lora_set_leaf(out[group], params[group], name, dict(base, w=w))
    return out


def lora_insert(params, lora, scale: float):
    """Attach LoRA factors to every target leaf as a PARALLEL low-rank branch
    (models.layers.dense computes ``y += (x@A)@B``, alpha/rank folded into A).

    Unlike ``lora_merge`` this never materializes ``base + A@B`` — so the
    frozen base can be served-quantized (int8 weight-only / NF4, dequantized
    on-read inside the matmul), which is what makes a MEASURED full-depth 12B
    LoRA train step possible on one 16 GiB chip (the bf16 base alone is
    22.2 GiB). QLoRA-equivalent of the reference's LoRA fine-tune
    (/root/reference/scripts/train_lora.py:508-534).

    The base must not be w8a8: the per-token activation-quant round() has a
    zero gradient, so dL/dx through the base matmul would silently vanish.
    """

    def check(leaf):
        if "w_q8a8" in leaf:
            raise ValueError(
                "LoRA over a w8a8 base is unsupported: the activation-quant "
                "round() has zero gradient, so the base matmul would pass no "
                "dL/dx. Quantize the frozen base as weight_only or nf4.")

    out = {k: v for k, v in params.items()}
    out["double"] = dict(params["double"])
    out["single"] = dict(params["single"])
    for group in ("double", "single"):
        for name, f in lora[group].items():
            base = lora_target_leaf(params[group], name)
            check(base)
            if f["a"].ndim == 4:   # grouped per-module factors
                extra = {"lora_ga": f["a"] * scale, "lora_gb": f["b"]}
            else:
                extra = {"lora_a": f["a"] * scale, "lora_b": f["b"]}
            _lora_set_leaf(out[group], params[group], name,
                           dict(base, **extra))
    return out


# ---------------------------------------------------------------------------
# Optimizer / step
# ---------------------------------------------------------------------------

def make_lr_schedule(tc: TrainConfig):
    """constant / constant_with_warmup / cosine / cosine_with_restarts /
    linear / polynomial with optional warmup (the reference delegates to
    diffusers get_scheduler; train.sh uses constant, warmup 0)."""
    if tc.lr_scheduler in ("cosine_with_restarts", "polynomial"):
        # diffusers get_cosine_schedule_with_warmup(num_cycles=...) /
        # get_polynomial_decay_schedule_with_warmup(power=..., lr_end=1e-7)
        lr0 = tc.learning_rate
        total, warm = max(tc.max_train_steps, 1), tc.lr_warmup_steps
        cycles, power, lr_end = tc.lr_num_cycles, tc.lr_power, 1e-7
        restarts = tc.lr_scheduler == "cosine_with_restarts"

        def sched(step):
            s = jnp.asarray(step, jnp.float32)
            prog = jnp.clip((s - warm) / max(total - warm, 1), 0.0, 1.0)
            if restarts:
                main = lr0 * jnp.where(
                    prog >= 1.0, 0.0,
                    0.5 * (1.0 + jnp.cos(jnp.pi * ((cycles * prog) % 1.0))))
            else:
                main = (lr0 - lr_end) * (1.0 - prog) ** power + lr_end
            return jnp.where(s < warm, lr0 * s / max(warm, 1), main)

        return sched
    # NOTE max(warm, 1) only when warmup is actually requested: a phantom
    # 1-step warmup at warmup=0 ran step 0 at lr=0 and shifted the decay one
    # step vs diffusers' get_scheduler
    if tc.lr_scheduler == "cosine":
        if tc.lr_warmup_steps:
            return optax.warmup_cosine_decay_schedule(
                0.0, tc.learning_rate, tc.lr_warmup_steps, tc.max_train_steps)
        return optax.cosine_decay_schedule(tc.learning_rate, tc.max_train_steps)
    if tc.lr_scheduler == "linear":
        decay = optax.linear_schedule(
            tc.learning_rate, 0.0,
            max(tc.max_train_steps - tc.lr_warmup_steps, 1))
        if not tc.lr_warmup_steps:
            return decay
        return optax.join_schedules([
            optax.linear_schedule(0.0, tc.learning_rate, tc.lr_warmup_steps),
            decay,
        ], [tc.lr_warmup_steps])
    if tc.lr_warmup_steps:
        return optax.warmup_constant_schedule(0.0, tc.learning_rate, tc.lr_warmup_steps)
    return tc.learning_rate


def make_optimizer(tc: TrainConfig, mask=None) -> optax.GradientTransformation:
    """AdamW (or Prodigy, the reference's LoRA default) with global-norm
    clipping. When a trainable mask tree is given, optimizer state is only
    allocated for leaves with any trainable entry (optax.masked) — the
    fsdp-sharded analogue of DeepSpeed allocating state for requires_grad
    params only."""
    lr = make_lr_schedule(tc)
    if tc.optimizer == "prodigy":
        inner = optax.contrib.prodigy(
            learning_rate=lr, betas=(tc.adam_b1, tc.adam_b2),
            beta3=tc.prodigy_beta3, eps=tc.adam_eps,
            safeguard_warmup=tc.prodigy_safeguard_warmup,
            weight_decay=tc.weight_decay)
    elif tc.optimizer == "adamw8bit":
        # reference default for full-param training: bitsandbytes AdamW8bit
        # (scripts/train.py:723-741); int8 blockwise moment state
        from textflux_tpu.training.optim8bit import adamw8bit

        inner = adamw8bit(lr, b1=tc.adam_b1, b2=tc.adam_b2,
                          eps=tc.adam_eps, weight_decay=tc.weight_decay)
    else:
        inner = optax.adamw(lr, b1=tc.adam_b1, b2=tc.adam_b2,
                            eps=tc.adam_eps, weight_decay=tc.weight_decay)
    if mask is not None:
        leaf_mask = jax.tree.map(lambda m: bool(np_any_trainable(m)), mask)
        inner = optax.masked(inner, leaf_mask)
    tx = optax.chain(optax.clip_by_global_norm(tc.max_grad_norm), inner)
    if tc.optimizer == "prodigy":
        # optax prodigy's init() stores p0 (the initial params) BY REFERENCE,
        # so opt_state aliases the params buffers; a train step jitted with
        # donate_argnums over both then aborts with "Attempt to donate the
        # same buffer twice". Copy at init to break the aliasing.
        init = tx.init
        tx = tx._replace(
            init=lambda params: jax.tree.map(jnp.copy, init(params)))
    return tx


def np_any_trainable(m) -> bool:
    import numpy as np

    return bool(np.any(np.asarray(m) > 0))


def flow_matching_loss(
    flux_params,
    flux_cfg: FluxConfig,
    vae_params,
    vae_cfg: VAEConfig,
    tc: TrainConfig,
    batch: dict,
    key: jax.Array,
    *,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """One microbatch loss. batch: pixel_values (B,H,W,3) in [-1,1],
    mask (B,H,W) in {0,1}, txt (B,L,joint), pooled (B,pooled)."""
    pixels, mask = batch["pixel_values"], batch["mask"]
    # compute dtype: the reference trains under bf16 autocast (frozen parts
    # bf16, fp32 trainables/optimizer). Without this cast the f32 batch
    # embeddings PROMOTE the whole joint stream to f32 (layers.dense casts
    # weights to x.dtype), silently running every matmul and attention call
    # at f32 — measured: the full-depth QLoRA step dropped 1165 -> 1085 ms
    # when fixed (NF4 dequant, not matmul dtype, dominates that step), and
    # f32 K/V blew the flash kernel's VMEM envelope at 8704 tokens (the
    # multi-line canvas could not train at all before this cast).
    # Norms/softmax stay fp32 inside the model; the loss is f32 below.
    cdt = jnp.dtype(tc.compute_dtype)
    txt = batch["txt"].astype(cdt)
    pooled = batch["pooled"].astype(cdt)
    # the VAE runs in the compute dtype as well (the reference's VAE sits
    # under the same autocast); f32 pixels would otherwise promote both
    # encode passes — convs, norms and the mid-block attention — to f32
    pixels = pixels.astype(cdt)
    b = pixels.shape[0]
    k_vae, k_cond, k_t, k_noise, k_drop = jax.random.split(key, 5)

    # target latents + conditioning (both VAE passes sample the posterior,
    # matching encode_images_to_latents / prepare_fill_with_mask)
    x = vae_encode(vae_params, vae_cfg, pixels, key=k_vae).astype(cdt)
    masked = pixels * (1.0 - mask[..., None]).astype(cdt)
    z_cond = vae_encode(vae_params, vae_cfg, masked, key=k_cond).astype(cdt)
    cond = jnp.concatenate(
        [packing.pack_latents(z_cond),
         packing.pack_mask(mask.astype(z_cond.dtype), vae_cfg.spatial_factor)],
        axis=-1,
    )
    if tc.cond_dropout_prob > 0:
        # reference --dropout_prob: torch.nn.Dropout on the packed inpaint
        # conditioning (scripts/train.py:946-948) — elementwise zero with
        # prob p, survivors scaled by 1/(1-p)
        keep = jax.random.bernoulli(k_drop, 1.0 - tc.cond_dropout_prob,
                                    cond.shape)
        cond = cond * keep.astype(cond.dtype) / (1.0 - tc.cond_dropout_prob)

    u = samplers.sample_timestep_density(
        k_t, b, tc.weighting_scheme, tc.logit_mean, tc.logit_std, tc.mode_scale)
    sigmas = samplers.train_sigmas(u, shift=tc.schedule_shift)
    noise = jax.random.normal(k_noise, x.shape, jnp.float32).astype(x.dtype)
    sig = sigmas.astype(x.dtype)[:, None, None, None]
    noisy = (1.0 - sig) * x + sig * noise

    lat_h, lat_w = x.shape[1], x.shape[2]
    ids = jnp.concatenate(
        [jnp.zeros((txt.shape[1], 3)),
         jnp.asarray(packing.latent_image_ids(lat_h, lat_w), jnp.float32)], axis=0)
    # training shapes are static per bucket; tables still fold into the jit
    cos, sin = rope_tables_jnp(ids, flux_cfg.axes_dims_rope, flux_cfg.rope_theta)

    pred = flux_apply(
        flux_params, flux_cfg,
        jnp.concatenate([packing.pack_latents(noisy), cond], axis=-1),
        txt, pooled,
        sigmas,
        jnp.full((b,), tc.guidance_scale, jnp.float32) if flux_cfg.guidance_embeds else None,
        cos, sin,
        attn_impl=attn_impl, remat=tc.remat,
    )

    target = packing.pack_latents(noise - x)
    w = samplers.loss_weighting(tc.weighting_scheme, sigmas)[:, None, None]
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return jnp.mean(w * err)


def rope_tables_jnp(ids: jnp.ndarray, axes_dims: Sequence[int], theta: int = 10000):
    """In-jit RoPE tables (float32; positions here are small integers so fp64
    precomputation is unnecessary)."""
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        angles = jnp.outer(ids[:, axis].astype(jnp.float32), freqs)
        cos_parts.append(jnp.repeat(jnp.cos(angles), 2, axis=1))
        sin_parts.append(jnp.repeat(jnp.sin(angles), 2, axis=1))
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def make_train_step(
    flux_cfg: FluxConfig,
    vae_cfg: VAEConfig,
    tc: TrainConfig,
    tx: Optional[optax.GradientTransformation] = None,
    *,
    attn_impl: str = "auto",
    trainable_leaves=None,
):
    """Build the jittable full-parameter train step.

    Signature: (params, opt_state, mask, vae_params, batch, key) ->
    (params, opt_state, metrics). ``batch`` leaves carry a leading grad-accum
    axis: (A, B, ...). jit this with sharded in/out shardings for multi-chip.

    trainable_leaves: optional pytree of python bools (params structure) —
    leaves marked False get stop_gradient in the loss, so the backward pass
    never emits their weight-grad matmuls (with the attn-only unfreeze, ~70%
    of the 12B weight-grad compute). Build it with
    ``jax.tree.map(np_any_trainable, mask)``. The (traced) ``mask`` argument
    still applies the sub-tensor column masks within partially trainable
    leaves.
    """
    tx = tx or make_optimizer(tc)

    def loss_of(params, vae_params, mb, k):
        if trainable_leaves is not None:
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, trainable_leaves)
        return flow_matching_loss(
            params, flux_cfg, vae_params, vae_cfg, tc, mb, k, attn_impl=attn_impl)

    def step(params, opt_state, mask, vae_params, batch, key):
        accum = batch["pixel_values"].shape[0]

        if accum == 1:
            # no accumulation: skip the scan and its fp32 zeros tree (a full
            # param-sized buffer — 8.6 GB at 12B scale)
            loss_sum, grads = jax.value_and_grad(loss_of)(
                params, vae_params, jax.tree.map(lambda x: x[0], batch), key)
        else:
            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, k = xs
                loss, grads = jax.value_and_grad(loss_of)(params, vae_params, mb, k)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), None

            zeros = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), params)
            keys = jax.random.split(key, accum)
            (grads, loss_sum), _ = jax.lax.scan(micro, (zeros, jnp.zeros(())), (batch, keys))
            grads = jax.tree.map(lambda g: g / accum, grads)
        grads = apply_mask(grads, mask)

        updates, opt_state = tx.update(grads, opt_state, params)
        updates = apply_mask(updates, mask)
        params = optax.apply_updates(params, updates)

        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss_sum / accum, "grad_norm": gnorm}

    return step


def make_lora_train_step(
    flux_cfg: FluxConfig,
    vae_cfg: VAEConfig,
    tc: TrainConfig,
    tx: Optional[optax.GradientTransformation] = None,
    *,
    attn_impl: str = "auto",
):
    """LoRA train step: gradients flow only through the (A, B) factor tree.

    The factors attach as parallel low-rank branches (``lora_insert``), never
    as a materialized ``base + A@B`` — identical gradients on a bf16 base
    (tested), and the only formulation that works over a quantized frozen
    base (int8 weight-only / NF4) for single-chip 12B training."""
    tx = tx or make_optimizer(tc)
    scale = tc.lora_alpha / tc.lora_rank

    def step(base_params, lora, opt_state, vae_params, batch, key):
        accum = batch["pixel_values"].shape[0]

        def loss_fn(lora, mb, k):
            merged = lora_insert(base_params, lora, scale)
            return flow_matching_loss(
                merged, flux_cfg, vae_params, vae_cfg, tc, mb, k, attn_impl=attn_impl)

        if accum == 1:
            loss_sum, grads = jax.value_and_grad(loss_fn)(
                lora, jax.tree.map(lambda x: x[0], batch), key)
        else:
            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, k = xs
                loss, grads = jax.value_and_grad(loss_fn)(lora, mb, k)
                return (jax.tree.map(jnp.add, grads_acc, grads), loss_acc + loss), None

            zeros = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), lora)
            keys = jax.random.split(key, accum)
            (grads, loss_sum), _ = jax.lax.scan(micro, (zeros, jnp.zeros(())), (batch, keys))
            grads = jax.tree.map(lambda g: g / accum, grads)

        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, {"loss": loss_sum / accum, "grad_norm": optax.global_norm(grads)}

    return step
