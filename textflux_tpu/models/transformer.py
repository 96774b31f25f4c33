"""FLUX-style MM-DiT: 19 double-stream + 38 single-stream blocks, scan-stacked.

TPU-first design choices (vs the reference's per-block nn.ModuleList,
/root/reference/diffusers/.../transformer_flux.py:675-1212):

- **Scan over stacked block params**: all double blocks share one traced body
  (`lax.scan` over leading-axis-stacked weights), likewise singles. One block is
  compiled instead of 57, and remat/checkpointing applies per scan step.
- **Fused projections**: q,k,v are one (D, 3D) matmul per stream; the single
  block fuses qkv+mlp-in into one (D, 3D+4D) matmul and attn-out+mlp-out into
  one (D+4D, D) matmul — larger MXU tiles, fewer HBM round trips.
- **RoPE tables precomputed on host** (float64) and passed as arrays.
- Norms/AdaLN/softmax in float32, matmuls in the activation dtype (bf16).

Parameter layout is this framework's own; ``textflux_tpu.io.params`` maps
diffusers checkpoints onto it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from textflux_tpu.config import FluxConfig
from textflux_tpu.models.layers import (
    dense,
    dense_init,
    gelu_tanh,
    layer_norm,
    mlp_init,
    rms_norm,
    silu,
    timestep_embedding,
)
from textflux_tpu.ops.attention import dot_product_attention
from textflux_tpu.ops.rope import apply_rope_bshd


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _double_block_init(key: jax.Array, cfg: FluxConfig):
    d, m = cfg.hidden_dim, cfg.mlp_dim
    ks = jax.random.split(key, 10)
    return {
        "img_mod": dense_init(ks[0], d, 6 * d),
        "txt_mod": dense_init(ks[1], d, 6 * d),
        "img_qkv": dense_init(ks[2], d, 3 * d),
        "txt_qkv": dense_init(ks[3], d, 3 * d),
        "img_q_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "img_k_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "txt_q_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "txt_k_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "img_proj": dense_init(ks[4], d, d),
        "txt_proj": dense_init(ks[5], d, d),
        "img_mlp": mlp_init(ks[6], d, m, d),
        "txt_mlp": mlp_init(ks[7], d, m, d),
    }


def _single_block_init(key: jax.Array, cfg: FluxConfig):
    d, m = cfg.hidden_dim, cfg.mlp_dim
    ks = jax.random.split(key, 3)
    return {
        "mod": dense_init(ks[0], d, 3 * d),
        "linear1": dense_init(ks[1], d, 3 * d + m),
        "q_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "k_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "linear2": dense_init(ks[2], d + m, d),
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def init_flux_params(key: jax.Array, cfg: FluxConfig):
    d = cfg.hidden_dim
    ks = jax.random.split(key, 8 + cfg.num_double_layers + cfg.num_single_layers)
    params = {
        "img_in": dense_init(ks[0], cfg.in_channels, d),
        "txt_in": dense_init(ks[1], cfg.joint_dim, d),
        "time_in": mlp_init(ks[2], cfg.time_embed_channels, d, d),
        "vector_in": mlp_init(ks[3], cfg.pooled_dim, d, d),
        "final_mod": dense_init(ks[4], d, 2 * d),
        "final_proj": dense_init(ks[5], d, cfg.out_channels),
        "double": _stack([
            _double_block_init(ks[8 + i], cfg) for i in range(cfg.num_double_layers)
        ]),
        "single": _stack([
            _single_block_init(ks[8 + cfg.num_double_layers + i], cfg)
            for i in range(cfg.num_single_layers)
        ]),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = mlp_init(ks[6], cfg.time_embed_channels, d, d)
    return params


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1)


def _modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return layer_norm(x) * (1.0 + scale[:, None]) + shift[:, None]


# safety valve: beyond this joint sequence length fall back to the unfused
# flash kernel (same permuted weights + rotate-half tables, applied outside).
# The fused kernel streams K/V + tables in 2048-token chunks, so its VMEM use
# is sequence-length independent; this bound only caps untested extremes.
FUSED_MAX_SEQ = 32768


def _apply_rope_half_bshd(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE on (B, S, H, D) (the permuted-weights convention)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    rot = jnp.concatenate([-xf[..., d // 2:], xf[..., : d // 2]], axis=-1)
    out = xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
    return out.astype(orig)


def double_block(p, cfg: FluxConfig, txt, img, mods, rope_cos, rope_sin, attn_impl, kv_len):
    """One double-stream block: separate img/txt QKV + MLPs, joint attention.

    mods = (img_mod (B, 6D), txt_mod (B, 6D)) — the block's AdaLN modulation
    vectors, computed by the caller (per step, or precomputed for the whole
    sigma schedule by ``flux_mods``)."""
    n_txt = txt.shape[1]
    img_mod, txt_mod = mods
    (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2) = jnp.split(img_mod, 6, axis=-1)
    (t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = jnp.split(txt_mod, 6, axis=-1)

    img_n = _modulate(img, i_shift1, i_scale1)
    txt_n = _modulate(txt, t_shift1, t_scale1)

    iq, ik, iv = jnp.split(dense(p["img_qkv"], img_n), 3, axis=-1)
    tq, tk, tv = jnp.split(dense(p["txt_qkv"], txt_n), 3, axis=-1)
    h = cfg.num_heads

    if attn_impl == "fused" and (txt.shape[1] + img.shape[1]) <= FUSED_MAX_SEQ:
        # raw q/k: RMSNorm + rotate-half RoPE fuse into the attention kernel
        # (params must be in half-permuted layout, tables rotate-half)
        from textflux_tpu.ops.flash_attention import flash_attention_qk_norm_rope

        q = _heads(jnp.concatenate([tq, iq], axis=1), h)
        k = _heads(jnp.concatenate([tk, ik], axis=1), h)
        v = _heads(jnp.concatenate([tv, iv], axis=1), h)
        n_img = q.shape[1] - n_txt
        qs = jnp.concatenate([
            jnp.broadcast_to(p["txt_q_scale"][None], (n_txt, cfg.head_dim)),
            jnp.broadcast_to(p["img_q_scale"][None], (n_img, cfg.head_dim))])
        ks = jnp.concatenate([
            jnp.broadcast_to(p["txt_k_scale"][None], (n_txt, cfg.head_dim)),
            jnp.broadcast_to(p["img_k_scale"][None], (n_img, cfg.head_dim))])
        out = flash_attention_qk_norm_rope(q, k, v, rope_cos, rope_sin, qs, ks,
                                           kv_len=kv_len)
    elif attn_impl == "fused":
        # long-sequence fallback: same permuted weights + rotate-half tables,
        # rms/rope applied outside, unfused flash kernel
        iq, ik, iv = _heads(iq, h), _heads(ik, h), _heads(iv, h)
        tq, tk, tv = _heads(tq, h), _heads(tk, h), _heads(tv, h)
        iq = rms_norm(iq, p["img_q_scale"])
        ik = rms_norm(ik, p["img_k_scale"])
        tq = rms_norm(tq, p["txt_q_scale"])
        tk = rms_norm(tk, p["txt_k_scale"])
        q = _apply_rope_half_bshd(jnp.concatenate([tq, iq], axis=1), rope_cos, rope_sin)
        k = _apply_rope_half_bshd(jnp.concatenate([tk, ik], axis=1), rope_cos, rope_sin)
        v = jnp.concatenate([tv, iv], axis=1)
        out = dot_product_attention(q, k, v, impl="pallas", kv_len=kv_len)
    else:
        iq, ik, iv = _heads(iq, h), _heads(ik, h), _heads(iv, h)
        tq, tk, tv = _heads(tq, h), _heads(tk, h), _heads(tv, h)
        iq = rms_norm(iq, p["img_q_scale"])
        ik = rms_norm(ik, p["img_k_scale"])
        tq = rms_norm(tq, p["txt_q_scale"])
        tk = rms_norm(tk, p["txt_k_scale"])

        # text tokens prepended (attention_processor.py:2029-2035)
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = apply_rope_bshd(q, rope_cos, rope_sin)
        k = apply_rope_bshd(k, rope_cos, rope_sin)
        out = dot_product_attention(q, k, v, impl=attn_impl, kv_len=kv_len)

    out = out.reshape(out.shape[0], out.shape[1], -1)
    txt_attn, img_attn = out[:, :n_txt], out[:, n_txt:]

    img = img + i_gate1[:, None] * dense(p["img_proj"], img_attn)
    img_mlp_in = _modulate(img, i_shift2, i_scale2)
    img = img + i_gate2[:, None] * dense(p["img_mlp"]["fc2"], gelu_tanh(dense(p["img_mlp"]["fc1"], img_mlp_in)))

    txt = txt + t_gate1[:, None] * dense(p["txt_proj"], txt_attn)
    txt_mlp_in = _modulate(txt, t_shift2, t_scale2)
    txt = txt + t_gate2[:, None] * dense(p["txt_mlp"]["fc2"], gelu_tanh(dense(p["txt_mlp"]["fc1"], txt_mlp_in)))
    return txt, img


def single_block(p, cfg: FluxConfig, x, mod, rope_cos, rope_sin, attn_impl, kv_len):
    """One single-stream block: parallel attention + MLP over the joint sequence.

    mod: (B, 3D) AdaLN modulation vector (see double_block)."""
    d, m, h = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    x_n = _modulate(x, shift, scale)

    fused = dense(p["linear1"], x_n)
    q, k, v, mlp = jnp.split(fused, [d, 2 * d, 3 * d], axis=-1)
    q, k, v = _heads(q, h), _heads(k, h), _heads(v, h)
    if attn_impl == "fused" and x.shape[1] <= FUSED_MAX_SEQ:
        from textflux_tpu.ops.flash_attention import flash_attention_qk_norm_rope

        attn = flash_attention_qk_norm_rope(
            q, k, v, rope_cos, rope_sin, p["q_scale"], p["k_scale"], kv_len=kv_len)
    elif attn_impl == "fused":
        q = _apply_rope_half_bshd(rms_norm(q, p["q_scale"]), rope_cos, rope_sin)
        k = _apply_rope_half_bshd(rms_norm(k, p["k_scale"]), rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, impl="pallas", kv_len=kv_len)
    else:
        q = rms_norm(q, p["q_scale"])
        k = rms_norm(k, p["k_scale"])
        q = apply_rope_bshd(q, rope_cos, rope_sin)
        k = apply_rope_bshd(k, rope_cos, rope_sin)
        attn = dot_product_attention(q, k, v, impl=attn_impl, kv_len=kv_len)
    attn = attn.reshape(attn.shape[0], attn.shape[1], -1)

    out = dense(p["linear2"], jnp.concatenate([attn, gelu_tanh(mlp)], axis=-1))
    return x + gate[:, None] * out


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def flux_vec(params, cfg: FluxConfig, timestep, guidance, pooled, dtype=jnp.bfloat16):
    """The AdaLN conditioning vector (B, D) from timestep + guidance + pooled
    CLIP embedding (time_text_embed, transformer_flux.py:1088-1098)."""
    vec = dense(params["time_in"]["fc2"], silu(dense(
        params["time_in"]["fc1"],
        timestep_embedding(timestep * 1000.0, cfg.time_embed_channels).astype(dtype))))
    if cfg.guidance_embeds:
        if guidance is None:
            raise ValueError("model expects guidance embeddings")
        vec = vec + dense(params["guidance_in"]["fc2"], silu(dense(
            params["guidance_in"]["fc1"],
            timestep_embedding(guidance * 1000.0, cfg.time_embed_channels).astype(dtype))))
    vec = vec + dense(params["vector_in"]["fc2"], silu(dense(
        params["vector_in"]["fc1"], pooled.astype(dtype))))
    return vec


def _dense_stacked(p, x: jnp.ndarray) -> jnp.ndarray:
    """Apply stacked per-layer dense weights (L, D_in, D_out) to a shared
    input x (B, D_in) -> (L, B, D_out); handles bf16 / int8 leaf layouts."""
    wl = next(p[k] for k in ("w", "w_q", "w_q8a8", "w_nf4") if k in p)
    n_layers = wl.shape[0]
    if "w_nf4" in p:
        # dequantize one layer at a time: a stacked dequant would
        # materialize ALL layers' bf16 weights at once (the mods stack is
        # 27% of the DiT -> ~6.5 GB, an instant OOM next to the resident
        # params); mods run once per image so the scan costs nothing
        def layer(_, pl_):
            return None, dense(pl_, x)
        _, y = jax.lax.scan(layer, None,
                            {k: v for k, v in p.items() if k != "b"})
    else:
        xb = jnp.broadcast_to(x[None], (n_layers,) + x.shape)
        y = dense({k: v for k, v in p.items() if k != "b"}, xb)
    if "b" in p:  # stacked bias (L, D_out) aligns against (L, B, D_out)
        y = y + p["b"][:, None, :].astype(y.dtype)
    return y


def flux_mods(params, cfg: FluxConfig, vec: jnp.ndarray):
    """All AdaLN modulation vectors for conditioning vec (B, D).

    The modulation weights are ~27% of the DiT's parameters but their inputs
    depend only on (timestep, guidance, pooled) — not on the latents. For a
    whole denoise schedule, call with vec of shape (steps*B, D): every
    modulation weight is then read ONCE per image instead of once per step
    (measured -5.1 ms/step at full depth, w8a8, B=1; see ARCHITECTURE.md).

    Returns {"double": (img (L, B, 6D), txt (L, B, 6D)),
             "single": (L, B, 3D), "final": (B, 2D)}.
    """
    sv = silu(vec)
    return {
        "double": (_dense_stacked(params["double"]["img_mod"], sv),
                   _dense_stacked(params["double"]["txt_mod"], sv)),
        "single": _dense_stacked(params["single"]["mod"], sv),
        "final": dense(params["final_mod"], sv),
    }


def flux_apply(
    params,
    cfg: FluxConfig,
    img_tokens: jnp.ndarray,      # (B, T_img, in_channels)
    txt_tokens: jnp.ndarray,      # (B, T_txt, joint_dim)
    pooled: jnp.ndarray,          # (B, pooled_dim)
    timestep: jnp.ndarray,        # (B,) sigma in [0, 1]
    guidance: Optional[jnp.ndarray],  # (B,) guidance scale or None
    rope_cos: jnp.ndarray,        # (T_txt + T_img, head_dim)
    rope_sin: jnp.ndarray,
    *,
    attn_impl: str = "auto",
    remat: bool = False,
    kv_len: Optional[int] = None,
    mods=None,                    # optional precomputed flux_mods(...) output
) -> jnp.ndarray:
    """Predict the flow velocity for packed image tokens. Returns (B, T_img, out_channels)."""
    n_txt = txt_tokens.shape[1]
    dtype = img_tokens.dtype

    if mods is None:
        vec = flux_vec(params, cfg, timestep, guidance, pooled, dtype)
        sv = silu(vec)
        mods = {
            # computed lazily per block inside the scan bodies below (cheaper
            # under remat than materializing all layers' vectors up front)
            "final": dense(params["final_mod"], sv),
        }
        double_xs = params["double"]
        single_xs = params["single"]

        def double_body(carry, bp):
            txt, img = carry
            m = (dense(bp["img_mod"], sv), dense(bp["txt_mod"], sv))
            txt, img = double_block(bp, cfg, txt, img, m, rope_cos, rope_sin, attn_impl, kv_len)
            return (txt, img), None

        def single_body(x, bp):
            x = single_block(bp, cfg, x, dense(bp["mod"], sv), rope_cos, rope_sin, attn_impl, kv_len)
            return x, None
    else:
        double_xs = (params["double"], mods["double"])
        single_xs = (params["single"], mods["single"])

        def double_body(carry, xs):
            txt, img = carry
            bp, m = xs
            txt, img = double_block(bp, cfg, txt, img, m, rope_cos, rope_sin, attn_impl, kv_len)
            return (txt, img), None

        def single_body(x, xs):
            bp, m = xs
            x = single_block(bp, cfg, x, m, rope_cos, rope_sin, attn_impl, kv_len)
            return x, None

    img = dense(params["img_in"], img_tokens)
    txt = dense(params["txt_in"], txt_tokens.astype(dtype))

    rope_cos = rope_cos.astype(jnp.float32)
    rope_sin = rope_sin.astype(jnp.float32)

    if remat:
        double_body = jax.checkpoint(double_body, prevent_cse=False)
        single_body = jax.checkpoint(single_body, prevent_cse=False)

    (txt, img), _ = jax.lax.scan(double_body, (txt, img), double_xs)
    x = jnp.concatenate([txt, img], axis=1)
    x, _ = jax.lax.scan(single_body, x, single_xs)
    x = x[:, n_txt:]

    # AdaLN-continuous output head: chunk order is (scale, shift)
    # (normalization.py:361-366)
    scale, shift = jnp.split(mods["final"], 2, axis=-1)
    x = layer_norm(x) * (1.0 + scale[:, None]) + shift[:, None]
    return dense(params["final_proj"], x)


def flux_param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def half_permute_flux_params(params, cfg: FluxConfig):
    """Permute q/k feature columns into the rotate-half layout required by the
    fused attention kernel (attn_impl="fused").

    The permutation is a similarity transform on the attention logits (q and k
    permuted identically), so outputs are unchanged; it folds the interleaved
    RoPE pairing into the weights once at load time. v and all other params
    are untouched.
    """
    import numpy as np

    from textflux_tpu.ops.rope import half_permutation

    perm = half_permutation(cfg.head_dim)
    d = cfg.hidden_dim
    per_head = np.concatenate(
        [h * cfg.head_dim + perm for h in range(cfg.num_heads)])

    def permute_qkv(p, extra_cols: int = 0):
        idx = np.concatenate([per_head, d + per_head,
                              2 * d + np.arange(d + extra_cols)])
        # every quantized-leaf layout keeps the out dim last, so one gather
        # covers them all (w_nf4 packs along the IN dim, absmax4 groups it —
        # their out axes are untouched by packing)
        out = {k: v[..., idx] for k, v in p.items()
               if k in ("w", "w_q", "w_q8a8", "w_nf4", "scale", "absmax4",
                        "b")}
        return out

    out = dict(params)
    dbl = dict(params["double"])
    dbl["img_qkv"] = permute_qkv(params["double"]["img_qkv"])
    dbl["txt_qkv"] = permute_qkv(params["double"]["txt_qkv"])
    for name in ("img_q_scale", "img_k_scale", "txt_q_scale", "txt_k_scale"):
        dbl[name] = params["double"][name][..., perm]
    out["double"] = dbl

    sng = dict(params["single"])
    sng["linear1"] = permute_qkv(params["single"]["linear1"], extra_cols=cfg.mlp_dim)
    for name in ("q_scale", "k_scale"):
        sng[name] = params["single"][name][..., perm]
    out["single"] = sng
    return out
