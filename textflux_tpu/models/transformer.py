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


# ---------------------------------------------------------------------------
# Tensor-parallel helpers (clean-megatron schedule)
#
# With tp > 1 the fused projections are in DEVICE-MAJOR column layout
# (tp_permute_flux_params): contiguous GSPMD shard d of the out dim holds
# [q_d | k_d | v_d (| mlp_d)] — every segment's d-th head-aligned chunk. The
# split below is then local (no resharding), attention runs head-parallel
# under shard_map (no replicated-pallas all-gathers), and the only
# collectives left are the row-parallel projections' all-reduces — the
# textbook 2-per-block megatron schedule. Audited from compiled HLO by
# benchmarks/audit_collectives.py (was: ~3.6 GiB/step of resharding storm
# with plain GSPMD propagation; see ARCHITECTURE.md).
# ---------------------------------------------------------------------------

def _wsc(x, mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def _tp_split(y, segs, tp, mesh, bax):
    """Split a device-major fused projection output (B, S, sum(segs)) into
    per-segment arrays (B, S, seg) — communication-free under GSPMD: the
    reshape factors the sharded axis into (tp, chunk), the slice is local,
    and the merge re-forms each segment with its natural contiguous
    head-sharding."""
    b, s, c = y.shape
    chunk = c // tp
    y = _wsc(y.reshape(b, s, tp, chunk), mesh, bax, None, "tensor", None)
    outs, o = [], 0
    for seg in segs:
        sl = seg // tp
        outs.append(_wsc(y[..., o:o + sl].reshape(b, s, seg), mesh,
                         bax, None, "tensor"))
        o += sl
    return outs


def _head_shard(mesh, bax, fn, qkv, reps):
    """Run fn(*qkv, *reps) under shard_map with q/k/v (B, S, H, D)
    head-sharded over the tensor axis and reps replicated. Joint attention is
    embarrassingly parallel over heads, so the body needs no collectives —
    and the Pallas kernel inside runs per-shard instead of GSPMD's replicated
    fallback (which all-gathered q/k/v every block)."""
    from jax.sharding import PartitionSpec as P

    from jax import shard_map

    bspec = P(bax, None, "tensor", None)
    return shard_map(
        fn, mesh=mesh,
        in_specs=tuple([bspec] * len(qkv) + [P()] * len(reps)),
        out_specs=bspec, check_vma=False,
    )(*qkv, *reps)


def _tp_attn_mlp(mesh, bax, fn, qkv, mlp, reps):
    """shard_map for the single-stream block body: q/k/v head-sharded, the
    mlp pre-activation column-sharded, reps replicated. fn returns the LOCAL
    [attn_d | gelu(mlp)_d] concat (B, S, (d + m) / tp); stitched along the
    tensor axis the global result is device-major over (attn, mlp) — exactly
    linear2's tp-permuted row layout."""
    from jax.sharding import PartitionSpec as P

    from jax import shard_map

    bspec = P(bax, None, "tensor", None)
    cspec = P(bax, None, "tensor")
    return shard_map(
        fn, mesh=mesh,
        in_specs=tuple([bspec] * len(qkv) + [cspec] + [P()] * len(reps)),
        out_specs=cspec, check_vma=False,
    )(*qkv, mlp, *reps)


def _batch_axes(mesh, b: int):
    """Shard the batch dim over (data, fsdp) when it divides; B=1 single-image
    calls on a multi-chip mesh stay replicated over the data axes."""
    missing = [a for a in ("data", "fsdp", "tensor") if a not in mesh.shape]
    if missing:
        raise ValueError(
            f"tensor-parallel flux_apply needs a ('data', 'fsdp', 'tensor') "
            f"mesh (build it with parallel.partitioning.make_mesh); the given "
            f"mesh {tuple(mesh.shape)} lacks {missing}")
    df = mesh.shape["data"] * mesh.shape["fsdp"]
    return ("data", "fsdp") if b % df == 0 else None


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


def double_block(p, cfg: FluxConfig, txt, img, mods, rope_cos, rope_sin, attn_impl, kv_len,
                 tp: int = 1, mesh=None, bax=None):
    """One double-stream block: separate img/txt QKV + MLPs, joint attention.

    mods = (img_mod (B, 6D), txt_mod (B, 6D)) — the block's AdaLN modulation
    vectors, computed by the caller (per step, or precomputed for the whole
    sigma schedule by ``flux_mods``).

    tp > 1: tensor-parallel fast path — requires tp_permute_flux_params'd
    weights (device-major fused columns) and an active ``mesh``."""
    n_txt = txt.shape[1]
    img_mod, txt_mod = mods
    if tp > 1:
        # modulation vectors are tiny (B, 6D); replicate them so the six-way
        # split below is local regardless of how the mod weights are sharded
        img_mod = _wsc(img_mod, mesh, bax, None)
        txt_mod = _wsc(txt_mod, mesh, bax, None)
    (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2) = jnp.split(img_mod, 6, axis=-1)
    (t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = jnp.split(txt_mod, 6, axis=-1)

    img_n = _modulate(img, i_shift1, i_scale1)
    txt_n = _modulate(txt, t_shift1, t_scale1)

    d = cfg.hidden_dim
    if tp > 1:
        iq, ik, iv = _tp_split(dense(p["img_qkv"], img_n), (d, d, d), tp, mesh, bax)
        tq, tk, tv = _tp_split(dense(p["txt_qkv"], txt_n), (d, d, d), tp, mesh, bax)
    else:
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
        if tp > 1:
            out = _head_shard(
                mesh, bax,
                lambda q_, k_, v_, c_, s_, qs_, ks_: flash_attention_qk_norm_rope(
                    q_, k_, v_, c_, s_, qs_, ks_, kv_len=kv_len),
                (q, k, v), (rope_cos, rope_sin, qs, ks))
        else:
            out = flash_attention_qk_norm_rope(q, k, v, rope_cos, rope_sin,
                                               qs, ks, kv_len=kv_len)
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
        if tp > 1:
            out = _head_shard(
                mesh, bax,
                lambda q_, k_, v_: dot_product_attention(
                    q_, k_, v_, impl="pallas", kv_len=kv_len),
                (q, k, v), ())
        else:
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
        if tp > 1:
            out = _head_shard(
                mesh, bax,
                lambda q_, k_, v_: dot_product_attention(
                    q_, k_, v_, impl=attn_impl, kv_len=kv_len),
                (q, k, v), ())
        else:
            out = dot_product_attention(q, k, v, impl=attn_impl, kv_len=kv_len)

    out = out.reshape(out.shape[0], out.shape[1], -1)
    if tp > 1:  # contiguous head shards == contiguous column shards
        out = _wsc(out, mesh, bax, None, "tensor")
    txt_attn, img_attn = out[:, :n_txt], out[:, n_txt:]

    img = img + i_gate1[:, None] * dense(p["img_proj"], img_attn)
    img_mlp_in = _modulate(img, i_shift2, i_scale2)
    img = img + i_gate2[:, None] * dense(p["img_mlp"]["fc2"], gelu_tanh(dense(p["img_mlp"]["fc1"], img_mlp_in)))

    txt = txt + t_gate1[:, None] * dense(p["txt_proj"], txt_attn)
    txt_mlp_in = _modulate(txt, t_shift2, t_scale2)
    txt = txt + t_gate2[:, None] * dense(p["txt_mlp"]["fc2"], gelu_tanh(dense(p["txt_mlp"]["fc1"], txt_mlp_in)))
    if tp > 1:  # residual streams stay replicated between blocks (the
        # row-parallel proj/fc2 all-reduces land here — 2 per stream)
        img = _wsc(img, mesh, bax, None, None)
        txt = _wsc(txt, mesh, bax, None, None)
    return txt, img


def single_block(p, cfg: FluxConfig, x, mod, rope_cos, rope_sin, attn_impl, kv_len,
                 tp: int = 1, mesh=None, bax=None):
    """One single-stream block: parallel attention + MLP over the joint sequence.

    mod: (B, 3D) AdaLN modulation vector (see double_block).

    tp > 1 (tensor-parallel fast path, tp_permute_flux_params'd weights):
    linear1 splits device-major; attention + gelu + the [attn | mlp] concat
    all run INSIDE shard_map, so the concat's global layout is device-major
    by construction — matching linear2's tp-permuted input rows — and no
    GSPMD-unrepresentable interleaved sharding ever materializes."""
    d, m, h = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
    if tp > 1:
        mod = _wsc(mod, mesh, bax, None)
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    x_n = _modulate(x, shift, scale)

    fused = dense(p["linear1"], x_n)
    if tp > 1:
        q, k, v, mlp = _tp_split(fused, (d, d, d, m), tp, mesh, bax)
    else:
        q, k, v, mlp = jnp.split(fused, [d, 2 * d, 3 * d], axis=-1)
    q, k, v = _heads(q, h), _heads(k, h), _heads(v, h)

    def _concat_mlp(attn_, mlp_):
        attn_ = attn_.reshape(attn_.shape[0], attn_.shape[1], -1)
        return jnp.concatenate([attn_, gelu_tanh(mlp_)], axis=-1)

    if attn_impl == "fused" and x.shape[1] <= FUSED_MAX_SEQ:
        from textflux_tpu.ops.flash_attention import flash_attention_qk_norm_rope

        if tp > 1:
            y = _tp_attn_mlp(
                mesh, bax,
                lambda q_, k_, v_, mlp_, c_, s_, qs_, ks_: _concat_mlp(
                    flash_attention_qk_norm_rope(q_, k_, v_, c_, s_, qs_, ks_,
                                                 kv_len=kv_len), mlp_),
                (q, k, v), mlp, (rope_cos, rope_sin, p["q_scale"], p["k_scale"]))
        else:
            attn = flash_attention_qk_norm_rope(
                q, k, v, rope_cos, rope_sin, p["q_scale"], p["k_scale"], kv_len=kv_len)
    else:
        if attn_impl == "fused":
            q = _apply_rope_half_bshd(rms_norm(q, p["q_scale"]), rope_cos, rope_sin)
            k = _apply_rope_half_bshd(rms_norm(k, p["k_scale"]), rope_cos, rope_sin)
            impl = "pallas"
        else:
            q = rms_norm(q, p["q_scale"])
            k = rms_norm(k, p["k_scale"])
            q = apply_rope_bshd(q, rope_cos, rope_sin)
            k = apply_rope_bshd(k, rope_cos, rope_sin)
            impl = attn_impl
        if tp > 1:
            y = _tp_attn_mlp(
                mesh, bax,
                lambda q_, k_, v_, mlp_: _concat_mlp(
                    dot_product_attention(q_, k_, v_, impl=impl, kv_len=kv_len),
                    mlp_),
                (q, k, v), mlp, ())
        else:
            attn = dot_product_attention(q, k, v, impl=impl, kv_len=kv_len)

    if tp > 1:
        out = dense(p["linear2"], y)
        return _wsc(x + gate[:, None] * out, mesh, bax, None, None)
    out = dense(p["linear2"], _concat_mlp(attn, mlp))
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
    tp: int = 1,                  # tensor-parallel degree (clean-megatron path;
                                  # requires tp_permute_flux_params'd weights)
    mesh=None,                    # jax.sharding.Mesh, required when tp > 1
) -> jnp.ndarray:
    """Predict the flow velocity for packed image tokens. Returns (B, T_img, out_channels)."""
    n_txt = txt_tokens.shape[1]
    dtype = img_tokens.dtype
    if tp > 1 and mesh is None:
        raise ValueError("tp > 1 requires the mesh")
    if tp > 1 and "_tp_layout" not in params:
        # without the device-major permute the (b,s,tp,chunk) splits read
        # natural [q|k|v] columns as device-major — silently scrambled
        # attention, not an error, hence this trace-time check
        raise ValueError(
            "tp > 1 requires tp_permute_flux_params'd weights (device-major "
            "fused columns); FillPipeline.shard_for_serving applies it")
    bax = _batch_axes(mesh, img_tokens.shape[0]) if tp > 1 else None

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
            txt, img = double_block(bp, cfg, txt, img, m, rope_cos, rope_sin,
                                    attn_impl, kv_len, tp, mesh, bax)
            return (txt, img), None

        def single_body(x, bp):
            x = single_block(bp, cfg, x, dense(bp["mod"], sv), rope_cos, rope_sin,
                             attn_impl, kv_len, tp, mesh, bax)
            return x, None
    else:
        double_xs = (params["double"], mods["double"])
        single_xs = (params["single"], mods["single"])

        def double_body(carry, xs):
            txt, img = carry
            bp, m = xs
            txt, img = double_block(bp, cfg, txt, img, m, rope_cos, rope_sin,
                                    attn_impl, kv_len, tp, mesh, bax)
            return (txt, img), None

        def single_body(x, xs):
            bp, m = xs
            x = single_block(bp, cfg, x, m, rope_cos, rope_sin,
                             attn_impl, kv_len, tp, mesh, bax)
            return x, None

    img = dense(params["img_in"], img_tokens)
    txt = dense(params["txt_in"], txt_tokens.astype(dtype))
    if tp > 1:
        # residual streams enter the blocks replicated over tensor (one
        # gather here; the embedder weights stay column-sharded)
        img = _wsc(img, mesh, bax, None, None)
        txt = _wsc(txt, mesh, bax, None, None)

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
        from textflux_tpu.io.quantize import OUT_AXIS_KEYS

        idx = np.concatenate([per_head, d + per_head,
                              2 * d + np.arange(d + extra_cols)])
        # every quantized-leaf layout keeps the out dim last, so one gather
        # covers them all (w_nf4 packs along the IN dim, absmax4 groups it —
        # their out axes are untouched by packing); lora_b's out columns
        # permute identically, lora_a acts on the in dim and passes through
        out = {}
        for k, v in p.items():
            if k in OUT_AXIS_KEYS:
                out[k] = v[..., idx]
            elif k == "lora_a":
                out[k] = v
            elif k in ("lora_ga", "lora_gb"):
                raise ValueError(
                    "grouped per-module LoRA factors cannot be permuted for "
                    "the fused kernel — fold them first (training.train."
                    "lora_merge / io.lora load-time folding)")
            else:  # never drop silently: a new aux leaf needs a decision here
                raise KeyError(
                    f"unknown dense-leaf key {k!r} in half_permute_flux_params"
                    " — add it to io.quantize.OUT_AXIS_KEYS (out-dim-last) or"
                    " handle it explicitly")
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


def _devmajor_idx(segs, tp: int):
    """Index permutation mapping a fused axis [seg0 | seg1 | ...] to
    device-major layout [seg0_0 | seg1_0 | ... | seg0_1 | seg1_1 | ...]:
    contiguous GSPMD shard d of the permuted axis holds every segment's d-th
    chunk."""
    import numpy as np

    offs = np.concatenate([[0], np.cumsum(segs)[:-1]])
    parts = []
    for dev in range(tp):
        for off, seg in zip(offs, segs):
            c = seg // tp
            parts.append(off + dev * c + np.arange(c))
    return np.concatenate(parts)


def tp_permute_flux_params(params, cfg: FluxConfig, tp: int):
    """Permute the fused projections into device-major layout for the
    tensor-parallel fast path (flux_apply(tp=...)).

    Without this, GSPMD's contiguous out-dim tiling of the fused qkv/linear1
    weights does not align with head-sharded attention, and the compiler
    reshards between the fused matmul and the attention every block (the
    collective-permute storm measured by benchmarks/audit_collectives.py:
    ~3.6 GiB/step at TP-8 full width). Device-major columns make the
    qkv split, head sharding, and the single-stream [attn | mlp] -> linear2
    layout all line up with contiguous shards, leaving only the row-parallel
    projections' all-reduces — the textbook megatron schedule.

    Permutes: img_qkv/txt_qkv out columns (segments d,d,d), linear1 out
    columns (d,d,d,mlp), linear2 IN rows (d,mlp — matching the shard-local
    [attn_d | gelu(mlp)_d] concat the tp block emits). Composes with (apply
    AFTER) half_permute_flux_params: that transform permutes within each
    head's D columns, this one moves whole head-aligned chunks.

    NF4 trees: out-column permutes are layout-safe (packing is along the in
    dim), but linear2's in-row permute cannot move nibble-packed rows —
    quantize AFTER this transform (from_pretrained/shard_for_serving order
    it correctly); a pre-quantized nf4 tree raises."""
    import numpy as np

    d, m, h = cfg.hidden_dim, cfg.mlp_dim, cfg.num_heads
    if any(x % tp for x in (d, m, h)):
        raise ValueError(
            f"hidden={d}, mlp={m}, heads={h} must all be divisible by tp={tp}")
    if "_tp_layout" in params:
        # re-permuting an already device-major tree (e.g. resharding the
        # same pipeline at a different tensor size) would scramble it with
        # no error at apply time
        raise ValueError(
            f"params are already tp-permuted (tp="
            f"{int(np.asarray(params['_tp_layout']))}); reload the "
            f"checkpoint to change the tensor-parallel degree to {tp}")

    def permute_out(p, idx):
        from textflux_tpu.io.quantize import OUT_AXIS_KEYS

        out = {}
        for k, v in p.items():
            if k in OUT_AXIS_KEYS:
                out[k] = v[..., idx]
            elif k == "lora_a":  # acts on the in dim: untouched
                out[k] = v
            elif k in ("lora_ga", "lora_gb"):
                raise ValueError(
                    "grouped per-module LoRA factors cannot be tp-permuted — "
                    "fold them first (training.train.lora_merge / io.lora "
                    "load-time folding)")
            else:
                raise KeyError(
                    f"unknown dense-leaf key {k!r} in tp_permute_flux_params"
                    " — add it to io.quantize.OUT_AXIS_KEYS (out-dim-last) or"
                    " handle it explicitly")
        return out

    def permute_in(p, idx):
        if "w_nf4" in p:
            raise ValueError(
                "cannot tp-permute the in rows of an NF4-packed linear2: "
                "rows are nibble-packed and absmax-blocked. Quantize AFTER "
                "tp_permute_flux_params (from_pretrained(mesh=...) and "
                "shard_for_serving(..., quantize=...) order this correctly).")
        out = dict(p)
        for k in ("w", "w_q", "w_q8a8"):
            if k in out:
                out[k] = out[k][..., idx, :]
        if "lora_a" in out:
            out["lora_a"] = out["lora_a"][..., idx, :]
        return out

    qkv_idx = _devmajor_idx((d, d, d), tp)
    l1_idx = _devmajor_idx((d, d, d, m), tp)
    l2_idx = _devmajor_idx((d, m), tp)

    out = dict(params)
    # layout marker: flux_apply(tp>1) checks for this key at trace time —
    # running the tp fast path on naturally-ordered weights produces silently
    # scrambled q/k/v, not an error, so the missed permute must be caught here
    out["_tp_layout"] = jnp.asarray(tp, jnp.int32)
    dbl = dict(params["double"])
    dbl["img_qkv"] = permute_out(params["double"]["img_qkv"], qkv_idx)
    dbl["txt_qkv"] = permute_out(params["double"]["txt_qkv"], qkv_idx)
    out["double"] = dbl
    sng = dict(params["single"])
    sng["linear1"] = permute_out(params["single"]["linear1"], l1_idx)
    sng["linear2"] = permute_in(params["single"]["linear2"], l2_idx)
    out["single"] = sng
    return out
