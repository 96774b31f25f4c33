"""CLIP-L/14 text encoder — provides the pooled prompt embedding.

Functional NHWC-free transformer: token + learned position embeddings, causal
self-attention (quick-gelu MLPs), final LayerNorm, pooled output at the first
EOS token. Scan-stacked layers.

Role in the pipeline: the reference feeds the *generic* template through CLIP
for `pooled_projections` (/root/reference/diffusers/.../pipeline_flux_fill.py:1633-1648).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from textflux_tpu.config import CLIPTextConfig
from textflux_tpu.models.layers import dense, dense_init, quick_gelu


def _affine_ln(x: jnp.ndarray, p, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _ln_init(d: int):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _layer_init(key: jax.Array, cfg: CLIPTextConfig):
    ks = jax.random.split(key, 6)
    d = cfg.hidden_dim
    return {
        "ln1": _ln_init(d),
        "q": dense_init(ks[0], d, d),
        "k": dense_init(ks[1], d, d),
        "v": dense_init(ks[2], d, d),
        "o": dense_init(ks[3], d, d),
        "ln2": _ln_init(d),
        "fc1": dense_init(ks[4], d, cfg.mlp_dim),
        "fc2": dense_init(ks[5], cfg.mlp_dim, d),
    }


def init_clip_params(key: jax.Array, cfg: CLIPTextConfig):
    k1, k2, *ks = jax.random.split(key, 2 + cfg.num_layers)
    layers = [_layer_init(k, cfg) for k in ks]
    return {
        "token_embedding": jax.random.normal(k1, (cfg.vocab_size, cfg.hidden_dim)) * 0.02,
        "position_embedding": jax.random.normal(k2, (cfg.max_positions, cfg.hidden_dim)) * 0.02,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_ln": _ln_init(cfg.hidden_dim),
    }


def clip_encode(params, cfg: CLIPTextConfig, input_ids: jnp.ndarray, *, dtype=jnp.float32):
    """Returns (last_hidden_state (B,S,D), pooled (B,D))."""
    b, s = input_ids.shape
    h = params["token_embedding"][input_ids].astype(dtype)
    h = h + params["position_embedding"][:s].astype(dtype)

    nh = cfg.num_heads
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))

    def body(h, p):
        y = _affine_ln(h, p["ln1"], cfg.layer_norm_eps)
        q = dense(p["q"], y).reshape(b, s, nh, -1)
        k = dense(p["k"], y).reshape(b, s, nh, -1)
        v = dense(p["v"], y).reshape(b, s, nh, -1)
        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        logits = jnp.where(causal[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + dense(p["o"], attn.reshape(b, s, -1))
        y = _affine_ln(h, p["ln2"], cfg.layer_norm_eps)
        h = h + dense(p["fc2"], quick_gelu(dense(p["fc1"], y)))
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = _affine_ln(h, params["final_ln"], cfg.layer_norm_eps)

    if cfg.eos_token_id == 2:
        # Legacy configs (stock FLUX text_encoder ships eos_token_id=2, the
        # historically wrong value from before transformers PR #24773): the
        # reference pools at argmax(input_ids) — the EOT position, because
        # EOT=49407 is the largest id in the CLIP vocab. Matching the
        # equality branch below would find no id==2 and silently pool the
        # BOS hidden state instead (transformers modeling_clip.py keeps the
        # same special case for exactly this reason).
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
    pooled = h[jnp.arange(b), eos_pos]
    return h, pooled
