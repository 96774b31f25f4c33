"""T5 v1.1 encoder (XXL in production) — provides the sequence prompt embedding.

Pre-norm blocks with RMSNorm, bias-free projections, unscaled attention logits
plus a learned relative-position bias (held by layer 0, shared by all layers —
computed once and passed into the scan), and gated-GELU MLPs. Scan-stacked.

Role in the pipeline: the word-list template goes through T5 for
`encoder_hidden_states` (/root/reference/diffusers/.../pipeline_flux_fill.py:1643).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from textflux_tpu.config import T5Config
from textflux_tpu.models.layers import dense, dense_init, gelu_tanh, rms_norm as _rms


def _layer_init(key: jax.Array, cfg: T5Config):
    ks = jax.random.split(key, 7)
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    return {
        "attn_norm": jnp.ones((d,), jnp.float32),
        "q": dense_init(ks[0], d, inner, bias=False),
        "k": dense_init(ks[1], d, inner, bias=False),
        "v": dense_init(ks[2], d, inner, bias=False),
        "o": dense_init(ks[3], inner, d, bias=False),
        "mlp_norm": jnp.ones((d,), jnp.float32),
        "wi_0": dense_init(ks[4], d, cfg.d_ff, bias=False),
        "wi_1": dense_init(ks[5], d, cfg.d_ff, bias=False),
        "wo": dense_init(ks[6], cfg.d_ff, d, bias=False),
    }


def init_t5_params(key: jax.Array, cfg: T5Config):
    k1, k2, *ks = jax.random.split(key, 2 + cfg.num_layers)
    layers = [_layer_init(k, cfg) for k in ks]
    return {
        "embedding": jax.random.normal(k1, (cfg.vocab_size, cfg.d_model)) * 1.0,
        "rel_bias": jax.random.normal(k2, (cfg.relative_attention_num_buckets, cfg.num_heads)) * 0.02,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
    }


def relative_position_buckets(seq_len: int, num_buckets: int, max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing, (S, S) int32."""
    pos = jnp.arange(seq_len)
    rel = pos[None, :] - pos[:, None]           # memory - query
    nb = num_buckets // 2
    bucket = jnp.where(rel > 0, nb, 0)
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    log_ratio = jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9) / jnp.log(max_distance / max_exact)
    large = max_exact + (log_ratio * (nb - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return bucket + jnp.where(is_small, rel, large)


def t5_encode(
    params, cfg: T5Config, input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None, *, dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns last_hidden_state (B, S, d_model)."""
    b, s = input_ids.shape
    h = params["embedding"][input_ids].astype(dtype)

    buckets = relative_position_buckets(
        s, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    pos_bias = params["rel_bias"].astype(jnp.float32)[buckets]     # (S, S, H)
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]            # (1, H, S, S)
    if attention_mask is not None:
        pos_bias = jnp.where(attention_mask[:, None, None, :].astype(bool), pos_bias, -1e9)

    nh = cfg.num_heads

    def body(h, p):
        y = _rms(h, p["attn_norm"], cfg.layer_norm_eps)
        q = dense(p["q"], y).reshape(b, s, nh, -1)
        k = dense(p["k"], y).reshape(b, s, nh, -1)
        v = dense(p["v"], y).reshape(b, s, nh, -1)
        # T5: no 1/sqrt(d) scaling; additive relative bias
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + pos_bias, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + dense(p["o"], attn.reshape(b, s, -1))
        y = _rms(h, p["mlp_norm"], cfg.layer_norm_eps)
        h = h + dense(p["wo"], gelu_tanh(dense(p["wi_0"], y)) * dense(p["wi_1"], y))
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return _rms(h, params["final_norm"], cfg.layer_norm_eps)
