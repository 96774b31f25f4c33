"""FLUX KL autoencoder (16 latent channels, 8x spatial) in NHWC.

Functional re-design of the reference AutoencoderKL
(/root/reference/diffusers/.../models/autoencoders/autoencoder_kl.py:38 and
vae.py Encoder/Decoder): conv stacks run as lax.conv_general_dilated in the
TPU-native NHWC/HWIO layout, GroupNorm in float32, the mid-block spatial
attention as one fused single-head attention. FLUX's VAE has no quant convs.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from textflux_tpu.config import VAEConfig
from textflux_tpu.models.layers import dense, dense_init, silu


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def conv_init(key: jax.Array, k: int, c_in: int, c_out: int):
    scale = 1.0 / math.sqrt(c_in * k * k)
    return {
        "w": jax.random.uniform(key, (k, k, c_in, c_out), jnp.float32, -scale, scale),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def conv(p, x: jnp.ndarray, *, stride: int = 1, padding="SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def group_norm_init(c: int):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def group_norm(p, x: jnp.ndarray, groups: int, eps: float = 1e-6) -> jnp.ndarray:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _resnet_init(key: jax.Array, c_in: int, c_out: int):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": group_norm_init(c_in),
        "conv1": conv_init(k1, 3, c_in, c_out),
        "norm2": group_norm_init(c_out),
        "conv2": conv_init(k2, 3, c_out, c_out),
    }
    if c_in != c_out:
        p["skip"] = conv_init(k3, 1, c_in, c_out)
    return p


def _resnet(p, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = conv(p["conv1"], silu(group_norm(p["norm1"], x, groups)))
    h = conv(p["conv2"], silu(group_norm(p["norm2"], h, groups)))
    skip = conv(p["skip"], x) if "skip" in p else x
    return skip + h


def _attn_init(key: jax.Array, c: int):
    ks = jax.random.split(key, 4)
    return {
        "norm": group_norm_init(c),
        "q": dense_init(ks[0], c, c),
        "k": dense_init(ks[1], c, c),
        "v": dense_init(ks[2], c, c),
        "out": dense_init(ks[3], c, c),
    }


def _attn(p, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    y = group_norm(p["norm"], x, groups).reshape(b, h * w, c)
    q, k, v = dense(p["q"], y), dense(p["k"], y), dense(p["v"], y)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / math.sqrt(c), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    return x + dense(p["out"], o).reshape(b, h, w, c)


def _mid_init(key: jax.Array, c: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"res1": _resnet_init(k1, c, c), "attn": _attn_init(k2, c), "res2": _resnet_init(k3, c, c)}


def _mid(p, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    x = _resnet(p["res1"], x, groups)
    x = _attn(p["attn"], x, groups)
    return _resnet(p["res2"], x, groups)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def init_vae_params(key: jax.Array, cfg: VAEConfig):
    chans = cfg.block_out_channels
    keys = iter(jax.random.split(key, 64))

    enc_down = []
    c_prev = chans[0]
    for i, c in enumerate(chans):
        resnets = []
        for j in range(cfg.layers_per_block):
            resnets.append(_resnet_init(next(keys), c_prev if j == 0 else c, c))
        block = {"resnets": resnets}
        if i < len(chans) - 1:
            block["down"] = conv_init(next(keys), 3, c, c)
        enc_down.append(block)
        c_prev = c

    encoder = {
        "conv_in": conv_init(next(keys), 3, cfg.in_channels, chans[0]),
        "down": enc_down,
        "mid": _mid_init(next(keys), chans[-1]),
        "norm_out": group_norm_init(chans[-1]),
        "conv_out": conv_init(next(keys), 3, chans[-1], 2 * cfg.latent_channels),
    }

    dec_up = []
    rev = list(reversed(chans))
    c_prev = rev[0]
    for i, c in enumerate(rev):
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_resnet_init(next(keys), c_prev if j == 0 else c, c))
        block = {"resnets": resnets}
        if i < len(rev) - 1:
            block["up"] = conv_init(next(keys), 3, c, c)
        dec_up.append(block)
        c_prev = c

    decoder = {
        "conv_in": conv_init(next(keys), 3, cfg.latent_channels, rev[0]),
        "mid": _mid_init(next(keys), rev[0]),
        "up": dec_up,
        "norm_out": group_norm_init(rev[-1]),
        "conv_out": conv_init(next(keys), 3, rev[-1], cfg.out_channels),
    }
    return {"encoder": encoder, "decoder": decoder}


def vae_encode_moments(params, cfg: VAEConfig, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode NHWC images in [-1, 1] to posterior (mean, logvar), each (B,h,w,C)."""
    g = cfg.norm_num_groups
    p = params["encoder"]
    x = conv(p["conv_in"], images)
    for i, block in enumerate(p["down"]):
        for r in block["resnets"]:
            x = _resnet(r, x, g)
        if "down" in block:
            # asymmetric (0,1),(0,1) pad + stride-2 VALID conv (diffusers Downsample2D)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv(block["down"], x, stride=2, padding="VALID")
    x = _mid(p["mid"], x, g)
    x = conv(p["conv_out"], silu(group_norm(p["norm_out"], x, g)))
    mean, logvar = jnp.split(x, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar


def vae_encode(
    params, cfg: VAEConfig, images: jnp.ndarray,
    key: Optional[jax.Array] = None, *, scale: bool = True,
) -> jnp.ndarray:
    """Encode to latents: posterior sample (if key given) or mode, then
    (z - shift_factor) * scaling_factor when scale=True."""
    mean, logvar = vae_encode_moments(params, cfg, images)
    z = mean
    if key is not None:
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        z = mean + (std * jax.random.normal(key, mean.shape, jnp.float32)).astype(mean.dtype)
    if scale:
        z = (z - cfg.shift_factor) * cfg.scaling_factor
    return z


def vae_encode_tiled(
    params, cfg: VAEConfig, images: jnp.ndarray,
    key: Optional[jax.Array] = None, *,
    tile: int = 64, overlap: int = 16, scale: bool = True,
) -> jnp.ndarray:
    """Tiled encode for large canvases (bounds the mid-block attention cost,
    which is quadratic in latent area): encode overlapping pixel tiles and
    blend the latent seams. `tile`/`overlap` are in latent units."""
    f = cfg.spatial_factor
    b, hp, wp, _ = images.shape
    h, w = hp // f, wp // f
    if h <= tile and w <= tile:
        return vae_encode(params, cfg, images, key=key, scale=scale)
    stride = tile - overlap
    out = jnp.zeros((b, h, w, cfg.latent_channels), jnp.float32)
    weight = jnp.zeros((h, w, 1), jnp.float32)

    # +1: the ramp must stay strictly positive at the tile ends — a 0 end
    # weight zeroed the canvas border rows/cols (sole-covering tile x weight
    # 0 -> output 0). Normalization by the weight sum makes single-cover
    # regions exact for ANY positive weight; overlaps blend linearly.
    ramp = jnp.minimum((jnp.arange(tile, dtype=jnp.float32) + 1.0) / overlap, 1.0)
    win1d = jnp.minimum(ramp, ramp[::-1])
    win = jnp.minimum(win1d[:, None], win1d[None, :])[..., None]

    ys = list(range(0, max(h - tile, 0) + 1, stride)) or [0]
    xs = list(range(0, max(w - tile, 0) + 1, stride)) or [0]
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            ty, tx = min(tile, h), min(tile, w)
            pix = jax.lax.dynamic_slice(
                images, (0, y * f, x * f, 0), (b, ty * f, tx * f, images.shape[-1]))
            # per-tile posterior keys: one key for every tile would repeat
            # the same noise field with the tile stride
            tkey = None if key is None else jax.random.fold_in(
                key, i * len(xs) + j)
            z = vae_encode(params, cfg, pix, key=tkey, scale=scale).astype(jnp.float32)
            tile_win = win[:ty, :tx]
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (0, y, x, 0), (b, ty, tx, cfg.latent_channels))
                + z * tile_win, (0, y, x, 0))
            weight = jax.lax.dynamic_update_slice(
                weight, jax.lax.dynamic_slice(weight, (y, x, 0), (ty, tx, 1)) + tile_win,
                (y, x, 0))
    return (out / jnp.maximum(weight, 1e-6)).astype(images.dtype)


def vae_decode_tiled(
    params, cfg: VAEConfig, latents: jnp.ndarray, *,
    tile: int = 64, overlap: int = 16, scale: bool = True,
) -> jnp.ndarray:
    """Tiled decode for large canvases (reference: enable_vae_tiling,
    pipeline_flux_fill.py:1767-1794): decode overlapping latent tiles and
    linearly blend the seams. Bounds decoder activation memory at ~tile^2."""
    b, h, w, c = latents.shape
    if h <= tile and w <= tile:
        return vae_decode(params, cfg, latents, scale=scale)
    f = cfg.spatial_factor
    stride = tile - overlap
    out = jnp.zeros((b, h * f, w * f, cfg.out_channels), jnp.float32)
    weight = jnp.zeros((h * f, w * f, 1), jnp.float32)

    # +1 keeps the end weights positive — see vae_encode_tiled
    ramp = jnp.minimum((jnp.arange(tile * f, dtype=jnp.float32) + 1.0)
                       / (overlap * f), 1.0)
    win1d = jnp.minimum(ramp, ramp[::-1])
    win = jnp.minimum(win1d[:, None], win1d[None, :])[..., None]

    ys = list(range(0, max(h - tile, 0) + 1, stride)) or [0]
    xs = list(range(0, max(w - tile, 0) + 1, stride)) or [0]
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    for y in ys:
        for x in xs:
            tile_lat = jax.lax.dynamic_slice(
                latents, (0, y, x, 0), (b, min(tile, h), min(tile, w), c))
            dec = vae_decode(params, cfg, tile_lat, scale=scale).astype(jnp.float32)
            wy, wx = dec.shape[1], dec.shape[2]
            tile_win = win[:wy, :wx]
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (0, y * f, x * f, 0),
                                           (b, wy, wx, cfg.out_channels))
                + dec * tile_win,
                (0, y * f, x * f, 0))
            weight = jax.lax.dynamic_update_slice(
                weight, jax.lax.dynamic_slice(weight, (y * f, x * f, 0), (wy, wx, 1))
                + tile_win,
                (y * f, x * f, 0))
    return (out / jnp.maximum(weight, 1e-6)).astype(latents.dtype)


def vae_decode(params, cfg: VAEConfig, latents: jnp.ndarray, *, scale: bool = True) -> jnp.ndarray:
    """Decode (scaled) latents to NHWC images in [-1, 1]."""
    g = cfg.norm_num_groups
    if scale:
        latents = latents / cfg.scaling_factor + cfg.shift_factor
    p = params["decoder"]
    x = conv(p["conv_in"], latents)
    x = _mid(p["mid"], x, g)
    for i, block in enumerate(p["up"]):
        for r in block["resnets"]:
            x = _resnet(r, x, g)
        if "up" in block:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = conv(block["up"], x)
    x = conv(p["conv_out"], silu(group_norm(p["norm_out"], x, g)))
    return x
