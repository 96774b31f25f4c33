"""LPIPS (AlexNet backbone) in JAX.

Architecture parity with the `lpips` package the reference uses
(eval/eval_fid_lpips.py:115-184): 5 AlexNet conv stages, per-channel unit
normalization, squared feature differences, learned non-negative 1x1 heads,
spatial mean, sum over stages. Weights load from a torch `lpips.LPIPS(net=
'alex')` state dict via convert_lpips_state_dict (no weights ship offline).
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet features: (out_ch, kernel, stride, padding); M = maxpool 3x3 s2
_ALEX = [
    (64, 11, 4, 2), "M",
    (192, 5, 1, 2), "M",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# indices (into conv list) after which LPIPS taps features: relu1..relu5
_N_STAGES = 5

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def alexnet_features(p, x: jnp.ndarray) -> List[jnp.ndarray]:
    """NHWC input in [-1, 1] -> list of 5 post-relu feature maps."""
    feats = []
    conv_idx = 0
    for spec in _ALEX:
        if spec == "M":
            x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                       (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
            continue
        out_ch, k, stride, pad = spec
        w = p["convs"][conv_idx]["w"]
        b = p["convs"][conv_idx]["b"]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jax.nn.relu(x)
        feats.append(x)
        conv_idx += 1
    return feats


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between NHWC images in [-1, 1]. Returns (B,)."""
    a = (a - _SHIFT) / _SCALE
    b = (b - _SHIFT) / _SCALE
    fa = alexnet_features(params["net"], a)
    fb = alexnet_features(params["net"], b)
    total = 0.0
    for i in range(_N_STAGES):
        diff = jnp.square(_unit_normalize(fa[i]) - _unit_normalize(fb[i]))
        head = params["lins"][i]["w"]  # (1, 1, C, 1)
        val = jax.lax.conv_general_dilated(
            diff, head, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


def init_lpips_params(key: jax.Array):
    keys = iter(jax.random.split(key, 16))
    convs, c_in = [], 3
    for spec in _ALEX:
        if spec == "M":
            continue
        out_ch, k, _, _ = spec
        convs.append({
            "w": jax.random.normal(next(keys), (k, k, c_in, out_ch)) * 0.02,
            "b": jnp.zeros((out_ch,)),
        })
        c_in = out_ch
    lins = [{"w": jax.nn.relu(jax.random.normal(next(keys), (1, 1, c, 1)))}
            for c in (64, 192, 384, 256, 256)]
    return {"net": {"convs": convs}, "lins": lins}


def convert_lpips_state_dict(sd) -> dict:
    """Map a torch lpips.LPIPS(net='alex') state dict onto our pytree.

    torch names: net.slice{1..5}.{idx}.weight/bias (features convs) and
    lin{0..4}.model.1.weight (1x1 heads).
    """
    conv_keys = sorted(
        (k for k in sd if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])))
    convs = []
    for k in conv_keys:
        w = np.asarray(sd[k])
        convs.append({
            "w": w.transpose(2, 3, 1, 0),
            "b": np.asarray(sd[k.replace(".weight", ".bias")]),
        })
    lins = []
    for i in range(_N_STAGES):
        key = f"lin{i}.model.1.weight" if f"lin{i}.model.1.weight" in sd else f"lins.{i}.model.1.weight"
        w = np.asarray(sd[key])  # (1, C, 1, 1)
        lins.append({"w": w.transpose(2, 3, 1, 0)})
    params = {"net": {"convs": convs}, "lins": lins}
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), params)
