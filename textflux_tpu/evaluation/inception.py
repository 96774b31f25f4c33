"""InceptionV3 pool3 feature extractor for FID, in JAX.

Architecture parity with `pytorch_fid`'s FIDInceptionV3 — the torchvision
inception_v3 graph with the FID modifications (the reference shells out to
`python -m pytorch_fid`, /root/reference/eval/eval_fid_lpips.py:75-102):

  - Mixed_5b/5c/5d (InceptionA), Mixed_6b..6e (InceptionC) and Mixed_7b
    (InceptionE_1) use avg-pooling that EXCLUDES padding from the divisor
    (torch count_include_pad=False);
  - Mixed_7c (InceptionE_2) uses a 3x3/1 MAX pool in its pool branch.

Weights load from a torch state dict (torchvision inception_v3 or
pytorch_fid's FIDInceptionV3 — identical key names) via
``convert_inception_state_dict``; each conv's BatchNorm (eps=1e-3) is folded
into the conv weight/bias at conversion, which is exact in inference mode.

Input protocol: NHWC float in [-1, 1] (the harness's loading convention),
any spatial size — resized to 299x299 with bilinear/half-pixel, no antialias,
mirroring pytorch_fid's F.interpolate(align_corners=False). Output: (N, 2048)
pool3 features.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# (kh, kw, c_in, c_out, stride) per conv module, torchvision names.
# Padding is derived from the kernel: stride-1 convs are SAME-style with
# explicit (k//2) pads per axis; stride-2 convs are VALID, as in torchvision.
_STEM = [
    ("Conv2d_1a_3x3", 3, 3, 3, 32, 2),
    ("Conv2d_2a_3x3", 3, 3, 32, 32, 1, "valid"),
    ("Conv2d_2b_3x3", 3, 3, 32, 64, 1),
    # maxpool1 3x3/2
    ("Conv2d_3b_1x1", 1, 1, 64, 80, 1),
    ("Conv2d_4a_3x3", 3, 3, 80, 192, 1, "valid"),
    # maxpool2 3x3/2
]


def _a_spec(c_in, pool_features):
    return [
        ("branch1x1", 1, 1, c_in, 64, 1),
        ("branch5x5_1", 1, 1, c_in, 48, 1),
        ("branch5x5_2", 5, 5, 48, 64, 1),
        ("branch3x3dbl_1", 1, 1, c_in, 64, 1),
        ("branch3x3dbl_2", 3, 3, 64, 96, 1),
        ("branch3x3dbl_3", 3, 3, 96, 96, 1),
        ("branch_pool", 1, 1, c_in, pool_features, 1),
    ]


def _b_spec(c_in):
    return [
        ("branch3x3", 3, 3, c_in, 384, 2),
        ("branch3x3dbl_1", 1, 1, c_in, 64, 1),
        ("branch3x3dbl_2", 3, 3, 64, 96, 1),
        ("branch3x3dbl_3", 3, 3, 96, 96, 2),
    ]


def _c_spec(c_in, c7):
    return [
        ("branch1x1", 1, 1, c_in, 192, 1),
        ("branch7x7_1", 1, 1, c_in, c7, 1),
        ("branch7x7_2", 1, 7, c7, c7, 1),
        ("branch7x7_3", 7, 1, c7, 192, 1),
        ("branch7x7dbl_1", 1, 1, c_in, c7, 1),
        ("branch7x7dbl_2", 7, 1, c7, c7, 1),
        ("branch7x7dbl_3", 1, 7, c7, c7, 1),
        ("branch7x7dbl_4", 7, 1, c7, c7, 1),
        ("branch7x7dbl_5", 1, 7, c7, 192, 1),
        ("branch_pool", 1, 1, c_in, 192, 1),
    ]


def _d_spec(c_in):
    return [
        ("branch3x3_1", 1, 1, c_in, 192, 1),
        ("branch3x3_2", 3, 3, 192, 320, 2),
        ("branch7x7x3_1", 1, 1, c_in, 192, 1),
        ("branch7x7x3_2", 1, 7, 192, 192, 1),
        ("branch7x7x3_3", 7, 1, 192, 192, 1),
        ("branch7x7x3_4", 3, 3, 192, 192, 2),
    ]


def _e_spec(c_in):
    return [
        ("branch1x1", 1, 1, c_in, 320, 1),
        ("branch3x3_1", 1, 1, c_in, 384, 1),
        ("branch3x3_2a", 1, 3, 384, 384, 1),
        ("branch3x3_2b", 3, 1, 384, 384, 1),
        ("branch3x3dbl_1", 1, 1, c_in, 448, 1),
        ("branch3x3dbl_2", 3, 3, 448, 384, 1),
        ("branch3x3dbl_3a", 1, 3, 384, 384, 1),
        ("branch3x3dbl_3b", 3, 1, 384, 384, 1),
        ("branch_pool", 1, 1, c_in, 192, 1),
    ]


_BLOCKS = [
    ("Mixed_5b", "A", _a_spec(192, 32)),
    ("Mixed_5c", "A", _a_spec(256, 64)),
    ("Mixed_5d", "A", _a_spec(288, 64)),
    ("Mixed_6a", "B", _b_spec(288)),
    ("Mixed_6b", "C", _c_spec(768, 128)),
    ("Mixed_6c", "C", _c_spec(768, 160)),
    ("Mixed_6d", "C", _c_spec(768, 160)),
    ("Mixed_6e", "C", _c_spec(768, 192)),
    ("Mixed_7a", "D", _d_spec(768)),
    ("Mixed_7b", "E1", _e_spec(1280)),
    ("Mixed_7c", "E2", _e_spec(2048)),
]


def _conv(p, x, spec):
    _, kh, kw, _, _, stride = spec[:6]
    if stride == 2 or (len(spec) > 6 and spec[6] == "valid"):
        padding = [(0, 0), (0, 0)]
    else:
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["b"].astype(x.dtype))


def _max_pool(x, stride):
    pad = [(0, 0)] * 4 if stride == 2 else [(0, 0), (1, 1), (1, 1), (0, 0)]
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, stride, stride, 1), pad)


def _avg_pool_3x3(x):
    """3x3/1 average pool, padding excluded from the divisor
    (torch avg_pool2d(count_include_pad=False) — the FID modification)."""
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad)
    return s / cnt


def _apply_block(p, x, kind, spec):
    conv = {s[0]: (lambda name=s[0], sp=s: _conv(p[name], x, sp)) for s in spec}
    by = {s[0]: s for s in spec}

    def chain(start, *names):
        y = start
        for n in names:
            y = _conv(p[n], y, by[n])
        return y

    if kind == "A":
        return jnp.concatenate([
            conv["branch1x1"](),
            chain(x, "branch5x5_1", "branch5x5_2"),
            chain(x, "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"),
            _conv(p["branch_pool"], _avg_pool_3x3(x), by["branch_pool"]),
        ], axis=-1)
    if kind == "B":
        return jnp.concatenate([
            conv["branch3x3"](),
            chain(x, "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"),
            _max_pool(x, 2),
        ], axis=-1)
    if kind == "C":
        return jnp.concatenate([
            conv["branch1x1"](),
            chain(x, "branch7x7_1", "branch7x7_2", "branch7x7_3"),
            chain(x, "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5"),
            _conv(p["branch_pool"], _avg_pool_3x3(x), by["branch_pool"]),
        ], axis=-1)
    if kind == "D":
        return jnp.concatenate([
            chain(x, "branch3x3_1", "branch3x3_2"),
            chain(x, "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                  "branch7x7x3_4"),
            _max_pool(x, 2),
        ], axis=-1)
    # E1 / E2: split branches; E2 swaps the avg pool for a max pool
    b3 = chain(x, "branch3x3_1")
    b3 = jnp.concatenate([_conv(p["branch3x3_2a"], b3, by["branch3x3_2a"]),
                          _conv(p["branch3x3_2b"], b3, by["branch3x3_2b"])], -1)
    dbl = chain(x, "branch3x3dbl_1", "branch3x3dbl_2")
    dbl = jnp.concatenate([_conv(p["branch3x3dbl_3a"], dbl, by["branch3x3dbl_3a"]),
                           _conv(p["branch3x3dbl_3b"], dbl, by["branch3x3dbl_3b"])], -1)
    pool = _max_pool(x, 1) if kind == "E2" else _avg_pool_3x3(x)
    return jnp.concatenate([
        conv["branch1x1"](), b3, dbl,
        _conv(p["branch_pool"], pool, by["branch_pool"]),
    ], axis=-1)


def inception_pool3_features(params, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC images in [-1, 1] -> (N, 2048) pool3 features."""
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             method="bilinear", antialias=False)
    for spec in _STEM:
        x = _conv(params[spec[0]], x, spec)
        if spec[0] in ("Conv2d_2b_3x3", "Conv2d_4a_3x3"):
            x = _max_pool(x, 2)
    for name, kind, spec in _BLOCKS:
        x = _apply_block(params[name], x, kind, spec)
    return jnp.mean(x, axis=(1, 2))


def make_fid_extractor(params):
    """images (N,H,W,3) in [-1,1] -> (N,2048) np features (fid.py protocol)."""
    fn = jax.jit(lambda x: inception_pool3_features(params, x))

    def extract(images: np.ndarray) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(images, jnp.float32)))

    return extract


def _all_conv_specs():
    for spec in _STEM:
        yield spec[0], spec
    for name, _, specs in _BLOCKS:
        for spec in specs:
            yield f"{name}.{spec[0]}", spec


def init_inception_params(key: jax.Array):
    """Random params with the exact pytree/shape layout (tests, smoke runs)."""
    params: dict = {}
    for path, spec in _all_conv_specs():
        _, kh, kw, cin, cout = spec[:5]
        key, sub = jax.random.split(key)
        leaf = {"w": jax.random.normal(sub, (kh, kw, cin, cout), jnp.float32)
                * (1.0 / np.sqrt(kh * kw * cin)),
                "b": jnp.zeros((cout,), jnp.float32)}
        node = params
        parts = path.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf
    return params


def convert_inception_state_dict(sd) -> dict:
    """torchvision inception_v3 / pytorch_fid FIDInceptionV3 state dict ->
    our pytree, folding each BatchNorm (eps=1e-3) into its conv:
        w' = w * gamma / sqrt(var + eps);  b' = beta - mean * gamma / sqrt(...)
    torch conv weights are (O, I, kh, kw) -> HWIO.
    """
    eps = 1e-3
    params: dict = {}
    for path, spec in _all_conv_specs():
        w = np.asarray(sd[f"{path}.conv.weight"], np.float32)
        gamma = np.asarray(sd[f"{path}.bn.weight"], np.float32)
        beta = np.asarray(sd[f"{path}.bn.bias"], np.float32)
        mean = np.asarray(sd[f"{path}.bn.running_mean"], np.float32)
        var = np.asarray(sd[f"{path}.bn.running_var"], np.float32)
        k = gamma / np.sqrt(var + eps)
        w = w * k[:, None, None, None]
        b = beta - mean * k
        leaf = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
        node = params
        parts = path.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf
    return params


def load_inception_extractor(weights_path: str):
    """Build the FID extractor from a locally provided torch weights file."""
    import torch

    obj = torch.load(weights_path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return make_fid_extractor(convert_inception_state_dict(sd))
