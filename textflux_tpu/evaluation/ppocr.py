"""PP-OCRv3-style CTC recognizer in JAX (inference).

Architecture parity with the reference's self-contained recognizer
(/root/reference/eval/ocr_recog/): MobileNetV1Enhance backbone (scale 0.5,
last_conv_stride (1,2), avg pool), SVTR sequence neck (C/8 -> 120-dim 2-block
global-attention encoder with swish MLPs, postnorm), Im2Seq reshape, CTC head.
Config as created by eval/recognizer.py:91-98; char dict semantics
('sos' + chars + ' ', blank index 0) per eval/recognizer.py:222-231.

Everything is NHWC + functional pytrees; torch checkpoints convert via
convert_ppocr_state_dict (weights are distributed separately — the reference
repo itself ships them as missing blobs).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PPOCRConfig:
    n_class: int = 6625          # zh; en = 97
    scale: float = 0.5
    svtr_dims: int = 64
    svtr_depth: int = 2
    svtr_hidden: int = 120
    svtr_heads: int = 8
    svtr_mlp_ratio: float = 2.0
    image_shape: Tuple[int, int, int] = (3, 48, 320)   # C, H, W


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv(p, x, *, stride=(1, 1), groups=1):
    # torch-parity padding: torch pads SYMMETRICALLY by k//2, but XLA's
    # "SAME" on a stride-2 conv over even inputs resolves to (0,1)-style
    # asymmetric pads — every strided stage's windows shift one row/col and
    # recognizer outputs diverge from the reference (measured maxdiff 0.98
    # on conv1 with converted weights)
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _conv_bn(p, x, *, stride=(1, 1), groups=1, act="hard_swish"):
    y = _bn(p["bn"], _conv(p["conv"], x, stride=stride, groups=groups))
    if act == "hard_swish":
        return _hard_swish(y)
    if act == "swish":
        return _swish(y)
    if act is None:
        return y
    raise ValueError(act)


def _se(p, x):
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(_conv(p["conv1"], s) + p["conv1"]["b"])
    s = _hard_sigmoid(_conv(p["conv2"], s) + p["conv2"]["b"])
    return x * s


# ---------------------------------------------------------------------------
# Backbone: MobileNetV1Enhance
# ---------------------------------------------------------------------------

# (filters1, filters2, groups, stride, dw_size, use_se) per block
_BLOCK_SPECS = (
    (32, 64, 32, (1, 1), 3, False),
    (64, 128, 64, (1, 1), 3, False),
    (128, 128, 128, (1, 1), 3, False),
    (128, 256, 128, (2, 1), 3, False),
    (256, 256, 256, (1, 1), 3, False),
    (256, 512, 256, (2, 1), 3, False),
    (512, 512, 512, (1, 1), 5, False),
    (512, 512, 512, (1, 1), 5, False),
    (512, 512, 512, (1, 1), 5, False),
    (512, 512, 512, (1, 1), 5, False),
    (512, 512, 512, (1, 1), 5, False),
    (512, 1024, 512, (2, 1), 5, True),
    (1024, 1024, 1024, (1, 2), 5, True),   # last_conv_stride = (1, 2)
)


def backbone_apply(p, cfg: PPOCRConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H', W', 512*scale) feature map."""
    s = cfg.scale
    x = _conv_bn(p["conv1"], x, stride=(2, 2))
    for i, (f1, f2, g, stride, dw, use_se) in enumerate(_BLOCK_SPECS):
        bp = p["blocks"][i]
        x = _conv_bn(bp["dw"], x, stride=stride, groups=int(g * s))
        if use_se:
            x = _se(bp["se"], x)
        x = _conv_bn(bp["pw"], x)
    # avg pool 2x2 stride 2
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    return x


# ---------------------------------------------------------------------------
# Neck: SVTR sequence encoder
# ---------------------------------------------------------------------------

def _ln(p, x, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _svtr_block(p, x, heads: int):
    """Postnorm transformer block with swish MLP (RecSVTR.Block, prenorm=False)."""
    b, n, c = x.shape
    y = _ln(p["norm1"], x, 1e-5)
    qkv = y @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv.reshape(b, n, 3, heads, c // heads)
                        .transpose(2, 0, 3, 1, 4), 3, axis=0)
    q, k, v = q[0], k[0], v[0]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (c // heads) ** -0.5
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
    x = x + (out @ p["proj"]["w"] + p["proj"]["b"])
    y = _ln(p["norm2"], x, 1e-5)
    h = _swish(y @ p["fc1"]["w"] + p["fc1"]["b"])
    return x + (h @ p["fc2"]["w"] + p["fc2"]["b"])


def neck_apply(p, cfg: PPOCRConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*W, svtr_dims) sequence."""
    skip = x
    z = _conv_bn(p["conv1"], x, act="swish")
    z = _conv_bn(p["conv2"], z, act="swish")
    b, h, w, c = z.shape
    z = z.reshape(b, h * w, c)
    for blk in p["blocks"]:
        z = _svtr_block(blk, z, cfg.svtr_heads)
    z = _ln(p["norm"], z, 1e-6)
    z = z.reshape(b, h, w, c)
    z = _conv_bn(p["conv3"], z, act="swish")
    z = jnp.concatenate([skip, z], axis=-1)
    z = _conv_bn(p["conv4"], z, act="swish")
    z = _conv_bn(p["conv1x1"], z, act="swish")
    b, h, w, c = z.shape
    return z.reshape(b, h * w, c)


def recognizer_apply(params, cfg: PPOCRConfig, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) normalized images -> (B, T, n_class) CTC logits."""
    feats = backbone_apply(params["backbone"], cfg, images)
    seq = neck_apply(params["neck"], cfg, feats)
    return seq @ params["head"]["w"] + params["head"]["b"]


# ---------------------------------------------------------------------------
# Decoding + preprocessing
# ---------------------------------------------------------------------------

def ctc_greedy_decode(logits: np.ndarray, charset: Sequence[str]) -> List[str]:
    """Greedy CTC: argmax, collapse repeats, drop blank (index 0)."""
    ids = np.asarray(logits).argmax(axis=-1)
    texts = []
    for row in ids:
        chars, prev = [], -1
        for t in row:
            if t != prev and t != 0 and t < len(charset):
                chars.append(charset[t])
            prev = t
        texts.append("".join(chars))
    return texts


def load_charset(path: str) -> List[str]:
    """Char dict: index 0 = blank ('sos'), then file lines, then space."""
    with open(path, "rb") as f:
        chars = [line.decode("utf-8").strip("\n").strip("\r\n") for line in f]
    return ["sos"] + chars + [" "]


def _resize_bilinear_align_corners(img: np.ndarray, out_h: int,
                                   out_w: int) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) semantics:
    corner-aligned sampling grid, NO antialias filter. PIL's BILINEAR resize
    antialiases and uses half-pixel centers — every recognizer input pixel
    differed by a few percent from the reference protocol."""
    h, w = img.shape[:2]
    ys = np.linspace(0.0, h - 1.0, out_h) if out_h > 1 else np.zeros(1)
    xs = np.linspace(0.0, w - 1.0, out_w) if out_w > 1 else np.zeros(1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    im = img.astype(np.float32)
    top = im[y0][:, x0] * (1.0 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1.0 - wx) + im[y1][:, x1] * wx
    return top * (1.0 - wy) + bot * wy


def preprocess_crop(crop: np.ndarray, image_shape=(3, 48, 320)) -> np.ndarray:
    """uint8 (H, W, 3) crop -> normalized, ratio-preserving, right-padded
    (1, 48, 320, 3) float32 (eval_dgocr.py pre_process semantics, NHWC:
    align_corners bilinear resize, zero right-padding)."""
    _, img_h, img_w = image_shape
    h, w = crop.shape[:2]
    resized_w = min(int(math.ceil(img_h * w / h)), img_w)
    resized = _resize_bilinear_align_corners(crop, img_h, max(resized_w, 1))
    resized = (resized / 255.0 - 0.5) / 0.5
    out = np.zeros((img_h, img_w, 3), np.float32)
    out[:, :resized.shape[1]] = resized
    return out[None]


# ---------------------------------------------------------------------------
# Params: init + torch checkpoint conversion
# ---------------------------------------------------------------------------

def _conv_bn_init(key, k, c_in, c_out):
    return {
        "conv": {"w": jax.random.normal(key, (k, k, c_in, c_out)) * 0.05},
        "bn": {"scale": jnp.ones((c_out,)), "bias": jnp.zeros((c_out,)),
               "mean": jnp.zeros((c_out,)), "var": jnp.ones((c_out,))},
    }


def _dw_conv_bn_init(key, k, c, groups):
    p = _conv_bn_init(key, k, c // groups, c)
    return p


def init_ppocr_params(key: jax.Array, cfg: PPOCRConfig):
    s = cfg.scale
    keys = iter(jax.random.split(key, 64))
    blocks = []
    c_in = int(32 * s)
    for f1, f2, g, stride, dw, use_se in _BLOCK_SPECS:
        gp = int(g * s)
        bp = {
            "dw": _dw_conv_bn_init(next(keys), dw, int(f1 * s), gp),
            "pw": _conv_bn_init(next(keys), 1, int(f1 * s), int(f2 * s)),
        }
        if use_se:
            c = int(f1 * s)
            bp["se"] = {
                "conv1": {"w": jax.random.normal(next(keys), (1, 1, c, c // 4)) * 0.05,
                          "b": jnp.zeros((c // 4,))},
                "conv2": {"w": jax.random.normal(next(keys), (1, 1, c // 4, c)) * 0.05,
                          "b": jnp.zeros((c,))},
            }
        blocks.append(bp)
        c_in = int(f2 * s)
    backbone = {"conv1": _conv_bn_init(next(keys), 3, 3, int(32 * s)), "blocks": blocks}

    c = int(1024 * s)
    hd = cfg.svtr_hidden

    def lin(key, i, o):
        return {"w": jax.random.normal(key, (i, o)) * 0.02, "b": jnp.zeros((o,))}

    def ln(dim):
        return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}

    svtr_blocks = [
        {
            "norm1": ln(hd), "qkv": lin(next(keys), hd, 3 * hd),
            "proj": lin(next(keys), hd, hd),
            "norm2": ln(hd), "fc1": lin(next(keys), hd, int(hd * cfg.svtr_mlp_ratio)),
            "fc2": lin(next(keys), int(hd * cfg.svtr_mlp_ratio), hd),
        }
        for _ in range(cfg.svtr_depth)
    ]
    neck = {
        "conv1": _conv_bn_init(next(keys), 3, c, c // 8),
        "conv2": _conv_bn_init(next(keys), 1, c // 8, hd),
        "blocks": svtr_blocks,
        "norm": ln(hd),
        "conv3": _conv_bn_init(next(keys), 1, hd, c),
        "conv4": _conv_bn_init(next(keys), 3, 2 * c, c // 8),
        "conv1x1": _conv_bn_init(next(keys), 1, c // 8, cfg.svtr_dims),
    }
    head = lin(next(keys), cfg.svtr_dims, cfg.n_class)
    return {"backbone": backbone, "neck": neck, "head": head}


def convert_ppocr_state_dict(sd, cfg: PPOCRConfig):
    """Map the reference RecModel torch state dict onto our pytree."""

    def conv_w(name, groups=1):
        w = np.asarray(sd[f"{name}.weight"])  # (O, I/g, kh, kw)
        return {"w": w.transpose(2, 3, 1, 0)}

    def bn(name):
        return {"scale": np.asarray(sd[f"{name}.weight"]),
                "bias": np.asarray(sd[f"{name}.bias"]),
                "mean": np.asarray(sd[f"{name}.running_mean"]),
                "var": np.asarray(sd[f"{name}.running_var"])}

    def conv_bn(conv_name, bn_name):
        return {"conv": conv_w(conv_name), "bn": bn(bn_name)}

    blocks = []
    for i, (f1, f2, g, stride, dw, use_se) in enumerate(_BLOCK_SPECS):
        pre = f"backbone.block_list.{i}"
        bp = {
            "dw": conv_bn(f"{pre}._depthwise_conv._conv", f"{pre}._depthwise_conv._batch_norm"),
            "pw": conv_bn(f"{pre}._pointwise_conv._conv", f"{pre}._pointwise_conv._batch_norm"),
        }
        if use_se:
            bp["se"] = {
                "conv1": {"w": np.asarray(sd[f"{pre}._se.conv1.weight"]).transpose(2, 3, 1, 0),
                          "b": np.asarray(sd[f"{pre}._se.conv1.bias"])},
                "conv2": {"w": np.asarray(sd[f"{pre}._se.conv2.weight"]).transpose(2, 3, 1, 0),
                          "b": np.asarray(sd[f"{pre}._se.conv2.bias"])},
            }
        blocks.append(bp)
    backbone = {
        "conv1": conv_bn("backbone.conv1._conv", "backbone.conv1._batch_norm"),
        "blocks": blocks,
    }

    def lin(name):
        return {"w": np.asarray(sd[f"{name}.weight"]).T, "b": np.asarray(sd[f"{name}.bias"])}

    def lnp(name):
        return {"scale": np.asarray(sd[f"{name}.weight"]), "bias": np.asarray(sd[f"{name}.bias"])}

    ne = "neck.encoder"
    svtr_blocks = []
    for i in range(cfg.svtr_depth):
        pre = f"{ne}.svtr_block.{i}"
        svtr_blocks.append({
            "norm1": lnp(f"{pre}.norm1"),
            "qkv": lin(f"{pre}.mixer.qkv"),
            "proj": lin(f"{pre}.mixer.proj"),
            "norm2": lnp(f"{pre}.norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
        })
    neck = {
        "conv1": conv_bn(f"{ne}.conv1.conv", f"{ne}.conv1.norm"),
        "conv2": conv_bn(f"{ne}.conv2.conv", f"{ne}.conv2.norm"),
        "blocks": svtr_blocks,
        "norm": lnp(f"{ne}.norm"),
        "conv3": conv_bn(f"{ne}.conv3.conv", f"{ne}.conv3.norm"),
        "conv4": conv_bn(f"{ne}.conv4.conv", f"{ne}.conv4.norm"),
        "conv1x1": conv_bn(f"{ne}.conv1x1.conv", f"{ne}.conv1x1.norm"),
    }
    head = lin("head.fc")
    params = {"backbone": backbone, "neck": neck, "head": head}
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), params)


class PPOCRRecognizer:
    """crop -> text callable (the eval_ocr CLI recognizer protocol)."""

    def __init__(self, params, cfg: PPOCRConfig, charset: Sequence[str]):
        self.params = params
        self.cfg = cfg
        self.charset = list(charset)
        self._apply = jax.jit(lambda p, x: recognizer_apply(p, cfg, x))

    @classmethod
    def from_torch_checkpoint(cls, ckpt_path: str, char_dict_path: str,
                              lang: str = "ch") -> "PPOCRRecognizer":
        import torch

        cfg = PPOCRConfig(n_class=6625 if lang == "ch" else 97)
        sd = torch.load(ckpt_path, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        return cls(convert_ppocr_state_dict(sd, cfg), cfg, load_charset(char_dict_path))

    def __call__(self, crop: np.ndarray) -> str:
        x = jnp.asarray(preprocess_crop(crop, self.cfg.image_shape))
        logits = np.asarray(self._apply(self.params, x))
        return ctc_greedy_decode(logits, self.charset)[0]


# ---------------------------------------------------------------------------
# Module-level entry point for `eval_ocr --recognizer ...ppocr:recognize`
# ---------------------------------------------------------------------------

_DEFAULT_RECOGNIZER: Optional[PPOCRRecognizer] = None


def recognize(crop: np.ndarray) -> str:
    """crop -> text, lazily building a PPOCRRecognizer on first call.

    This is the entry point `scripts/eval_ocr.sh` points the eval_ocr CLI at
    (`--recognizer textflux_tpu.evaluation.ppocr:recognize`). The torch
    checkpoint + char dict are located via environment variables, because the
    reference repo ships the PP-OCRv3 weights as missing blobs
    (/root/reference/.MISSING_LARGE_BLOBS:1-2) and they must be provisioned
    locally:

      PPOCR_CKPT  path to the torch .pth state dict (RecModel layout,
                  eval/ocr_recog/RecModel.py)  [default: ./eval/ocr_weights/ppv3_rec.pth]
      PPOCR_DICT  char-dict txt                 [default: ./eval/ocr_weights/ppocr_keys_v1.txt]
      PPOCR_LANG  'ch' or 'en'                  [default: ch]
    """
    global _DEFAULT_RECOGNIZER
    if _DEFAULT_RECOGNIZER is None:
        import os

        ckpt = os.environ.get("PPOCR_CKPT", "./eval/ocr_weights/ppv3_rec.pth")
        cdict = os.environ.get("PPOCR_DICT", "./eval/ocr_weights/ppocr_keys_v1.txt")
        lang = os.environ.get("PPOCR_LANG", "ch")
        missing = [p for p in (ckpt, cdict) if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                "PP-OCRv3 recognizer weights not found: "
                + ", ".join(missing)
                + ". Set PPOCR_CKPT / PPOCR_DICT (the reference distributes "
                "these separately; see .MISSING_LARGE_BLOBS), or pass a "
                "different --recognizer entry point to eval_ocr."
            )
        _DEFAULT_RECOGNIZER = PPOCRRecognizer.from_torch_checkpoint(
            ckpt, cdict, lang=lang)
    return _DEFAULT_RECOGNIZER(crop)
