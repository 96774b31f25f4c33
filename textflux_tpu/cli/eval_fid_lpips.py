"""FID / LPIPS harness (parity with /root/reference/eval/eval_fid_lpips.py).

Filename-matched pairing between the ground-truth and generated directories,
FID over a pluggable feature extractor, LPIPS over the JAX AlexNet port with a
locally provided weights file, and a tee-style logger.

Usage:
  python -m textflux_tpu.cli.eval_fid_lpips \
      --gt-dir gt/ --gen-dir out/cropped_images --log-dir eval_log \
      [--inception-weights pt_inception.pth] [--lpips-weights lpips_alex.pt]
      [--fid-extractor pkg.module:callable] [--resize 299]

--inception-weights points at a locally provided torch InceptionV3 state dict
(torchvision inception_v3 or pytorch_fid's FIDInceptionV3 file) and enables
strict-parity FID via the JAX port in evaluation/inception.py;
--fid-extractor remains the escape hatch for any custom feature extractor.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


class TeeLogger:
    """Print to stdout and append to a log file (eval_fid_lpips.py:15-37)."""

    def __init__(self, log_path: Optional[str]):
        self.log_path = log_path
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)

    def __call__(self, msg: str) -> None:
        print(msg, flush=True)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(msg + "\n")


def matched_pairs(gt_dir: str, gen_dir: str) -> List[Tuple[str, str]]:
    """Pairs of (gt, gen) paths whose filenames match in both directories."""
    exts = (".png", ".jpg", ".jpeg")
    gt = {f for f in os.listdir(gt_dir) if f.lower().endswith(exts)}
    gen = {f for f in os.listdir(gen_dir) if f.lower().endswith(exts)}
    names = sorted(gt & gen)
    return [(os.path.join(gt_dir, n), os.path.join(gen_dir, n)) for n in names]


def _load(path: str, size: Optional[int] = None) -> np.ndarray:
    """[-1, 1] float HWC. An optional square resize uses the SAME bilinear
    (half-pixel centers, NO antialias) the inception wrapper applies
    in-network, so pre-resizing for batching is numerically identical to
    feeding native-resolution images to pytorch_fid. (PIL's antialiased
    BILINEAR was not, and silently broke FID comparability.)"""
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    if size and arr.shape[:2] != (size, size):
        import jax

        arr = np.asarray(jax.image.resize(
            arr, (size, size, 3), method="bilinear", antialias=False))
    return arr


def compute_lpips(pairs, lpips_params, batch: int = 8,
                  size: Optional[int] = None) -> float:
    """LPIPS at NATIVE resolution by default — the reference protocol
    (eval/eval_fid_lpips.py loads images without resizing; AlexNet LPIPS is
    strongly scale-dependent). Pairs are grouped by shape for batching."""
    from collections import defaultdict

    import jax.numpy as jnp

    from textflux_tpu.evaluation.lpips import lpips_distance

    # group by PIL header size only (lazy): decoding every pair up front
    # would hold the whole eval set in host memory before the first batch
    groups = defaultdict(list)
    for g, f in pairs:
        if size:
            key = (size, size)
        else:
            sa, sb = Image.open(g).size, Image.open(f).size
            if sa != sb:
                raise ValueError(f"pair size mismatch: {g} {sa} vs {f} {sb}")
            key = sa
        groups[key].append((g, f))
    vals = []
    for items in groups.values():
        for i in range(0, len(items), batch):
            chunk = items[i:i + batch]
            a = jnp.asarray(np.stack([_load(g, size) for g, _ in chunk]))
            b = jnp.asarray(np.stack([_load(f, size) for _, f in chunk]))
            vals.extend(np.asarray(lpips_distance(lpips_params, a, b)).tolist())
    return float(np.mean(vals))


def compute_fid(pairs, extractor, size: int = 299) -> float:
    from textflux_tpu.evaluation.fid import fid_from_images

    real = (_load(g, size) for g, _ in pairs)
    fake = (_load(f, size) for _, f in pairs)
    return fid_from_images(real, fake, extractor)


def main(argv=None):
    p = argparse.ArgumentParser(description="textflux-tpu FID/LPIPS harness")
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--inception-weights", default=None,
                   help="torch InceptionV3 state dict (.pth) for strict FID")
    p.add_argument("--fid-extractor", default=None,
                   help="module:callable mapping (N,H,W,3) [-1,1] -> (N,D) features")
    p.add_argument("--lpips-weights", default=None,
                   help="torch lpips.LPIPS(net='alex') state dict (.pt)")
    p.add_argument("--resize", type=int, default=299,
                   help="FID pre-resize for batching; uses the network's own "
                        "non-antialiased bilinear, so 299 (default) is "
                        "numerically identical to pytorch_fid's in-network "
                        "resize of native images. LPIPS always runs at "
                        "native resolution (the reference protocol).")
    args = p.parse_args(argv)

    log = TeeLogger(os.path.join(args.log_dir, f"eval_{int(time.time())}.log")
                    if args.log_dir else None)
    pairs = matched_pairs(args.gt_dir, args.gen_dir)
    log(f"matched pairs: {len(pairs)}")
    if not pairs:
        sys.exit("no filename-matched pairs between the two directories")

    results = {"pairs": len(pairs)}
    extractor = None
    if args.inception_weights:
        from textflux_tpu.evaluation.inception import load_inception_extractor

        extractor = load_inception_extractor(args.inception_weights)
    elif args.fid_extractor:
        mod, _, attr = args.fid_extractor.partition(":")
        extractor = getattr(importlib.import_module(mod), attr or "extract")
    if extractor is not None:
        results["fid"] = compute_fid(pairs, extractor, args.resize)
        log(f"FID: {results['fid']:.4f}")
    if args.lpips_weights:
        import torch

        from textflux_tpu.evaluation.lpips import convert_lpips_state_dict

        sd = {k: v.numpy() for k, v in torch.load(args.lpips_weights,
                                                  map_location="cpu").items()}
        lpips_params = convert_lpips_state_dict(sd)
        results["lpips"] = compute_lpips(pairs, lpips_params)
        log(f"LPIPS: {results['lpips']:.4f}")
    log(json.dumps(results))


if __name__ == "__main__":
    main()
