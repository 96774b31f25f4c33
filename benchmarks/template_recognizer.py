"""Self-contained template-matching recognizer for the synthetic closed-loop
eval (benchmarks/closed_loop.py).

Zero-egress stand-in for a trained OCR model: the synthetic dataset's word
alphabet is known, so recognition is nearest-template by normalized
cross-correlation against renderings produced by the same draw routine as the
dataset's ground truth. Plugs into `cli/eval_ocr.py --recognizer
benchmarks.template_recognizer:recognize` (the same pluggable protocol the
PP-OCRv3 port uses); template dir comes from $TEXTFLUX_TEMPLATE_DIR.
"""
import os

import numpy as np
from PIL import Image

_templates = None


def _load():
    global _templates
    if _templates is None:
        tdir = os.environ["TEXTFLUX_TEMPLATE_DIR"]
        _templates = {}
        for f in sorted(os.listdir(tdir)):
            if f.endswith(".png"):
                word = os.path.splitext(f)[0]
                _templates[word] = _norm(
                    np.asarray(Image.open(os.path.join(tdir, f)).convert("L"),
                               np.float32))
        if not _templates:
            raise RuntimeError(f"no *.png templates in {tdir}")
    return _templates


def _norm(gray: np.ndarray) -> np.ndarray:
    g = gray - gray.mean()
    n = np.linalg.norm(g)
    return g / n if n > 1e-6 else g


def recognize(crop: np.ndarray) -> str:
    """(H, W, 3) uint8 crop -> best-matching alphabet word."""
    templates = _load()
    th, tw = next(iter(templates.values())).shape
    gray = np.asarray(
        Image.fromarray(crop).convert("L").resize((tw, th), Image.BILINEAR),
        np.float32)
    g = _norm(gray)
    scores = {w: float((g * t).sum()) for w, t in templates.items()}
    return max(scores, key=scores.get)
