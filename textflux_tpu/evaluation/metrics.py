"""OCR text metrics: SeqAcc (exact match) and NED.

Definitions match the reference harness (eval/eval_dgocr.py:194-196,294-295):
  SeqAcc = mean(pred == gt)
  NED    = mean(1 - levenshtein(pred, gt) / max(len(pred), len(gt)))
"""

from __future__ import annotations

from typing import Dict, Sequence


def levenshtein(a: str, b: str) -> int:
    """Edit distance, O(len(a) * len(b)) single-row DP."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalized_edit_distance(pred: str, gt: str) -> float:
    if not pred and not gt:
        return 1.0
    return 1.0 - levenshtein(pred, gt) / max(len(pred), len(gt))


def sequence_accuracy(pred: str, gt: str) -> float:
    return float(pred == gt)


def evaluate_texts(preds: Sequence[str], gts: Sequence[str]) -> Dict[str, float]:
    """Corpus-level SeqAcc / NED over aligned prediction/ground-truth pairs."""
    if len(preds) != len(gts):
        raise ValueError(f"{len(preds)} predictions vs {len(gts)} ground truths")
    if not preds:
        return {"seq_acc": 0.0, "ned": 0.0, "count": 0}
    seq = sum(sequence_accuracy(p, g) for p, g in zip(preds, gts))
    ned = sum(normalized_edit_distance(p, g) for p, g in zip(preds, gts))
    n = len(preds)
    return {"seq_acc": seq / n, "ned": ned / n, "count": n}
