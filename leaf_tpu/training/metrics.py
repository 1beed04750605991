"""Evaluation metrics: top-k accuracy, mAP, per-class AP/AUC, d-prime,
confidence intervals.

Capability parity with reference utilities/metrics_helper.py (accuracy 12-24,
d_prime 40-43, calculate_stats 46-89, mean_confidence_interval 92-97,
calculate_mAP 100-107). Host-side numpy/sklearn — these run on gathered
predictions once per epoch, not in the jitted step (in-step train accuracy
is computed on-device in leaf_tpu.training.steps).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
from scipy import stats as _scipy_stats
from sklearn import metrics as _skm
from sklearn.metrics import average_precision_score

__all__ = ["accuracy", "d_prime", "calculate_stats",
           "mean_confidence_interval", "calculate_mAP"]


def accuracy(output: np.ndarray, target: np.ndarray,
             topk: Sequence[int] = (1, 5)) -> Tuple[List[float], np.ndarray]:
    """Precision@k over logits (samples, classes); returns percentages
    (reference: metrics_helper.py:12-24)."""
    output = np.asarray(output)
    target = np.asarray(target)
    maxk = max(topk)
    batch_size = target.shape[0]
    # top-maxk indices, descending
    pred = np.argsort(-output, axis=1)[:, :maxk].T  # (maxk, B)
    correct = pred == target.reshape(1, -1)
    res = []
    for k in topk:
        correct_k = correct[:k].reshape(-1).sum(dtype=np.float64)
        res.append(float(correct_k * 100.0 / batch_size))
    return res, pred


def d_prime(auc: float) -> float:
    """d' = Φ⁻¹(auc)·√2 (reference: metrics_helper.py:40-43)."""
    return float(_scipy_stats.norm().ppf(auc) * np.sqrt(2.0))


def calculate_stats(output: np.ndarray, target: np.ndarray,
                    class_indices: Optional[Iterable[int]] = None) -> List[dict]:
    """Per-class AP / AUC / PR / ROC (reference: metrics_helper.py:46-89)."""
    output = np.asarray(output, dtype=np.float64)  # sklearn rejects bf16
    target = np.asarray(target, dtype=np.float64)
    classes_num = target.shape[-1]
    if class_indices is None:
        class_indices = range(classes_num)
    out = []
    for k in class_indices:
        avg_precision = _skm.average_precision_score(
            target[:, k], output[:, k], average=None)
        auc = _skm.roc_auc_score(target[:, k], output[:, k], average=None)
        precisions, recalls, _ = _skm.precision_recall_curve(
            target[:, k], output[:, k])
        fpr, tpr, _ = _skm.roc_curve(target[:, k], output[:, k])
        save_every = 1000
        out.append({
            "precisions": precisions[0::save_every],
            "recalls": recalls[0::save_every],
            "AP": avg_precision,
            "fpr": fpr[0::save_every],
            "fnr": 1.0 - tpr[0::save_every],
            "auc": auc,
        })
    return out


def mean_confidence_interval(data: Sequence[float],
                             confidence: float = 0.95) -> Tuple[float, float]:
    """(mean, half-width of the t CI) — the README's ±x numbers
    (reference: metrics_helper.py:92-97)."""
    a = 1.0 * np.array(data)
    n = len(a)
    m, se = np.mean(a), _scipy_stats.sem(a)
    h = se * _scipy_stats.t.ppf((1 + confidence) / 2.0, n - 1)
    return float(m), float(h)


def calculate_mAP(preds, gts, mixup: bool = False,
                  mode: str = "macro") -> float:
    """Mean average precision over concatenated batch lists; mixed-up soft
    targets binarized at 0.5 (reference: metrics_helper.py:100-107)."""
    # float64 coercion also normalizes ml_dtypes.bfloat16 arrays, which
    # numpy accepts but sklearn's check_array rejects as non-numeric
    preds = np.concatenate(
        [np.asarray(p, dtype=np.float64) for p in preds], axis=0)
    gts = np.concatenate(
        [np.asarray(g, dtype=np.float64) for g in gts], axis=0)
    if mixup:
        gts = (gts >= 0.5).astype(gts.dtype)
    return float(average_precision_score(gts, preds, average=mode))
