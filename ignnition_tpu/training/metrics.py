"""Streaming evaluation metrics.

Matches the reference eval metric set (generate_model.py:770-788):
label/mean, prediction/mean, mae, mre (normalizer=|labels|), and the custom
streaming r-squared (a running mean of per-batch R², generate_model.py:201-216).
All are masked so padded rows don't contribute.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import numpy as np


@dataclass
class MetricAccumulator:
    label_sum: float = 0.0
    pred_sum: float = 0.0
    abs_err_sum: float = 0.0
    rel_err_sum: float = 0.0
    count: float = 0.0
    r2_sum: float = 0.0
    r2_batches: int = 0

    def update(self, labels: np.ndarray, preds: np.ndarray, mask: np.ndarray):
        labels = np.asarray(labels, np.float64)
        preds = np.asarray(preds, np.float64)
        m = np.asarray(mask, bool)
        l, p = labels[m], preds[m]
        if l.size == 0:
            return
        self.label_sum += float(l.sum())
        self.pred_sum += float(p.sum())
        self.abs_err_sum += float(np.abs(p - l).sum())
        denom = np.maximum(np.abs(l), 1e-12)
        self.rel_err_sum += float((np.abs(p - l) / denom).sum())
        self.count += float(l.size)
        total = float(((l - l.mean()) ** 2).sum())
        unexplained = float(((l - p) ** 2).sum())
        if total > 0:
            self.r2_sum += 1.0 - unexplained / total
            self.r2_batches += 1

    def result(self) -> Dict[str, float]:
        c = max(self.count, 1.0)
        return {
            "label/mean": self.label_sum / c,
            "prediction/mean": self.pred_sum / c,
            "mae": self.abs_err_sum / c,
            "mre": self.rel_err_sum / c,
            "r-squared": self.r2_sum / max(self.r2_batches, 1),
        }
