"""Equal-error-rate for the GE2E speaker encoder.

Parity with reference preprocessing/encoder/model.py:129-137, which builds an
ROC from the flattened similarity matrix (sklearn.roc_curve) and solves
1 - x = tpr(x) by Brent's method.  Here the ROC is computed directly in
numpy and the EER is the crossing of FPR and 1-TPR on the sorted-threshold
curve (identical value, no sklearn/scipy dependency)."""

from __future__ import annotations

import numpy as np


def equal_error_rate(labels: np.ndarray, scores: np.ndarray) -> float:
    """labels: 0/1 array; scores: same-shape similarity scores."""
    labels = np.asarray(labels).ravel().astype(bool)
    scores = np.asarray(scores).ravel().astype(np.float64)
    order = np.argsort(-scores)
    labels = labels[order]
    p = labels.sum()
    n = len(labels) - p
    if p == 0 or n == 0:
        return 0.0
    tp = np.cumsum(labels)
    fp = np.cumsum(~labels)
    tpr = tp / p
    fpr = fp / n
    fnr = 1.0 - tpr
    idx = np.nanargmin(np.abs(fnr - fpr))
    return float((fnr[idx] + fpr[idx]) / 2.0)


def ge2e_eer(sim_matrix: np.ndarray, speakers_per_batch: int,
             utterances_per_speaker: int) -> float:
    """EER from the (S*U, S) similarity matrix, one-hot ground truth as in
    the reference (inv_argmax at encoder/model.py:130-131)."""
    ground_truth = np.repeat(np.arange(speakers_per_batch), utterances_per_speaker)
    labels = np.eye(speakers_per_batch, dtype=int)[ground_truth]
    return equal_error_rate(labels.flatten(), sim_matrix.flatten())
