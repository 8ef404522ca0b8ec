"""Salient-channel selection for mixed-precision quantization.

The reference keeps the top `salient_prop` fraction of *input channels* of
each Linear in FP16, ranked by a calibrated importance vector (per-channel
mean |activation| summed over calibration batches), and quantizes the rest
(cf. /root/reference/smoothquant/fake_quant.py:265-270,291-304,347-365).

TPU-first design: saliency is resolved at quantize time into a *static*
channel permutation that places all non-salient channels first (ascending
index order) followed by all salient channels (ascending index order).  This
matches the compaction the reference performs dynamically with a boolean mask
(`x[:, non_salient_mask]` keeps ascending order), but as a load-time layout
decision that jit/pallas can treat as data movement with static shapes.
"""

from __future__ import annotations

import numpy as np


def select_salient_indices(importance: np.ndarray, num_salient: int) -> np.ndarray:
    """Top-k channels by descending importance (fake_quant.py:266-270).

    Uses a stable descending sort (ties broken by lower channel index first),
    matching torch.argsort(descending=True)'s ordering on distinct values.
    Returns int32 indices, shape (num_salient,), in descending-importance
    order.
    """
    imp = np.asarray(importance, dtype=np.float64)
    order = np.argsort(-imp, kind="stable")
    return order[:num_salient].astype(np.int32)


def weight_magnitude_importance(weight) -> np.ndarray:
    """Weight-based saliency: per-input-channel mean |w| over output rows.

    The metric the reference's salient_weights_analysis.py:79-190 *intended*
    (the script passes a kwarg quantize_model never accepted — dead code,
    SURVEY.md §2.8).  Usable anywhere an activation-calibrated importance
    vector is accepted, e.g. when no calibration data is available.
    """
    return np.abs(np.asarray(weight, np.float32)).mean(axis=0).astype(np.float64)


def salient_partition_perm(
    in_features: int, salient_indices: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Permutation putting non-salient channels first, salient last.

    Returns (perm, inv_perm), both int32 arrays of shape (in_features,):
      x[:, perm][:, : C - k]  == the reference's compacted non-salient matrix
      x[:, perm][:, C - k :]  == salient columns (ascending index order)
      y[:, inv_perm]          undoes the permutation.
    """
    sal = np.zeros(in_features, dtype=bool)
    sal[np.asarray(salient_indices, dtype=np.int64)] = True
    perm = np.concatenate([np.nonzero(~sal)[0], np.nonzero(sal)[0]]).astype(np.int32)
    inv_perm = np.argsort(perm).astype(np.int32)
    return perm, inv_perm
