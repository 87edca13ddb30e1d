"""Ego4D OSCC accuracy and PNR keyframe-distance metrics.

Behavioral reference: /root/reference/model/metric.py:342-397.
"""

from __future__ import annotations

import numpy as np


def oscc_metrics(preds: np.ndarray, labels: np.ndarray) -> dict:
    """preds: [N, 2] logits; labels: [N] binary state-change labels."""
    preds = np.asarray(preds)
    labels = np.asarray(labels).reshape(-1)
    acc = float(np.mean(np.argmax(preds, axis=1) == labels))
    return {"accuracy": acc * 100.0}


def pnr_metrics(
    preds: np.ndarray,
    labels: np.ndarray,
    sc_labels: np.ndarray,
    fps: np.ndarray,
    parent_start_frames: np.ndarray,
    parent_end_frames: np.ndarray,
    parent_pnr_frames: np.ndarray,
) -> dict:
    """Keyframe localization error in seconds (metric.py:355-397).

    preds: [N, 16] frame logits.  Only state-change clips (sc_label == 1)
    count.  The argmax frame index is mapped back to a parent-clip frame via
    ``(end - start) / 16 * idx`` and compared against the annotated PNR
    frame, scaled to seconds by the clip fps.
    """
    preds = np.asarray(preds)
    sc = np.asarray(sc_labels).reshape(-1)
    fps = np.asarray(fps, np.float64).reshape(-1)
    start = np.asarray(parent_start_frames, np.float64).reshape(-1)
    end = np.asarray(parent_end_frames, np.float64).reshape(-1)
    pnr = np.asarray(parent_pnr_frames, np.float64).reshape(-1)

    keep = sc == 1
    if not keep.any():
        return {"keyframe_distance": 0.0}
    idx = np.argmax(preds[keep], axis=1)
    mapped = (end[keep] - start[keep]) / 16.0 * idx
    gt = pnr[keep] - start[keep]
    err_sec = np.abs(mapped - gt) / fps[keep]
    return {"keyframe_distance": float(np.mean(err_sec))}
