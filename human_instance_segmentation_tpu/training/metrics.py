"""Vectorised evaluation metric stack.

Replaces evaluate_model (/root/reference/src/human_edge_detection/train_utils.py:109-404),
whose per-sample Python loops (:266-293) are re-expressed as batched jnp
reductions: target IoU, detection rates @0.5/@0.7, precision/recall/F1,
instance-separation accuracy, and the three confusion matrices
(pixel-level 3x3, bg/fg, target/non-target).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                     weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(num_classes, num_classes) count matrix; rows = target, cols = pred."""
    idx = target.reshape(-1) * num_classes + pred.reshape(-1)
    w = None if weights is None else weights.reshape(-1)
    cm = jnp.bincount(idx, weights=w, length=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def batch_metrics(logits: jnp.ndarray, targets: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Additive per-batch metric sums; accumulate across batches then call
    :func:`finalize_metrics`.

    logits: (N, H, W, 3); targets: (N, H, W); valid: (N,).
    """
    f32 = logits.dtype
    n = logits.shape[0]
    vw = jnp.ones((n,), f32) if valid is None else valid.astype(f32)
    pix_w = jnp.broadcast_to(vw[:, None, None], targets.shape).reshape(-1)
    pred = jnp.argmax(logits, axis=-1)

    def iou_of(cls: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p = (pred == cls)
        t = (targets == cls)
        inter = jnp.sum(p & t, axis=(1, 2)).astype(f32)
        union = jnp.sum(p | t, axis=(1, 2)).astype(f32)
        return inter, union

    inter1, union1 = iou_of(1)
    target_iou = inter1 / jnp.clip(union1, 1.0, None)
    has_target = (jnp.sum(targets == 1, axis=(1, 2)) > 0).astype(f32) * vw

    p1 = jnp.sum(pred == 1, axis=(1, 2)).astype(f32)
    t1 = jnp.sum(targets == 1, axis=(1, 2)).astype(f32)
    precision = inter1 / jnp.clip(p1, 1.0, None)
    recall = inter1 / jnp.clip(t1, 1.0, None)

    # instance separation: among pixels that are truly some instance (1 or 2),
    # fraction assigned to the correct one of the two
    inst_true = (targets > 0)
    inst_correct = inst_true & (pred == targets)
    sep_n = jnp.sum(inst_true, axis=(1, 2)).astype(f32)
    sep_acc = jnp.sum(inst_correct, axis=(1, 2)).astype(f32) / jnp.clip(sep_n, 1.0, None)
    has_inst = (sep_n > 0).astype(f32) * vw

    cm3 = confusion_matrix(pred, targets, 3, weights=pix_w)
    cm_bgfg = confusion_matrix((pred > 0).astype(jnp.int32),
                               (targets > 0).astype(jnp.int32), 2, weights=pix_w)
    fg_w = pix_w * (targets.reshape(-1) > 0)
    cm_tnt = confusion_matrix((pred.reshape(-1) == 2).astype(jnp.int32),
                              (targets.reshape(-1) == 2).astype(jnp.int32), 2,
                              weights=fg_w)

    return {
        "iou_sum": jnp.sum(target_iou * vw),
        "det50_sum": jnp.sum((target_iou > 0.5) * vw),
        "det70_sum": jnp.sum((target_iou > 0.7) * vw),
        "precision_sum": jnp.sum(precision * vw),
        "recall_sum": jnp.sum(recall * vw),
        "sep_acc_sum": jnp.sum(sep_acc * has_inst),
        "sep_n": jnp.sum(has_inst),
        "n": jnp.sum(vw),
        "n_with_target": jnp.sum(has_target),
        "cm3": cm3,
        "cm_bgfg": cm_bgfg,
        "cm_tnt": cm_tnt,
    }


def finalize_metrics(sums: Dict[str, np.ndarray]) -> Dict[str, float]:
    s = {k: np.asarray(v) for k, v in sums.items()}
    n = max(float(s["n"]), 1.0)
    precision = float(s["precision_sum"]) / n
    recall = float(s["recall_sum"]) / n
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)
    out = {
        "target_miou": float(s["iou_sum"]) / n,
        "detection_rate_0.5": float(s["det50_sum"]) / n,
        "detection_rate_0.7": float(s["det70_sum"]) / n,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "instance_separation_accuracy": float(s["sep_acc_sum"]) / max(float(s["sep_n"]), 1.0),
        "num_samples": n,
    }
    for key in ("cm3", "cm_bgfg", "cm_tnt"):
        cm = s[key].astype(np.float64)
        out[f"{key}_normalized"] = (cm / np.clip(cm.sum(axis=1, keepdims=True), 1, None)).tolist()
    return out


def binary_miou(logits: jnp.ndarray, masks: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Binary segmentation mIoU for the distillation stage
    (train_distillation_staged.py:369-583): mean over batch of
    IoU(sigmoid(logit) > 0.5, mask)."""
    pred = jax.nn.sigmoid(logits) > threshold
    t = masks > 0.5
    inter = jnp.sum(pred & t, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum(pred | t, axis=(1, 2, 3)).astype(jnp.float32)
    return jnp.mean(inter / jnp.clip(union, 1.0, None))
